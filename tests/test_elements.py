"""P1 element integrals vs numerical quadrature on random triangles."""

import numpy as np
import pytest

from heatflow_tpu.ops import p1

# degree-4 quadrature (6-point Dunavant) — exact beyond every integrand here
_A1, _B1 = 0.445948490915965, 0.108103018168070
_A2, _B2 = 0.091576213509771, 0.816847572980459
_QP = np.array([
    [_B1, _A1, _A1], [_A1, _B1, _A1], [_A1, _A1, _B1],
    [_B2, _A2, _A2], [_A2, _B2, _A2], [_A2, _A2, _B2],
])
_QW = np.array([0.223381589678011] * 3 + [0.109951743655322] * 3)


def _quad(coords, f):
    """Integrate f(bary, xy) over the triangle with the degree-4 rule."""
    p0, p1_, p2 = coords
    d1, d2 = p1_ - p0, p2 - p0
    area = 0.5 * abs(d1[0] * d2[1] - d1[1] * d2[0])
    total = 0.0
    for lam, w in zip(_QP, _QW):
        xy = lam[0] * p0 + lam[1] * p1_ + lam[2] * p2
        total += w * f(lam, xy)
    return total * area


@pytest.fixture
def tris():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0.2, 2.0, size=(16, 3, 2))
    # reject near-degenerate
    keep = []
    for c in pts:
        d1, d2 = c[1] - c[0], c[2] - c[0]
        if abs(d1[0] * d2[1] - d1[1] * d2[0]) > 1e-2:
            keep.append(c)
    return np.array(keep)


def test_mass_rw_matches_quadrature(tris):
    M = p1.tri_mass_rw(tris)
    for t, coords in enumerate(tris):
        for a in range(3):
            for b in range(3):
                ref = _quad(coords, lambda lam, xy: lam[a] * lam[b] * xy[1])
                assert M[t, a, b] == pytest.approx(ref, rel=1e-12)


def test_stiffness_rw_matches_quadrature(tris):
    K = p1.tri_stiffness_rw(tris)
    _, grads = p1.tri_area_grads(tris)
    for t, coords in enumerate(tris):
        g = grads[t]
        for a in range(3):
            for b in range(3):
                ref = _quad(coords, lambda lam, xy: g[a] @ g[b] * xy[1])
                assert K[t, a, b] == pytest.approx(ref, rel=1e-12)


def test_load_rw_matches_quadrature(tris):
    L = p1.tri_load_rw(tris)
    for t, coords in enumerate(tris):
        for a in range(3):
            ref = _quad(coords, lambda lam, xy: lam[a] * xy[1])
            assert L[t, a] == pytest.approx(ref, rel=1e-12)


def test_gradients_reproduce_linear_field(tris):
    """∇(αz + βr) must be recovered exactly by the P1 gradient coefficients."""
    alpha, beta = 1.7, -0.6
    cz = p1.tri_dz_coeff(tris)
    cr = p1.tri_dr_coeff(tris)
    u = alpha * tris[..., 0] + beta * tris[..., 1]  # nodal values
    assert np.allclose((cz * u).sum(-1), alpha)
    assert np.allclose((cr * u).sum(-1), beta)


def test_unweighted_mass_partition_of_unity(tris):
    M = p1.tri_mass(tris)
    area, _ = p1.tri_area_grads(tris)
    assert np.allclose(M.sum(axis=(1, 2)), area)


def test_interval_elements():
    h = np.array([0.5, 2.0])
    K = p1.interval_stiffness(h)
    M = p1.interval_mass(h)
    assert np.allclose(K[0], [[2.0, -2.0], [-2.0, 2.0]])
    assert np.allclose(M.sum(axis=(1, 2)), h)
    # stiffness annihilates constants
    assert np.allclose(K @ np.ones(2), 0.0)

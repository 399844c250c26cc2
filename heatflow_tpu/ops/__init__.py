from heatflow_tpu.ops.stencil import (
    OFFSETS,
    StencilPack,
    apply_stencil,
    assemble_stencils,
    combine_operator,
)
from heatflow_tpu.ops.cg import pcg, jacobi_preconditioner

__all__ = [
    "OFFSETS",
    "StencilPack",
    "apply_stencil",
    "assemble_stencils",
    "combine_operator",
    "pcg",
    "jacobi_preconditioner",
]

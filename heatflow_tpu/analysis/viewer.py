"""Interactive radial-gradient viewer: matplotlib slider/buttons stepping
through timesteps (ref smooth_radial_flux.py:9-87)."""

from __future__ import annotations

import argparse

from heatflow_tpu.io.csvio import read_gradient_csv


def launch_viewer(path: str):
    import matplotlib.pyplot as plt
    from matplotlib.widgets import Button, Slider

    times, z, vals = read_gradient_csv(path)
    fig, ax = plt.subplots(figsize=(10, 6))
    plt.subplots_adjust(bottom=0.25)
    (line,) = ax.plot(z, vals[0], "b.-")
    ax.set_xlabel("Radial position (m)")
    ax.set_ylabel("∂T/∂r (K/m)")
    ax.set_ylim(vals.min() * 1.05, vals.max() * 1.05 + 1e-30)
    title = ax.set_title(f"t = {times[0]:.3e} s  (step 1/{len(times)})")
    ax.grid(alpha=0.3)

    ax_slider = plt.axes([0.15, 0.1, 0.6, 0.04])
    slider = Slider(ax_slider, "step", 0, len(times) - 1, valinit=0,
                    valstep=1)
    state = {"i": 0}

    def show(i):
        state["i"] = int(i) % len(times)
        line.set_ydata(vals[state["i"]])
        title.set_text(f"t = {times[state['i']]:.3e} s  "
                       f"(step {state['i'] + 1}/{len(times)})")
        fig.canvas.draw_idle()

    slider.on_changed(show)
    ax_prev = plt.axes([0.80, 0.1, 0.07, 0.05])
    ax_next = plt.axes([0.88, 0.1, 0.07, 0.05])
    bp = Button(ax_prev, "◀")
    bn = Button(ax_next, "▶")
    bp.on_clicked(lambda _e: slider.set_val((state["i"] - 1) % len(times)))
    bn.on_clicked(lambda _e: slider.set_val((state["i"] + 1) % len(times)))
    plt.show()
    return fig


def main(argv=None):
    p = argparse.ArgumentParser(description="Interactive gradient viewer")
    p.add_argument("data_path", type=str)
    args = p.parse_args(argv)
    launch_viewer(args.data_path)


if __name__ == "__main__":
    main()

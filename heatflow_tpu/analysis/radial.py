"""Radial-gradient CSV loading, plotting and summaries
(ref plot_radial_gradient.py:22-287)."""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import pandas as pd


class RadialGradientPlotter:
    """Load a radial_gradient CSV (time index, z-position columns) and plot
    its evolution — API-compatible with the reference class."""

    def __init__(self, data_path: str):
        self.data_path = Path(data_path)
        self.data: pd.DataFrame | None = None
        self.time_values: np.ndarray | None = None
        self.radial_positions: list[float] | None = None
        self.max_gradient: float | None = None
        self.min_gradient: float | None = None
        self.load_data()

    def load_data(self) -> None:
        self.data = pd.read_csv(self.data_path)
        if self.data.empty:
            raise ValueError("Data file is empty or could not be read")
        self.time_values = self.data.iloc[:, 0].to_numpy(float)
        self.radial_positions = [float(c) for c in self.data.columns[1:]]
        grid = self.data.iloc[:, 1:].to_numpy(float)
        self.max_gradient = float(np.max(grid))
        self.min_gradient = float(np.min(grid))

    # ------------------------------------------------------------------
    def plot_gradient_evolution(self, time_indices=None, figsize=(12, 8),
                                save_path=None, show_plot=True):
        import matplotlib.pyplot as plt
        if time_indices is None:
            time_indices = range(len(self.time_values))
        fig, ax = plt.subplots(figsize=figsize)
        grid = self.data.iloc[:, 1:].to_numpy(float)
        for i in time_indices:
            if i < len(self.time_values):
                ax.plot(self.radial_positions, grid[i, :],
                        label=f"t = {self.time_values[i]:.2e} s",
                        linewidth=1.5, alpha=0.8)
        ax.set_xlabel("Radial Position (m)", fontsize=12)
        ax.set_ylabel("Radial Temperature Gradient (K/m)", fontsize=12)
        ax.set_title("Radial Gradient Evolution", fontsize=14)
        ax.grid(True, alpha=0.3)
        if len(list(time_indices)) <= 12:
            ax.legend(fontsize=9)
        if save_path:
            fig.savefig(save_path, dpi=300, bbox_inches="tight")
        if show_plot:
            import matplotlib.pyplot as plt
            plt.show()
        else:
            import matplotlib.pyplot as plt
            plt.close(fig)
        return fig, ax

    def plot_heatmap(self, figsize=(12, 8), save_path=None, show_plot=True,
                     cmap="RdBu_r"):
        import matplotlib.pyplot as plt
        grid = self.data.iloc[:, 1:].to_numpy(float)
        fig, ax = plt.subplots(figsize=figsize)
        vmax = max(abs(self.min_gradient), abs(self.max_gradient))
        im = ax.pcolormesh(np.asarray(self.radial_positions),
                           self.time_values, grid, cmap=cmap,
                           vmin=-vmax, vmax=vmax, shading="nearest")
        fig.colorbar(im, ax=ax, label="∂T/∂r (K/m)")
        ax.set_xlabel("Radial Position (m)", fontsize=12)
        ax.set_ylabel("Time (s)", fontsize=12)
        ax.set_title("Radial Gradient (r, t) Heatmap", fontsize=14)
        if save_path:
            fig.savefig(save_path, dpi=300, bbox_inches="tight")
        if show_plot:
            plt.show()
        else:
            plt.close(fig)
        return fig, ax

    def get_data_summary(self) -> dict:
        grid = self.data.iloc[:, 1:].to_numpy(float)
        peak = np.unravel_index(np.argmax(np.abs(grid)), grid.shape)
        return {
            "time_range": (float(self.time_values[0]),
                           float(self.time_values[-1])),
            "radial_range": (float(self.radial_positions[0]),
                             float(self.radial_positions[-1])),
            "gradient_range": (self.min_gradient, self.max_gradient),
            "num_time_points": len(self.time_values),
            "num_radial_points": len(self.radial_positions),
            "peak_time": float(self.time_values[peak[0]]),
            "peak_position": float(self.radial_positions[peak[1]]),
            "peak_gradient": float(grid[peak]),
        }


def main(argv=None):
    """CLI with the reference's full flag surface
    (ref plot_radial_gradient.py:236-251: --plot-type evolution|heatmap|both,
    --time-indices, --save-evolution/--save-heatmap, --figsize, --no-show)
    plus this repo's earlier condensed flags kept as aliases."""
    p = argparse.ArgumentParser(
        description="Plot radial gradient data from parameter sweep")
    p.add_argument("data_path", type=str)
    p.add_argument("--plot-type", type=str,
                   choices=["evolution", "heatmap", "both"],
                   default=None, help="Type of plot to generate")
    p.add_argument("--time-indices", type=int, nargs="+", default=None,
                   help="Specific time indices to plot (evolution plot)")
    p.add_argument("--save-evolution", type=str, default=None)
    p.add_argument("--save-heatmap", type=str, default=None)
    p.add_argument("--figsize", type=float, nargs=2, default=[12, 8],
                   help="Figure size (width height)")
    p.add_argument("--no-show", action="store_true")
    # condensed aliases from earlier rounds
    p.add_argument("--heatmap", action="store_true",
                   help="alias for --plot-type heatmap")
    p.add_argument("--save", type=str, default=None,
                   help="alias: save path for the selected plot")
    p.add_argument("--summary", action="store_true",
                   help="(summary is always printed, as in the reference)")
    args = p.parse_args(argv)

    plot_type = args.plot_type or ("heatmap" if args.heatmap else "evolution")
    figsize = tuple(args.figsize)
    plotter = RadialGradientPlotter(args.data_path)
    print("\nData Summary:")
    for k, v in plotter.get_data_summary().items():
        print(f"  {k}: {v}")
    if plot_type in ("evolution", "both"):
        plotter.plot_gradient_evolution(
            time_indices=args.time_indices, figsize=figsize,
            save_path=args.save_evolution or args.save,
            show_plot=not args.no_show)
    if plot_type in ("heatmap", "both"):
        plotter.plot_heatmap(
            figsize=figsize,
            save_path=args.save_heatmap
            or (args.save if plot_type == "heatmap" else None),
            show_plot=not args.no_show)


if __name__ == "__main__":
    main()

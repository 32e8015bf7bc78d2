"""Walk-history visualizers (rebuild of the C11 consumers,
``utils.py:237-639``): single-walk path plot, multi-walk overlay, and
walk-statistics histograms, driven by :class:`WalkHistory` captures.

matplotlib is an optional dependency; importing this module without it
raises only when a plot function is called.
"""

from __future__ import annotations

import numpy as np

__all__ = ["plot_walk_history", "plot_multiple_walks", "plot_walk_statistics"]


def _mpl():
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    return plt


def _draw_boundaries(ax, problem):
    if problem is None:
        return
    pts = np.asarray(problem.dirichlet.points)
    ax.plot(pts[:, 0], pts[:, 1], "k-", lw=1.5, label="Dirichlet")
    if problem.neumann is not None:
        npts = np.asarray(problem.neumann.points)
        ax.plot(npts[:, 0], npts[:, 1], "r-", lw=1.5, label="Neumann")


def plot_walk_history(history, walk_id: int = 0, problem=None, show_circles=True,
                      save_path=None):
    """Single walk: path, step circles, contribution markers
    (reference ``plot_walk_history``, ``utils.py:237-431``)."""
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(8, 8))
    _draw_boundaries(ax, problem)
    T = int(history.walk_length[walk_id]) + 1
    path = history.positions[walk_id, :T]
    ax.plot(path[:, 0], path[:, 1], "b.-", ms=4, lw=1, label="walk path")
    ax.plot(*history.point, "g*", ms=14, label="start")
    ax.plot(*path[-1], "rs", ms=8, label="end")
    if show_circles:
        from matplotlib.patches import Circle

        for t in range(T - 1):
            ax.add_patch(
                Circle(path[t], float(history.radius[walk_id, t]),
                       fill=False, alpha=0.15, color="gray", lw=0.5)
            )
    src = history.source_contrib[walk_id, :T]
    nz = np.nonzero(src)[0]
    if len(nz):
        ax.scatter(path[nz, 0], path[nz, 1], c="orange", s=25, zorder=5,
                   label="source contributions")
    ax.set_title(
        f"walk {walk_id}: {T - 1} steps, "
        f"total {float(history.total[walk_id]):.4g}"
    )
    ax.legend(loc="best", fontsize=8)
    ax.set_aspect("equal")
    if save_path:
        fig.savefig(save_path, dpi=150, bbox_inches="tight")
    return fig


def plot_multiple_walks(history, max_walks: int = 20, problem=None,
                        save_path=None):
    """Overlay of many walk paths colored by contribution
    (reference ``plot_multiple_walks``, ``utils.py:434-559``)."""
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(8, 8))
    _draw_boundaries(ax, problem)
    n = min(max_walks, history.positions.shape[0])
    totals = history.total[:n]
    vmin, vmax = float(totals.min()), float(totals.max())
    cmap = plt.get_cmap("viridis")
    for w in range(n):
        T = int(history.walk_length[w]) + 1
        path = history.positions[w, :T]
        c = cmap(0.5 if vmax == vmin else (totals[w] - vmin) / (vmax - vmin))
        ax.plot(path[:, 0], path[:, 1], "-", color=c, alpha=0.6, lw=0.8)
        ax.plot(*path[-1], "s", color=c, ms=4)
    ax.plot(*history.point, "r*", ms=14, label="start")
    ax.set_title(f"{n} walks from {tuple(np.round(history.point, 3))}")
    ax.set_aspect("equal")
    ax.legend(fontsize=8)
    if save_path:
        fig.savefig(save_path, dpi=150, bbox_inches="tight")
    return fig


def plot_walk_statistics(history, save_path=None):
    """Histograms of walk length and contribution + step-distance traces
    (reference ``plot_walk_statistics``, ``utils.py:562-639``)."""
    plt = _mpl()
    fig, axes = plt.subplots(2, 2, figsize=(11, 8))
    axes[0, 0].hist(history.walk_length, bins=20, color="steelblue")
    axes[0, 0].set_title("walk length (steps)")
    axes[0, 1].hist(history.total, bins=20, color="darkorange")
    axes[0, 1].set_title("walk contribution")
    for w in range(min(10, history.positions.shape[0])):
        T = int(history.walk_length[w]) + 1
        axes[1, 0].plot(history.d_dirichlet[w, :T], alpha=0.6, lw=0.8)
    axes[1, 0].set_title("Dirichlet distance vs step")
    axes[1, 0].set_yscale("log")
    mean = history.total.mean()
    sem = history.total.std() / np.sqrt(len(history.total))
    axes[1, 1].axis("off")
    axes[1, 1].text(
        0.1, 0.6,
        f"walks: {len(history.total)}\n"
        f"mean: {mean:.5g}\n"
        f"stderr: {sem:.3g}\n"
        f"mean length: {history.walk_length.mean():.1f} steps",
        fontsize=12,
    )
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=150, bbox_inches="tight")
    return fig

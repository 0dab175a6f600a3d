"""Visualization: trajectory plots and line-segment overlays (SURVEY.md C21).

matplotlib is env-verified present; imported lazily so headless pipelines
never pay for it.
"""

from __future__ import annotations

import numpy as np


def _poses_to_xyz(poses) -> np.ndarray:
    p = np.asarray(poses)
    if p.ndim == 3:  # (N, 4, 4) T_wc
        return p[:, :3, 3]
    return p  # already (N, 3)


def plot_trajectory(
    path: str,
    est,
    gt=None,
    title: str = "trajectory",
    plane: str = "xz",
) -> None:
    """Top-down trajectory plot (KITTI convention: x-z plane)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ax_i = {"x": 0, "y": 1, "z": 2}
    a, b = ax_i[plane[0]], ax_i[plane[1]]
    fig, ax = plt.subplots(figsize=(6, 6))
    e = _poses_to_xyz(est)
    ax.plot(e[:, a], e[:, b], "-", lw=1.2, label="estimate")
    if gt is not None:
        g = _poses_to_xyz(gt)
        ax.plot(g[:, a], g[:, b], "--", lw=1.0, label="ground truth")
    ax.set_xlabel(plane[0] + " [m]")
    ax.set_ylabel(plane[1] + " [m]")
    ax.set_title(title)
    ax.axis("equal")
    ax.legend()
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)


def draw_segments(
    path: str,
    image: np.ndarray,
    segments: np.ndarray,
    valid: np.ndarray | None = None,
    points: np.ndarray | None = None,
    title: str = "detections",
) -> None:
    """Overlay detected line segments (N, 4 as x1 y1 x2 y2) and points."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    img = np.asarray(image)
    segs = np.asarray(segments)
    if valid is not None:
        segs = segs[np.asarray(valid).astype(bool)]
    fig, ax = plt.subplots(figsize=(8, 6))
    ax.imshow(img, cmap="gray", interpolation="nearest")
    for x1, y1, x2, y2 in segs[:, :4]:
        ax.plot([x1, x2], [y1, y2], "-", lw=1.2)
    if points is not None:
        pts = np.asarray(points)
        ax.plot(pts[:, 0], pts[:, 1], ".", ms=2)
    ax.set_title(title)
    ax.set_axis_off()
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)


def plot_error_curve(path: str, errors, title: str = "per-frame ATE") -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    e = np.asarray(errors)
    fig, ax = plt.subplots(figsize=(7, 3))
    ax.plot(e, lw=1.0)
    ax.set_xlabel("frame")
    ax.set_ylabel("error [m]")
    ax.set_title(title)
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)

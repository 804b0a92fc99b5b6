"""Offline visualization: PLY clouds, trajectory plots, tracked-point overlays.

Replaces the reference's Pangolin/OpenGL viewer stack (Drawer/Viewer.cpp,
Drawer/MapDrawer.cpp, Drawer/OctomapDrawer.cpp rendering) with export-based
visualization suited to headless TPU hosts: point clouds and occupancy voxels
go to PLY (any viewer opens them), trajectories to PNG via matplotlib, and the
tracked-feature overlay (Frame::drawTackedPoints, Core/Frame.cpp:400-413) to
an image array.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def save_ply(path: str, xyz: np.ndarray, intensity: Optional[np.ndarray] = None,
             valid: Optional[np.ndarray] = None) -> int:
    """Write a point cloud (optionally gray-colored) as binary-less ASCII PLY."""
    xyz = np.asarray(xyz).reshape(-1, 3)
    if valid is not None:
        mask = np.asarray(valid).reshape(-1)
        xyz = xyz[mask]
        if intensity is not None:
            intensity = np.asarray(intensity).reshape(-1)[mask]
    n = len(xyz)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if intensity is not None:
            f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write("end_header\n")
        if intensity is not None:
            g = np.clip(np.asarray(intensity), 0, 255).astype(np.uint8)
            for p, c in zip(xyz, g):
                f.write(f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f} {c} {c} {c}\n")
        else:
            for p in xyz:
                f.write(f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f}\n")
    return n


def plot_trajectories(path: str, trajectories: Sequence, labels: Sequence[str],
                      title: str = "trajectory (top-down)") -> None:
    """Top-down (x-z) trajectory comparison plot -> PNG. Each trajectory is
    an (N, 4, 4) array of Twc poses."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 6))
    for poses, label in zip(trajectories, labels):
        p = np.asarray(poses)[:, :3, 3]
        ax.plot(p[:, 0], p[:, 2], label=label, linewidth=1.2)
        ax.scatter([p[0, 0]], [p[0, 2]], marker="o", s=25)
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.set_aspect("equal")
    ax.legend()
    ax.set_title(title)
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)


def draw_matches(gray1: np.ndarray, uv1: np.ndarray, gray2: np.ndarray,
                 uv2: np.ndarray, idx2: np.ndarray, valid: np.ndarray,
                 max_lines: int = 200) -> np.ndarray:
    """Side-by-side match visualization (Matcher::drawMatches,
    Features/Matcher.cpp:19-33): frames stacked horizontally, matched
    keypoints connected."""
    h = max(gray1.shape[0], gray2.shape[0])
    w1, w2 = gray1.shape[1], gray2.shape[1]
    canvas = np.zeros((h, w1 + w2, 3), np.uint8)
    for img, off in ((gray1, 0), (gray2, w1)):
        g = np.clip(np.asarray(img), 0, 255).astype(np.uint8)
        canvas[: g.shape[0], off : off + g.shape[1]] = g[..., None]

    n_drawn = 0
    for i in np.nonzero(np.asarray(valid))[0]:
        if n_drawn >= max_lines:
            break
        x1, y1 = int(round(uv1[i, 0])), int(round(uv1[i, 1]))
        j = int(idx2[i])
        x2, y2 = int(round(uv2[j, 0])) + w1, int(round(uv2[j, 1]))
        # simple Bresenham-free line: sample along the segment
        steps = max(abs(x2 - x1), abs(y2 - y1), 1)
        xs = np.linspace(x1, x2, steps).astype(int)
        ys = np.linspace(y1, y2, steps).astype(int)
        ok = (ys >= 0) & (ys < h) & (xs >= 0) & (xs < w1 + w2)
        canvas[ys[ok], xs[ok]] = (0, 220, 0)
        n_drawn += 1
    return canvas


def draw_tracked_points(gray: np.ndarray, uv: np.ndarray, inlier: np.ndarray,
                        valid: np.ndarray) -> np.ndarray:
    """RGB overlay of tracked keypoints: inliers bright, others dim
    (Frame::drawTackedPoints semantics, Core/Frame.cpp:400-413)."""
    g = np.clip(np.asarray(gray), 0, 255).astype(np.uint8)
    img = np.stack([g, g, g], axis=-1)
    h, w = g.shape
    for (u, v), inl, ok in zip(np.asarray(uv), np.asarray(inlier), np.asarray(valid)):
        if not ok:
            continue
        x, y = int(round(u)), int(round(v))
        if not (1 <= x < w - 1 and 1 <= y < h - 1):
            continue
        color = (0, 255, 0) if inl else (128, 128, 128)
        img[y - 1 : y + 2, x - 1 : x + 2] = color
    return img

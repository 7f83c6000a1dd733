"""Augmented-reality demo utilities: dominant-plane detection + virtual
object overlay.

Replaces the reference's ROS AR demo (Examples/ROS/ORB_SLAM2/AR/ViewerAR.cc,
~931 LoC: `ViewerAR::DetectPlane` RANSAC-fits a plane to the currently
tracked map points and `DrawCube`/`DrawPlane` render a virtual cube anchored
to it over the live frame). Here the same capability is headless: plane
RANSAC over tracked points, a plane-anchored pose, and a numpy cube/grid
overlay on the annotated tracking frame (composable with utils/viz.py).

Host-side numpy by design: the fit runs over at most a few hundred tracked
points once per frame — far below dispatch overhead on the accelerator (the
reference likewise runs it on the viewer's CPU thread).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np


class Plane(NamedTuple):
    normal: np.ndarray  # (3,) unit, oriented toward the camera
    centroid: np.ndarray  # (3,) inlier centroid (world)
    Tpw: np.ndarray  # (4,4) plane-to-world: z-axis = normal, origin = centroid
    inliers: np.ndarray  # (N,) bool mask over the input points
    n_inliers: int


def detect_plane(
    points_w: np.ndarray,
    cam_center_w: np.ndarray,
    n_iters: int = 50,
    rel_threshold: float = 0.02,
    min_inlier_frac: float = 0.25,
    seed: int = 0,
) -> Optional[Plane]:
    """RANSAC dominant-plane fit over tracked map points (reference
    ViewerAR::DetectPlane: 50 iterations of 3-point hypotheses, distance
    threshold relative to the point cloud's scale, accept if a clear
    majority of tracked points are coplanar).

    Args:
      points_w: (N, 3) world positions of currently tracked map points.
      cam_center_w: (3,) camera center, used to orient the plane normal.
      rel_threshold: inlier distance as a fraction of the median point
        distance to the centroid (scale-free, like the reference's
        median-depth-relative threshold).

    Returns a Plane, or None if no plane reaches `min_inlier_frac`.
    """
    pts = np.asarray(points_w, np.float64)
    n = len(pts)
    if n < 12:
        return None
    rng = np.random.default_rng(seed)
    centroid0 = pts.mean(axis=0)
    scale = np.median(np.linalg.norm(pts - centroid0, axis=1))
    th = max(rel_threshold * scale, 1e-6)

    # Batched hypotheses: all 3-point planes scored at once.
    idx = rng.integers(0, n, size=(n_iters, 3))
    a, b, c = pts[idx[:, 0]], pts[idx[:, 1]], pts[idx[:, 2]]
    nrm = np.cross(b - a, c - a)  # (I, 3)
    norm_len = np.linalg.norm(nrm, axis=1, keepdims=True)
    ok_h = norm_len[:, 0] > 1e-9
    nrm = nrm / np.maximum(norm_len, 1e-12)
    d = -np.einsum("ij,ij->i", nrm, a)  # (I,)
    dist = np.abs(pts @ nrm.T + d[None, :])  # (N, I)
    votes = np.where(ok_h[None, :], dist < th, False).sum(axis=0)
    best = int(np.argmax(votes))
    if votes[best] < min_inlier_frac * n:
        return None

    inl = dist[:, best] < th
    # Refine: least-squares plane over inliers (SVD), as the reference's
    # final recomputation over the consensus set.
    P = pts[inl]
    centroid = P.mean(axis=0)
    _, _, vt = np.linalg.svd(P - centroid, full_matrices=False)
    normal = vt[2]
    # Orient toward the camera so the cube sits on the visible side.
    if np.dot(normal, np.asarray(cam_center_w, np.float64) - centroid) < 0:
        normal = -normal
    inl = np.abs((pts - centroid) @ normal) < th

    # Plane frame: z = normal; x/y span the plane.
    z = normal
    ref = np.array([1.0, 0.0, 0.0]) if abs(z[0]) < 0.9 else np.array([0.0, 1.0, 0.0])
    x = np.cross(ref, z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    Tpw = np.eye(4)
    Tpw[:3, 0], Tpw[:3, 1], Tpw[:3, 2], Tpw[:3, 3] = x, y, z, centroid
    return Plane(
        normal=normal.astype(np.float32),
        centroid=centroid.astype(np.float32),
        Tpw=Tpw.astype(np.float32),
        inliers=inl,
        n_inliers=int(inl.sum()),
    )


def anchor_on_plane(plane: Plane, Tcw: np.ndarray, dist: float = 4.0) -> np.ndarray:
    """Re-anchor the plane frame at the point where the camera's optical
    axis (at `dist` meters) projects onto the plane — so the virtual object
    sits in front of the camera rather than at the tracked-point centroid
    (the reference's desk scene has both coincide; a long corridor does
    not). Returns a new Tpw."""
    Twc = np.linalg.inv(np.asarray(Tcw, np.float64))
    cam_c = Twc[:3, 3]
    view_dir = Twc[:3, 2]  # camera +z in world
    a = cam_c + dist * view_dir
    n = np.asarray(plane.normal, np.float64)
    a_on_plane = a - n * np.dot(n, a - np.asarray(plane.centroid, np.float64))
    Tpw = plane.Tpw.astype(np.float64).copy()
    Tpw[:3, 3] = a_on_plane
    return Tpw.astype(np.float32)


def _draw_line(img: np.ndarray, p0, p1, color) -> None:
    """Clipped Bresenham-ish line via dense interpolation."""
    h, w = img.shape[:2]
    x0, y0 = float(p0[0]), float(p0[1])
    x1, y1 = float(p1[0]), float(p1[1])
    steps = int(max(abs(x1 - x0), abs(y1 - y0), 1)) * 2
    t = np.linspace(0.0, 1.0, steps)
    xs = np.round(x0 + (x1 - x0) * t).astype(int)
    ys = np.round(y0 + (y1 - y0) * t).astype(int)
    m = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    img[ys[m], xs[m]] = color


def draw_cube(
    img: np.ndarray,
    Tcw: np.ndarray,
    Tpw: np.ndarray,
    size: float,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    color=(0, 220, 255),
) -> np.ndarray:
    """Overlay a wireframe cube of edge `size` sitting on the plane
    (reference ViewerAR::DrawCube renders a GL cube at the plane pose; this
    is the headless equivalent). `img` is (H, W, 3) uint8; returns it
    (drawn in place) for chaining."""
    s = size / 2.0
    corners_p = np.array(
        [
            [-s, -s, 0], [s, -s, 0], [s, s, 0], [-s, s, 0],  # base on plane
            [-s, -s, size], [s, -s, size], [s, s, size], [-s, s, size],
        ],
        np.float64,
    )
    Tcp = np.asarray(Tcw, np.float64) @ np.asarray(Tpw, np.float64)
    pc = corners_p @ Tcp[:3, :3].T + Tcp[:3, 3]
    z = pc[:, 2]
    if np.any(z <= 0.05):
        return img  # behind the camera: nothing to draw
    u = fx * pc[:, 0] / z + cx
    v = fy * pc[:, 1] / z + cy
    edges = [
        (0, 1), (1, 2), (2, 3), (3, 0),
        (4, 5), (5, 6), (6, 7), (7, 4),
        (0, 4), (1, 5), (2, 6), (3, 7),
    ]
    for i, j in edges:
        _draw_line(img, (u[i], v[i]), (u[j], v[j]), color)
    return img


def draw_plane_grid(
    img: np.ndarray,
    Tcw: np.ndarray,
    Tpw: np.ndarray,
    half_extent: float,
    n_lines: int,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    color=(90, 200, 90),
) -> np.ndarray:
    """Overlay the detected plane as a grid (reference ViewerAR::DrawPlane)."""
    Tcp = np.asarray(Tcw, np.float64) @ np.asarray(Tpw, np.float64)
    ticks = np.linspace(-half_extent, half_extent, n_lines)

    def proj(p_plane):
        pc = np.asarray(p_plane, np.float64) @ Tcp[:3, :3].T + Tcp[:3, 3]
        if pc[2] <= 0.05:
            return None
        return (fx * pc[0] / pc[2] + cx, fy * pc[1] / pc[2] + cy)

    for t in ticks:
        for p0, p1 in (
            ([t, -half_extent, 0.0], [t, half_extent, 0.0]),
            ([-half_extent, t, 0.0], [half_extent, t, 0.0]),
        ):
            a, b = proj(p0), proj(p1)
            if a is not None and b is not None:
                _draw_line(img, a, b, color)
    return img

"""Headless visualization: annotated frames + map/trajectory renders.

Replaces the reference's Pangolin viewer stack (src/Viewer.cc,
src/FrameDrawer.cc, src/MapDrawer.cc) with pure-numpy renderers producing
arrays/PNGs — no GL dependency, suitable for headless TPU hosts. A live
host viewer can consume the same outputs.
"""

from __future__ import annotations

import numpy as np


def draw_frame(img: np.ndarray, uv: np.ndarray, matched: np.ndarray,
               valid: np.ndarray, state_text: str = "") -> np.ndarray:
    """Annotated tracking frame (reference FrameDrawer::DrawFrame,
    src/FrameDrawer.cc:38-127): green boxes for map-matched keypoints, blue
    for unmatched. Returns an (H, W, 3) uint8 image."""
    h, w = img.shape[:2]
    out = np.stack([img, img, img], axis=-1).astype(np.uint8)

    def box(x, y, color):
        x0, x1 = max(x - 3, 0), min(x + 3, w - 1)
        y0, y1 = max(y - 3, 0), min(y + 3, h - 1)
        out[y0, x0:x1] = color
        out[y1, x0:x1] = color
        out[y0:y1, x0] = color
        out[y0:y1, x1] = color

    for i in np.nonzero(valid)[0]:
        x, y = int(round(uv[i, 0])), int(round(uv[i, 1]))
        if 0 <= x < w and 0 <= y < h:
            box(x, y, (0, 255, 0) if matched[i] else (255, 128, 0))
    return out


def render_map_topdown(
    mp_pos: np.ndarray,
    mp_valid: np.ndarray,
    kf_Tcw: np.ndarray,
    kf_valid: np.ndarray,
    cur_Tcw: np.ndarray | None = None,
    size: int = 800,
    axes=(0, 2),
) -> np.ndarray:
    """Top-down map render (reference MapDrawer::DrawMapPoints/DrawKeyFrames,
    src/MapDrawer.cc:44-177): points in gray, keyframe centers in blue,
    current camera in green. Returns (size, size, 3) uint8."""
    out = np.full((size, size, 3), 255, np.uint8)
    pts = mp_pos[mp_valid]
    centers = []
    for k in np.nonzero(kf_valid)[0]:
        T = kf_Tcw[k]
        centers.append(-T[:3, :3].T @ T[:3, 3])
    centers = np.stack(centers) if centers else np.zeros((0, 3))
    allp = np.concatenate([pts, centers]) if len(pts) else centers
    if len(allp) == 0:
        return out
    a, b = axes
    lo = np.percentile(allp[:, [a, b]], 2, axis=0) - 1.0
    hi = np.percentile(allp[:, [a, b]], 98, axis=0) + 1.0
    span = np.maximum(hi - lo, 1e-3)

    def to_px(p):
        x = int((p[a] - lo[0]) / span[0] * (size - 1))
        y = int((p[b] - lo[1]) / span[1] * (size - 1))
        return np.clip(x, 0, size - 1), np.clip(size - 1 - y, 0, size - 1)

    for p in pts:
        x, y = to_px(p)
        out[y, x] = (150, 150, 150)
    for c in centers:
        x, y = to_px(c)
        out[max(y - 2, 0) : y + 3, max(x - 2, 0) : x + 3] = (255, 0, 0)
    if cur_Tcw is not None:
        c = -cur_Tcw[:3, :3].T @ cur_Tcw[:3, 3]
        x, y = to_px(c)
        out[max(y - 3, 0) : y + 4, max(x - 3, 0) : x + 4] = (0, 200, 0)
    return out


def save_png(path: str, img: np.ndarray):
    """Write a PNG without heavyweight deps (cv2 if present, else PPM)."""
    try:
        import cv2

        cv2.imwrite(path, img[:, :, ::-1] if img.ndim == 3 else img)
    except ImportError:
        alt = path.rsplit(".", 1)[0] + ".ppm"
        with open(alt, "wb") as f:
            f.write(b"P6\n%d %d\n255\n" % (img.shape[1], img.shape[0]))
            f.write(img.astype(np.uint8).tobytes())

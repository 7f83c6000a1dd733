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


def _draw_line(out, p0, p1, color):
    """Clipped integer line (the GL_LINES stand-in)."""
    size_y, size_x = out.shape[:2]
    x0, y0 = p0
    x1, y1 = p1
    n = int(max(abs(x1 - x0), abs(y1 - y0), 1))
    xs = np.round(np.linspace(x0, x1, n + 1)).astype(int)
    ys = np.round(np.linspace(y0, y1, n + 1)).astype(int)
    ok = (xs >= 0) & (xs < size_x) & (ys >= 0) & (ys < size_y)
    out[ys[ok], xs[ok]] = color


def render_map_3d(
    mp_pos: np.ndarray,
    mp_valid: np.ndarray,
    kf_Tcw: np.ndarray,
    kf_valid: np.ndarray,
    covis: np.ndarray | None = None,
    kf_parent: np.ndarray | None = None,
    loop_edges: np.ndarray | None = None,
    cur_Tcw: np.ndarray | None = None,
    size: int = 900,
    covis_min_weight: int = 30,
    elev_deg: float = 35.0,
    azim_deg: float = -40.0,
    frustum_scale: float = 0.35,
) -> np.ndarray:
    """3D map render (reference MapDrawer::DrawKeyFrames/DrawMapPoints/
    DrawCurrentCamera, src/MapDrawer.cc:44-220): map points, keyframe
    FRUSTA (wireframe pyramids), covisibility-graph edges (green),
    spanning-tree edges (dark green), loop edges (red) and the current
    camera (bold green) — orthographic projection from a tilted viewpoint,
    pure numpy (the headless Pangolin stand-in). Returns (size, size, 3).
    """
    out = np.full((size, size, 3), 255, np.uint8)
    alive = np.nonzero(kf_valid)[0]
    centers = {}
    Rwcs = {}
    for k in alive:
        T = kf_Tcw[k]
        Rwcs[k] = T[:3, :3].T
        centers[k] = -T[:3, :3].T @ T[:3, 3]
    pts = mp_pos[mp_valid]
    ref_pts = (
        np.concatenate([pts] + [c[None] for c in centers.values()])
        if len(centers)
        else pts
    )
    if len(ref_pts) == 0:
        return out

    # View rotation (elevation around x, azimuth around y), orthographic.
    ce, se = np.cos(np.radians(elev_deg)), np.sin(np.radians(elev_deg))
    ca, sa = np.cos(np.radians(azim_deg)), np.sin(np.radians(azim_deg))
    Rx = np.array([[1, 0, 0], [0, ce, -se], [0, se, ce]])
    Ry = np.array([[ca, 0, sa], [0, 1, 0], [-sa, 0, ca]])
    Rv = Rx @ Ry

    proj_ref = ref_pts @ Rv.T
    lo = np.percentile(proj_ref[:, :2], 2, axis=0) - 1.0
    hi = np.percentile(proj_ref[:, :2], 98, axis=0) + 1.0
    span = float(np.maximum(hi - lo, 1e-3).max())

    def to_px(p3):
        v = Rv @ p3
        x = int((v[0] - lo[0]) / span * (size - 1))
        y = int((v[1] - lo[1]) / span * (size - 1))
        return np.clip(x, -10 * size, 10 * size), np.clip(
            size - 1 - y, -10 * size, 10 * size
        )

    # points
    pv = pts @ Rv.T
    xs = ((pv[:, 0] - lo[0]) / span * (size - 1)).astype(int)
    ys = (size - 1 - (pv[:, 1] - lo[1]) / span * (size - 1)).astype(int)
    ok = (xs >= 0) & (xs < size) & (ys >= 0) & (ys < size)
    out[ys[ok], xs[ok]] = (170, 170, 170)

    # graph edges
    if covis is not None:
        for i_ix, k in enumerate(alive):
            for k2 in alive[i_ix + 1 :]:
                if covis[k, k2] >= covis_min_weight:
                    _draw_line(out, to_px(centers[k]), to_px(centers[k2]), (90, 200, 90))
    if kf_parent is not None:
        for k in alive:
            p = int(kf_parent[k])
            if p >= 0 and kf_valid[p]:
                _draw_line(out, to_px(centers[k]), to_px(centers[p]), (0, 120, 0))
    if loop_edges is not None:
        ii, jj = np.nonzero(loop_edges)
        for a, b in zip(ii, jj):
            if a < b and kf_valid[a] and kf_valid[b]:
                _draw_line(out, to_px(centers[a]), to_px(centers[b]), (230, 30, 30))

    # keyframe frusta (reference DrawKeyFrames: w=0.05 scaled pyramid)
    def draw_frustum(T, scale, color):
        Rwc = T[:3, :3].T
        c = -Rwc @ T[:3, 3]
        w, h, z = 0.6 * scale, 0.45 * scale, 0.5 * scale
        corners_cam = np.array(
            [[w, h, z], [w, -h, z], [-w, -h, z], [-w, h, z]]
        )
        corners = (corners_cam @ Rwc.T) + c
        pc = to_px(c)
        pw = [to_px(cc) for cc in corners]
        for a in range(4):
            _draw_line(out, pc, pw[a], color)
            _draw_line(out, pw[a], pw[(a + 1) % 4], color)

    for k in alive:
        draw_frustum(kf_Tcw[k], frustum_scale, (60, 60, 230))
    if cur_Tcw is not None:
        draw_frustum(np.asarray(cur_Tcw), 1.6 * frustum_scale, (0, 180, 0))
    return out


def save_png(path: str, img: np.ndarray):
    """Write a PNG with the in-house encoder (utils/png_io.py)."""
    from my_orb_slam2_tpu.utils.png_io import write_png

    write_png(path, np.asarray(img, np.uint8))


class LiveViewer:
    """GL-free LIVE viewer loop (reference Viewer::Run, src/Viewer.cc:68-166).

    The reference spawns a Pangolin window with menu toggles (Follow
    Camera / Localization Mode / Reset) and redraws the annotated frame +
    3D map each iteration. Headless equivalent: atomically overwrite
    `live_frame.png` / `live_map.png` in a directory (any image watcher
    becomes the "window"), and poll a `control` file for the menu actions:

        echo localization >> DIR/control   # menuLocalizationMode on
        echo slam         >> DIR/control   # ... off
        echo reset        >> DIR/control   # menuReset
        echo follow       >> DIR/control   # follow-camera 3D view
        echo free         >> DIR/control   # world-fixed 3D view
    """

    def __init__(self, out_dir: str):
        import os

        self.dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.control_path = os.path.join(out_dir, "control")
        self.follow = True
        self._consumed = 0

    def poll_commands(self, system) -> list:
        """Apply any new control-file commands (reference Viewer reads its
        menu state every loop and drives Tracking, src/Viewer.cc:110-135).
        Returns the commands applied."""
        import os

        if not os.path.exists(self.control_path):
            return []
        lines = open(self.control_path).read().split("\n")
        new = [c.strip().lower() for c in lines[self._consumed:] if c.strip()]
        self._consumed = len(lines) - (1 if lines and lines[-1] == "" else 0)
        for cmd in new:
            if cmd == "localization":
                system.activate_localization_mode()
            elif cmd == "slam":
                system.deactivate_localization_mode()
            elif cmd == "reset":
                system.reset()
            elif cmd == "follow":
                self.follow = True
            elif cmd == "free":
                self.follow = False
        return new

    def update(self, system, gray_img, info, frame_idx: int):
        """Redraw live_frame.png + live_map.png (atomic rename so watchers
        never see a half-written file)."""
        import os

        tr = system.tracker
        img = np.asarray(gray_img)
        if img.ndim == 3:
            img = img.mean(axis=-1).astype(np.uint8)
        fr = tr.last_frame
        if fr is not None:
            cur = np.asarray(tr.last_mp)
            mode = "LOCALIZATION" if tr.only_tracking else "SLAM"
            canvas = draw_frame(
                img, np.asarray(fr.uv), cur >= 0, np.asarray(fr.valid),
                state_text=f"frame {frame_idx} state={info.get('state')} "
                           f"{mode} inliers={info.get('localmap_inliers', '-')}",
            )
            tmp = os.path.join(self.dir, ".live_frame.tmp.png")
            save_png(tmp, canvas)
            os.replace(tmp, os.path.join(self.dir, "live_frame.png"))
        m = tr.map
        mp_pos = np.asarray(m.mp_pos)
        kf_Tcw = np.asarray(m.kf_Tcw)
        cur_Tcw = info.get("Tcw")
        if self.follow and cur_Tcw is not None:
            # Follow camera (reference s_cam.Follow(Twc), src/Viewer.cc:97-
            # 125): recenter the world on the current camera position.
            center = np.linalg.inv(cur_Tcw)[:3, 3]
            mp_pos = mp_pos - center
            kf_Tcw = kf_Tcw.copy()
            kf_Tcw[:, :3, 3] = kf_Tcw[:, :3, 3] + kf_Tcw[:, :3, :3] @ center
            cur_Tcw = cur_Tcw.copy()
            cur_Tcw[:3, 3] = cur_Tcw[:3, 3] + cur_Tcw[:3, :3] @ center
        three_d = render_map_3d(
            mp_pos, np.asarray(m.mp_valid), kf_Tcw, np.asarray(m.kf_valid),
            covis=np.asarray(m.covis), kf_parent=np.asarray(m.kf_parent),
            loop_edges=np.asarray(m.loop_edges), cur_Tcw=cur_Tcw,
        )
        tmp = os.path.join(self.dir, ".live_map.tmp.png")
        save_png(tmp, three_d)
        os.replace(tmp, os.path.join(self.dir, "live_map.png"))

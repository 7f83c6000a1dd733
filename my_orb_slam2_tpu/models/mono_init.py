"""Monocular two-view initialization (reference Tracking::
MonocularInitialization + Initializer, src/Tracking.cc:611-785,
src/Initializer.cc).

Flow: a reference frame with >=100 keypoints is latched; each subsequent
frame is matched against it (window search, ratio 0.9); with >=100 matches
both models (H and F) are estimated in one batched RANSAC jit, selected by
RH = SH/(SH+SF) > 0.40, and reconstructed (Faugeras / essential
decomposition with cheirality). On success the initial map is built:
two keyframes, triangulated points, 20 iterations of global BA, and the
median-depth=1 scale fix (src/Tracking.cc:734-761).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from my_orb_slam2_tpu.models import map_state as ms
from my_orb_slam2_tpu.models.frame import FrameData
from my_orb_slam2_tpu.ops import ba, lie, matching, twoview
from my_orb_slam2_tpu.utils.config import SlamConfig


@functools.partial(jax.jit, static_argnames=("cfg",))
def match_for_initialization(cfg: SlamConfig, ref: FrameData, cur: FrameData, prev_uv):
    idx, ok, dist = matching.search_for_initialization(
        ref.uv, ref.valid, ref.desc, ref.angle,
        cur.uv, cur.octave, cur.valid, cur.desc, cur.angle,
        prev_uv, window=100.0, max_dist=50.0, ratio=0.9,
    )
    matched_uv = jnp.where(ok[:, None], jnp.take(cur.uv, idx, axis=0), prev_uv)
    return idx, ok, jnp.sum(ok), matched_uv


@functools.partial(jax.jit, static_argnames=("cfg",))
def two_view_bootstrap(cfg: SlamConfig, key, uv_ref, uv_cur, mask):
    """RANSAC H??F + model selection + reconstruction in one dispatch.

    Returns dict(success, Tcw2 (4,4), pts3d (N,3), good (N,), used_h).
    """
    cam = cfg.camera
    res = twoview.ransac_h_f(key, uv_ref, uv_cur, mask, n_iters=200)
    use_h = res["rh"] > 0.40  # reference src/Initializer.cc:112-118
    rec_h = twoview.reconstruct_h(
        res["H21"], uv_ref, uv_cur, res["inliers_h"], cam.fx, cam.fy, cam.cx, cam.cy,
        min_parallax=1.0, min_triangulated=50,
    )
    rec_f = twoview.reconstruct_f(
        res["F21"], uv_ref, uv_cur, res["inliers_f"], cam.fx, cam.fy, cam.cx, cam.cy,
        min_parallax=1.0, min_triangulated=50,
    )
    pick = lambda a, b: jnp.where(use_h, a, b)
    success = jnp.where(use_h, rec_h["success"], rec_f["success"])
    R = pick(rec_h["R"], rec_f["R"])
    t = pick(rec_h["t"], rec_f["t"])
    pts = pick(rec_h["pts3d"], rec_f["pts3d"])
    good = jnp.where(use_h, rec_h["good"], rec_f["good"])
    Tcw2 = lie.se3_from_Rt(R, t)
    return {"success": success, "Tcw2": Tcw2, "pts3d": pts, "good": good, "used_h": use_h}


@functools.partial(jax.jit, static_argnames=("cfg", "ba_iters"), donate_argnames=("state",))
def create_initial_map_mono(
    cfg: SlamConfig,
    state: ms.MapState,
    ref: FrameData,
    cur: FrameData,
    match_idx,
    good,
    Tcw2,
    pts3d,
    ts_ref,
    ts_cur,
    ba_iters: int = 20,
):
    """Two keyframes + triangulated points + global BA + median-depth scale
    (reference CreateInitialMapMonocular, src/Tracking.cc:685-785).

    Returns (state, Tcw2_scaled, kf1_id, cur_mp (N,), n_points).
    """
    cam = cfg.camera
    N = ref.uv.shape[0]
    MP = state.mp_pos.shape[0]
    inval = jnp.full((N,), ms.INVALID, jnp.int32)
    # KF0 at identity.
    state, kf0 = ms.insert_keyframe(
        state, jnp.eye(4), jnp.int32(0), ts_ref,
        ref.uv, ref.ur, ref.depth, ref.octave, ref.angle, ref.desc, ref.valid, inval,
    )
    state, kf1 = ms.insert_keyframe(
        state, Tcw2, jnp.int32(1), ts_cur,
        cur.uv, cur.ur, cur.depth, cur.octave, cur.angle, cur.desc, cur.valid, inval,
    )
    # Allocate points for good matches (slot i of ref frame).
    sf = cfg.orb.scale_factor
    d0 = jnp.linalg.norm(pts3d, axis=1)
    level_sf = sf ** ref.octave.astype(jnp.float32)
    state, slots, okalloc = ms.add_map_points(
        state,
        pts3d,
        ref.desc,
        pts3d / jnp.maximum(d0[:, None], 1e-9),
        d0 * level_sf / (sf ** (cfg.orb.n_levels - 1)),
        d0 * level_sf,
        jnp.full((N,), kf1, jnp.int32),
        good,
    )
    wired = good & okalloc
    row0 = jnp.where(wired, slots, state.kf_mp[kf0])
    # kf1 slots via match_idx
    flat = jnp.where(wired, match_idx, 0)
    row1 = state.kf_mp[kf1].at[flat].max(jnp.where(wired, slots, -1))
    state = state._replace(
        kf_mp=state.kf_mp.at[kf0].set(row0).at[kf1].set(row1)
    )
    # Bulk wiring above bypassed the incremental index updates — rebuild the
    # inverted observation index once (init-time only, 2 keyframes).
    state = ms.rebuild_obs_index(state)
    state = ms.refresh_covisibility(state, jnp.array([kf0, kf1], jnp.int32))
    state = state._replace(kf_parent=state.kf_parent.at[kf1].set(kf0))

    # Global BA over the 2-view map.
    from my_orb_slam2_tpu.models.loop_closing import extract_global_ba

    prob = extract_global_ba(cfg, state, max_obs=4096)
    prob = prob._replace(cam_fixed=prob.cam_fixed.at[kf0].set(True))
    prob = ba.bundle_adjust(
        prob, cam.fx, cam.fy, cam.cx, cam.cy, cam.bf, n_iters=ba_iters, cg_iters=16
    )
    state = state._replace(
        kf_Tcw=jnp.where(state.kf_valid[:, None, None], prob.cam_Tcw, state.kf_Tcw),
        mp_pos=jnp.where(state.mp_valid[:, None], prob.pt_pos, state.mp_pos),
    )

    # Median-depth scaling (scale so median depth in KF0 == 1).
    pc = state.mp_pos  # KF0 at identity -> camera == world
    zvals = jnp.where(state.mp_valid, pc[:, 2], jnp.nan)
    med = jnp.nanmedian(zvals)
    inv_med = 1.0 / jnp.maximum(med, 1e-6)
    T1 = state.kf_Tcw[kf1]
    T1 = T1.at[:3, 3].set(T1[:3, 3] * inv_med)
    state = state._replace(
        mp_pos=jnp.where(state.mp_valid[:, None], state.mp_pos * inv_med, state.mp_pos),
        kf_Tcw=state.kf_Tcw.at[kf1].set(T1),
    )
    state = ms.update_point_geometry(state, state.mp_valid, sf, cfg.orb.n_levels)
    n_points = jnp.sum(wired)
    cur_mp = state.kf_mp[kf1]
    return state, T1, kf1, cur_mp, n_points


def _compact_init_frames(ref, cur, match_idx, good, pts3d, capacity: int):
    """Compact 2x-capacity initialization frames down to the pipeline's
    keypoint capacity, keeping every matched keypoint.

    The reference extracts 2x features while monocular-uninitialized
    (src/Tracking.cc:274-277) and keeps all of them in the two initial
    keyframes; here keyframe rows are fixed-capacity, so after a successful
    bootstrap the surviving matches (always << capacity) are kept and the
    remainder filled in extraction order (which preserves the per-level
    quota balance). One-time host-side work at initialization.
    """
    n2 = int(ref.uv.shape[0])
    if n2 <= capacity:
        return ref, cur, match_idx, good, pts3d
    good_np = np.asarray(good)
    mi = np.asarray(match_idx)
    order_ref = np.argsort(~good_np, kind="stable")  # matched rows first
    perm_ref = order_ref[:capacity]
    kept_good = good_np[perm_ref]
    tgt = mi[perm_ref][kept_good]
    is_tgt = np.zeros(n2, bool)
    is_tgt[tgt] = True
    order_cur = np.argsort(~is_tgt, kind="stable")
    perm_cur = order_cur[:capacity]
    inv_cur = np.zeros(n2, np.int32)
    inv_cur[perm_cur] = np.arange(capacity, dtype=np.int32)
    new_mi = inv_cur[mi[perm_ref]]
    take = lambda fr, perm: jax.tree_util.tree_map(
        lambda a: jnp.asarray(np.asarray(a)[perm]), fr
    )
    return (
        take(ref, perm_ref),
        take(cur, perm_cur),
        jnp.asarray(new_mi),
        jnp.asarray(kept_good),
        jnp.asarray(np.asarray(pts3d)[perm_ref]),
    )


class MonoInitializer:
    """Host driver latched into the Tracker for MONOCULAR sensors."""

    def __init__(self, cfg: SlamConfig):
        self.cfg = cfg
        self.ref: Optional[FrameData] = None
        self.ref_ts = 0.0
        self.prev_matched = None
        self._key = jax.random.PRNGKey(3)

    def try_initialize(self, tracker, frame: FrameData, timestamp: float) -> bool:
        cfg = self.cfg
        n_kp = int(jnp.sum(frame.valid))
        if self.ref is None:
            if n_kp >= cfg.tracking.min_mono_init_keypoints:
                self.ref = frame
                self.ref_ts = timestamp
                self.prev_matched = self.ref.uv
            return False
        if n_kp < cfg.tracking.min_mono_init_keypoints:
            self.ref = None  # reference dropped (reference src/Tracking.cc:630)
            return False
        idx, ok, n_matches, matched_uv = match_for_initialization(
            cfg, self.ref, frame, self.prev_matched
        )
        self.prev_matched = matched_uv
        if int(n_matches) < cfg.tracking.min_mono_init_matches:
            self.ref = None
            return False
        uv_cur = jnp.take(frame.uv, idx, axis=0)
        self._key, k = jax.random.split(self._key)
        boot = two_view_bootstrap(cfg, k, self.ref.uv, uv_cur, ok)
        if not bool(boot["success"]):
            return False
        ref_c, cur_c, idx_c, good_c, pts_c = _compact_init_frames(
            self.ref, frame, idx, boot["good"] & ok, boot["pts3d"],
            tracker.capacity,
        )
        tracker.map, T1, kf1, cur_mp, n_pts = create_initial_map_mono(
            cfg, tracker.map, ref_c, cur_c, idx_c, good_c,
            boot["Tcw2"], pts_c,
            jnp.float32(self.ref_ts), jnp.float32(timestamp),
        )
        frame = cur_c
        if int(n_pts) < 80:
            # Roll back is impossible on the donated state; treat as success
            # only with enough points — otherwise reset the whole map.
            tracker.map = ms.init_map_state(cfg, tracker.capacity)
            self.ref = None
            return False
        from my_orb_slam2_tpu.models.tracking import TrackingState

        tracker.reset_motion(np.asarray(T1))
        tracker.state = TrackingState.OK
        tracker.last_frame = frame
        tracker.last_mp = cur_mp
        tracker.n_kf = int(tracker.map.n_kf)
        tracker.ref_kf = int(kf1)
        tracker._ref_pose_host = tracker.Tcw.copy()
        tracker.last_kf_frame_id = tracker.frame_id
        tracker.kf_counter += 2
        if tracker.local_mapper is not None:
            tracker.map = tracker.local_mapper.process(tracker.map, int(kf1))
        return True

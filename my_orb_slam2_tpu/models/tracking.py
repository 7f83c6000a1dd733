"""Tracking: the per-frame pose pipeline (reference src/Tracking.cc).

Architecture: all heavy per-frame work is in jitted pure functions over
(MapState, FrameData) — motion-model search + pose optimization, local-map
tracking, keyframe creation — while a thin host `Tracker` runs the state
machine (NOT_INITIALIZED / OK / LOST, reference include/Tracking.h:81-87),
the keyframe policy, and the trajectory log. Per frame only a handful of
scalars cross device->host.

Mapping of reference methods:
- TrackWithMotionModel (src/Tracking.cc:915-984) -> `track_motion`
- TrackReferenceKeyFrame (src/Tracking.cc:805-847) -> `track_ref_kf`
- TrackLocalMap + UpdateLocalKeyFrames/Points + SearchLocalPoints
  (src/Tracking.cc:991-1442) -> `track_local_map`
- StereoInitialization (src/Tracking.cc:556-609) -> `Tracker.initialize_stereo`
- NeedNewKeyFrame / CreateNewKeyFrame (src/Tracking.cc:1049-1226) ->
  `Tracker._need_new_keyframe` / `insert_keyframe_with_points`
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from my_orb_slam2_tpu.models import map_state as ms
from my_orb_slam2_tpu.models.frame import FrameData
from my_orb_slam2_tpu.ops import lie, matching, pose_opt
from my_orb_slam2_tpu.ops.projection import frustum_check, predict_scale
from my_orb_slam2_tpu.utils.config import SlamConfig

INVALID = -1


def _motion_octave_window(cfg: SlamConfig, last_octave, Tcw_last, Tcw_pred):
    """Forward/backward octave window + octave-scaled radius for the
    motion-model search (reference src/ORBmatcher.cc:1412-1475): when the
    camera advanced by more than the stereo baseline, points appear at a
    coarser octave (search [lastOctave, top]); when it retreated, finer
    ([0, lastOctave]); otherwise +-1 around the last octave. The window
    radius scales with the last observation's octave."""
    n_levels = cfg.orb.n_levels
    sf_tab = jnp.asarray(
        [cfg.orb.scale_factor ** l for l in range(n_levels)], jnp.float32
    )
    oct_c = jnp.clip(last_octave, 0, n_levels - 1)
    radius_sf = jnp.take(sf_tab, oct_c)
    mono = cfg.camera.bf <= 0
    if mono:
        return oct_c - 1, oct_c + 1, radius_sf
    # z of the current camera center in the last camera's frame
    # (reference tlc = Rlw * twc + tlw).
    T_lc = Tcw_last @ lie.se3_inverse(Tcw_pred)
    z_fwd = T_lc[2, 3]
    baseline = cfg.camera.baseline
    forward = z_fwd > baseline
    backward = -z_fwd > baseline
    lo = jnp.where(forward, oct_c, jnp.where(backward, 0, oct_c - 1))
    hi = jnp.where(
        forward, n_levels - 1, jnp.where(backward, oct_c, oct_c + 1)
    )
    return lo, hi, radius_sf


@jax.jit
def _row_i32(table, i):
    """Jitted row slice (an eager `table[i]` is its own ~5 ms device
    program through the tunnel)."""
    return table[i]


class TrackResult(NamedTuple):
    Tcw: jnp.ndarray  # (4,4)
    cur_mp: jnp.ndarray  # (N,) map point id per keypoint slot
    n_matches: jnp.ndarray  # () i32 matches used for pose opt
    n_inliers: jnp.ndarray  # () i32 inliers after pose opt
    n_map: jnp.ndarray  # () i32 inliers that are real map points (== n_inliers
    # except in localization-mode VO tracking, where temporal anchors also
    # contribute; reference nmatchesMap src/Tracking.cc:962-983)


# ---------------------------------------------------------------------------
# Jitted tracking stages
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg",))
def track_motion(
    cfg: SlamConfig,
    state: ms.MapState,
    frame: FrameData,
    last_uv,
    last_mp,
    last_valid,
    last_octave,
    Tcw_last,
    Tcw_pred,
):
    """Motion-model tracking: project last frame's map points into the
    current frame, window-search, pose-optimize (reference
    TrackWithMotionModel src/Tracking.cc:915-984 + matcher variant (2)
    src/ORBmatcher.cc:1392)."""
    cam = cfg.camera
    MP = state.mp_pos.shape[0]
    lm = jnp.where(last_valid & (last_mp >= 0), last_mp, 0)
    pt_ok = last_valid & (last_mp >= 0) & jnp.take(state.mp_valid, lm)
    pts_w = jnp.take(state.mp_pos, lm, axis=0)
    pt_desc = jnp.take(state.mp_desc, lm, axis=0)

    from my_orb_slam2_tpu.ops.projection import project_stereo

    uvr, z = project_stereo(Tcw_pred, pts_w, cam.fx, cam.fy, cam.cx, cam.cy, cam.bf)
    pred_valid = pt_ok & (z > 0.0)
    lo, hi, radius_sf = _motion_octave_window(cfg, last_octave, Tcw_last, Tcw_pred)

    def run_search(th):
        idx, ok, dist = matching.search_by_projection(
            uvr[:, :2],
            last_octave,
            pred_valid,
            pt_desc,
            th * radius_sf,
            frame.uv,
            frame.octave,
            frame.valid,
            frame.desc,
            kp_ur=frame.ur,
            pred_ur=uvr[:, 2],
            level_lo=lo,
            level_hi=hi,
            max_dist=matching.TH_HIGH,
            ratio=0.9,
        )
        return idx, ok

    th0 = 7.0 if cfg.sensor.name == "STEREO" else 15.0
    idx, ok = run_search(th0)
    n0 = jnp.sum(ok)

    idx2, ok2 = run_search(2 * th0)
    use_wide = n0 < cfg.tracking.min_motion_matches
    idx = jnp.where(use_wide, idx2, idx)
    ok = jnp.where(use_wide, ok2, ok)

    # Build per-keypoint assignment: keypoint idx[i] observes point lm[i].
    N = frame.uv.shape[0]
    cur_mp = jnp.full((N,), INVALID, jnp.int32).at[jnp.where(ok, idx, N - 1)].max(
        jnp.where(ok, lm, INVALID), mode="drop"
    )
    # Pose optimization on assigned matches.
    res = _pose_opt_on_assignment(cfg, state, frame, cur_mp, Tcw_pred)
    return TrackResult(
        res["Tcw"], res["cur_mp"], jnp.sum(ok), res["n_inliers"], res["n_inliers"]
    )


def _pose_opt_on_points(cfg: SlamConfig, frame, pts_w, mask, Tcw0):
    """Pose-optimize the frame against explicit per-keypoint world points."""
    cam = cfg.camera
    inv_s2 = 1.0 / jnp.asarray(
        [cfg.orb.scale_factor ** (2 * l) for l in range(cfg.orb.n_levels)], jnp.float32
    )[frame.octave]
    return pose_opt.pose_optimization(
        Tcw0, pts_w, frame.uv, frame.ur, inv_s2, mask,
        cam.fx, cam.fy, cam.cx, cam.cy, cam.bf,
    )


def _pose_opt_on_assignment(cfg: SlamConfig, state, frame, cur_mp, Tcw0):
    """Pose-optimize the frame against its assigned map points; demote
    outlier assignments (reference pattern after every track stage,
    e.g. src/Tracking.cc:960-983)."""
    lm = jnp.where(cur_mp >= 0, cur_mp, 0)
    mask = (cur_mp >= 0) & frame.valid & jnp.take(state.mp_valid, lm)
    pts_w = jnp.take(state.mp_pos, lm, axis=0)
    res = _pose_opt_on_points(cfg, frame, pts_w, mask, Tcw0)
    cur_mp = jnp.where(res["inliers"], cur_mp, INVALID)
    return {"Tcw": res["Tcw"], "cur_mp": cur_mp, "n_inliers": res["n_inliers"]}


@functools.partial(jax.jit, static_argnames=("cfg",))
def track_motion_vo(
    cfg: SlamConfig,
    state: ms.MapState,
    frame: FrameData,
    last_uv,
    last_depth,
    last_desc,
    last_mp,
    last_valid,
    last_octave,
    Tcw_last,
    Tcw_pred,
):
    """Localization-mode motion tracking with temporal visual-odometry
    anchors (reference UpdateLastFrame src/Tracking.cc:849-913: in
    localization mode, stereo/RGB-D keypoints of the last frame with valid
    depth but no map point are back-projected into temporary points so the
    motion model stays anchored when map coverage thins out).

    Temporal anchors contribute residuals to pose optimization but are never
    written into the map; `n_map` counts inliers that are real map points —
    the host uses it for the reference's mbVO flag (src/Tracking.cc:375-384).
    """
    cam = cfg.camera
    from my_orb_slam2_tpu.ops.projection import backproject, project_stereo

    lm = jnp.where(last_valid & (last_mp >= 0), last_mp, 0)
    has_mp = last_valid & (last_mp >= 0) & jnp.take(state.mp_valid, lm)
    # Temporal anchors: depth-valid last-frame keypoints without a map point.
    pc = backproject(last_uv, last_depth, cam.fx, cam.fy, cam.cx, cam.cy)
    Twc_last = lie.se3_inverse(Tcw_last)
    pw_temp = lie.se3_apply(Twc_last, pc)
    is_temp = last_valid & (last_depth > 0.0) & ~has_mp

    pts_w = jnp.where(has_mp[:, None], jnp.take(state.mp_pos, lm, axis=0), pw_temp)
    desc = jnp.where(has_mp[:, None], jnp.take(state.mp_desc, lm, axis=0), last_desc)
    cand_ok = has_mp | is_temp

    uvr, z = project_stereo(Tcw_pred, pts_w, cam.fx, cam.fy, cam.cx, cam.cy, cam.bf)
    pred_valid = cand_ok & (z > 0.0)
    lo, hi, radius_sf = _motion_octave_window(cfg, last_octave, Tcw_last, Tcw_pred)

    def run_search(th):
        idx, ok, dist = matching.search_by_projection(
            uvr[:, :2],
            last_octave,
            pred_valid,
            desc,
            th * radius_sf,
            frame.uv,
            frame.octave,
            frame.valid,
            frame.desc,
            kp_ur=frame.ur,
            pred_ur=uvr[:, 2],
            level_lo=lo,
            level_hi=hi,
            max_dist=matching.TH_HIGH,
            ratio=0.9,
        )
        return idx, ok

    th0 = 7.0 if cfg.sensor.name == "STEREO" else 15.0
    idx, ok = run_search(th0)
    n0 = jnp.sum(ok)
    idx2, ok2 = run_search(2 * th0)
    use_wide = n0 < cfg.tracking.min_motion_matches
    idx = jnp.where(use_wide, idx2, idx)
    ok = jnp.where(use_wide, ok2, ok)

    # Per-keypoint candidate slot (index into the last frame's arrays).
    N = frame.uv.shape[0]
    L = last_uv.shape[0]
    slot = jnp.full((N,), INVALID, jnp.int32).at[jnp.where(ok, idx, N - 1)].max(
        jnp.where(ok, jnp.arange(L, dtype=jnp.int32), INVALID), mode="drop"
    )
    matched = slot >= 0
    slot_c = jnp.clip(slot, 0, L - 1)
    kp_pts = jnp.take(pts_w, slot_c, axis=0)
    res = _pose_opt_on_points(cfg, frame, kp_pts, matched & frame.valid, Tcw_pred)
    inl = res["inliers"]
    slot_has_mp = jnp.take(has_mp, slot_c)
    cur_mp = jnp.where(inl & slot_has_mp, jnp.take(lm, slot_c), INVALID)
    n_map = jnp.sum(inl & slot_has_mp)
    return TrackResult(res["Tcw"], cur_mp, jnp.sum(ok), res["n_inliers"], n_map)


@functools.partial(jax.jit, static_argnames=("cfg",))
def track_ref_kf(cfg: SlamConfig, state: ms.MapState, frame: FrameData, kf_id, Tcw0):
    """Reference-keyframe tracking: descriptor matching against one KF's
    features + pose opt (reference TrackReferenceKeyFrame
    src/Tracking.cc:805-847 via SearchByBoW)."""
    kf_desc = state.kf_desc[kf_id]
    kf_valid_kp = state.kf_kp_valid[kf_id]
    kf_mp = state.kf_mp[kf_id]
    has_mp = kf_mp >= 0
    idx, ok, dist = matching.search_brute(
        frame.desc,
        frame.valid,
        kf_desc,
        kf_valid_kp & has_mp,
        frame.angle,
        state.kf_angle[kf_id],
        max_dist=matching.TH_LOW,
        ratio=0.7,
    )
    cur_mp = jnp.where(ok, jnp.take(kf_mp, idx), INVALID)
    n_matches = jnp.sum(cur_mp >= 0)
    res = _pose_opt_on_assignment(cfg, state, frame, cur_mp, Tcw0)
    # <15 BoW matches aborts the whole stage (reference src/Tracking.cc:815
    # returns false before pose optimization) — zeroed inliers make the
    # host's lost check fail exactly as the reference's bOK=false does.
    enough = n_matches >= cfg.tracking.min_bow_matches
    n_inl = jnp.where(enough, res["n_inliers"], 0)
    cur_out = jnp.where(enough, res["cur_mp"], INVALID)
    return TrackResult(res["Tcw"], cur_out, n_matches, n_inl, n_inl)


@functools.partial(jax.jit, static_argnames=("cfg",))
def track_local_map(
    cfg: SlamConfig,
    state: ms.MapState,
    frame: FrameData,
    Tcw,
    cur_mp,
    ref_min_obs=3,
):
    """Local-map tracking (reference TrackLocalMap src/Tracking.cc:991-1035):
    build the local keyframe set from covisibility, project their points,
    search, pose-optimize; also returns keyframe-policy statistics and
    updated visible/found counters.
    """
    cam = cfg.camera
    KF = state.kf_Tcw.shape[0]
    MP = state.mp_pos.shape[0]
    N = frame.uv.shape[0]

    # --- K1: keyframes observing current matched points ------------------
    # The reference walks every matched point's observer map and votes
    # (src/Tracking.cc:1331-1360) — exact equivalent via the inverted
    # observation index, O(N x K) per frame.
    k1_score = ms.observer_votes(state, cur_mp, cur_mp >= 0)
    ref_kf = jnp.argmax(k1_score)

    # --- K2: covisible neighborhood of K1 ---------------------------------
    k1 = k1_score > 0
    neigh_w = jnp.max(jnp.where(k1[:, None], state.covis, 0), axis=0)  # (KF,)
    # Parents AND children of every K1 member (reference adds each K1
    # keyframe's spanning-tree children and parent to the local set,
    # src/Tracking.cc:1395-1420) — children = KFs whose parent is in K1,
    # parents = scatter of K1 members' kf_parent entries.
    par_ids = state.kf_parent  # (KF,)
    parent_mask = jnp.zeros((KF,), bool).at[
        jnp.where(k1 & (par_ids >= 0), par_ids, 0)
    ].set(k1 & (par_ids >= 0))
    child_mask = (par_ids >= 0) & jnp.take(k1, jnp.maximum(par_ids, 0))
    tree_mask = parent_mask | child_mask
    local_score = (
        k1_score.astype(jnp.float32) * 1e6
        + neigh_w.astype(jnp.float32)
        + tree_mask.astype(jnp.float32)
    ) * state.kf_valid
    cap = min(cfg.tracking.max_local_keyframes, KF)
    top_scores, top_ids = jax.lax.top_k(local_score, cap)
    local_kf_mask = jnp.zeros((KF,), bool).at[top_ids].set(top_scores > 0)

    # --- local points: union of observations of local KFs -----------------
    # Gather only the top-`cap` keyframe rows (cap x N) instead of masking
    # the full (KF x N) table — the dominant per-frame cost at capacity.
    top_rows = jnp.take(state.kf_mp, top_ids, axis=0)  # (cap, N)
    top_rows_ok = (
        (top_scores > 0)[:, None]
        & (top_rows >= 0)
        & jnp.take(state.kf_kp_valid, top_ids, axis=0)
    )
    local_pt = jnp.zeros((MP + 1,), bool).at[
        jnp.where(top_rows_ok, top_rows, MP).reshape(-1)
    ].set(True)[:MP]
    local_pt = local_pt & state.mp_valid

    # Points already matched in this frame: mark found+visible (reference
    # src/Tracking.cc:1234-1244), exclude from search.
    already = jnp.zeros((MP,), bool).at[jnp.where(cur_mp >= 0, cur_mp, 0)].set(
        cur_mp >= 0
    )
    search_pt = local_pt & ~already

    # --- frustum cull + predicted projection ------------------------------
    ok_f, uv_p, z_p, dist_p, view_cos = frustum_check(
        Tcw,
        state.mp_pos,
        state.mp_normal,
        state.mp_min_dist * 0.8,
        state.mp_max_dist * 1.2,
        cam.fx, cam.fy, cam.cx, cam.cy,
        0.0, float(cam.width), 0.0, float(cam.height),
    )
    in_frustum = search_pt & ok_f
    log_sf = float(np.log(cfg.orb.scale_factor))
    pred_level = predict_scale(dist_p, state.mp_max_dist * 1.2, log_sf, cfg.orb.n_levels)
    sf_tab = jnp.asarray(
        [cfg.orb.scale_factor ** l for l in range(cfg.orb.n_levels)], jnp.float32
    )
    # th=1 base radius; 2.5 if view_cos>0.998 else 4.0, scaled by level
    # (reference RadiusByViewingCos src/ORBmatcher.cc:134-140, th
    # multiplication src/ORBmatcher.cc:87).
    r0 = jnp.where(view_cos > 0.998, 2.5, 4.0)
    radius = r0 * jnp.take(sf_tab, pred_level)

    # Predicted stereo right-u for consistency gating.
    ur_p = uv_p[:, 0] - cam.bf / jnp.where(z_p > 1e-6, z_p, 1e9)

    kp_taken = cur_mp >= 0

    # Compact the candidate set: only in-frustum local points enter the
    # (candidates x keypoints) Hamming/window search. The frustum pass runs
    # over all MP rows (cheap elementwise), but the quadratic search drops
    # from MP x N to MAXC x N. 8192 covers the full mature local map at
    # KITTI capacity (~5k in-frustum points once dead-point cascades are
    # in), so nothing is truncated. (An earlier round measured 8192
    # WORSENING ATE 5x, but that was the highest-slot-wins collision
    # tie-break below preferring aliased new points — fixed to
    # best-distance — compounded by zombie points inflating the frustum
    # set.)
    MAXC = min(8192, MP)
    n_frustum = jnp.sum(in_frustum, dtype=jnp.int32)
    state = state._replace(
        cap_overflow=state.cap_overflow + jnp.maximum(n_frustum - MAXC, 0)
    )
    cand = jnp.nonzero(in_frustum, size=MAXC, fill_value=MP)[0]
    cand_ok = cand < MP
    cs = jnp.clip(cand, 0, MP - 1)
    idx, ok, dist = matching.search_by_projection(
        uv_p[cs],
        pred_level[cs],
        cand_ok,
        state.mp_desc[cs],
        radius[cs],
        frame.uv,
        frame.octave,
        frame.valid,
        frame.desc,
        kp_ur=frame.ur,
        pred_ur=ur_p[cs],
        level_lo=pred_level[cs] - 1,
        level_hi=pred_level[cs],
        max_dist=float(cfg.matcher.th_high),
        ratio=0.8,
        kp_taken=kp_taken,
    )
    # new assignments: keypoint idx[c] observes point cand[c]. Collisions
    # (two candidates matching the same keypoint) resolve by LOWEST Hamming
    # distance (reference keeps the running best per keypoint); a slot-order
    # tie-break instead silently prefers the newest point, which is what
    # made widening the candidate cap WORSEN accuracy in earlier rounds.
    keep = matching.one_to_one(idx, dist, ok, N)
    add_mp = jnp.full((N,), INVALID, jnp.int32).at[
        jnp.where(keep, idx, N - 1)
    ].max(jnp.where(keep, cs, INVALID), mode="drop")
    cur_mp2 = jnp.where(cur_mp >= 0, cur_mp, add_mp)

    # --- pose optimization on the full set --------------------------------
    res = _pose_opt_on_assignment(cfg, state, frame, cur_mp2, Tcw)
    cur_mp_final = res["cur_mp"]

    # --- counters: visible (in frustum) / found (matched inlier) ----------
    visible_inc = (in_frustum | already).astype(jnp.int32)
    matched_mask = jnp.zeros((MP,), bool).at[
        jnp.where(cur_mp_final >= 0, cur_mp_final, 0)
    ].set(cur_mp_final >= 0)
    found_inc = matched_mask.astype(jnp.int32)
    state = state._replace(
        mp_visible=state.mp_visible + visible_inc,
        mp_found=state.mp_found + found_inc,
    )

    # --- keyframe-policy statistics ---------------------------------------
    # nRefMatches: reference KF tracked points with >=3 observations
    # (reference src/Tracking.cc:1073 TrackedMapPoints(minObs)).
    # min_obs drops to 2 while the map has <= 2 keyframes (reference
    # src/Tracking.cc:1069-1071), passed in by the host.
    ref_mp = state.kf_mp[ref_kf]
    ref_ok = (ref_mp >= 0) & state.kf_kp_valid[ref_kf]
    ref_lm = jnp.where(ref_ok, ref_mp, 0)
    ref_matches = jnp.sum(
        ref_ok
        & (jnp.take(state.mp_n_obs, ref_lm) >= ref_min_obs)
        & jnp.take(state.mp_valid, ref_lm)
    )
    # Close-point starvation stats (reference src/Tracking.cc:1076-1092).
    close = (frame.depth > 0) & (frame.depth < cam.close_depth) & frame.valid
    tracked_close = jnp.sum(close & (cur_mp_final >= 0))
    nontracked_close = jnp.sum(close & (cur_mp_final < 0))

    stats = jnp.stack(
        [
            res["n_inliers"],
            ref_matches,
            tracked_close,
            nontracked_close,
            ref_kf,
            jnp.sum(local_kf_mask.astype(jnp.int32)),
        ]
    )
    return state, TrackResult(
        res["Tcw"], cur_mp_final, jnp.sum(ok), res["n_inliers"], res["n_inliers"]
    ), stats


# ---------------------------------------------------------------------------
# Keyframe insertion with stereo point creation
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("cfg", "min_new_points", "vocab_depth"),
    donate_argnames=("state",),
)
def insert_keyframe_with_points(
    cfg: SlamConfig,
    state: ms.MapState,
    frame: FrameData,
    Tcw,
    cur_mp,
    frame_id,
    timestamp,
    min_new_points: int = 100,
    vocab_pack=None,
    vocab_depth: int = 0,
):
    """Insert a keyframe and spawn close stereo/RGB-D map points for
    unmatched keypoints (reference CreateNewKeyFrame
    src/Tracking.cc:1142-1226: depth-sorted, create while depth<ThDepth or
    count<100). vocab_pack = (centers, children, leaf_word) of the packed
    vocabulary tree: when given, the keyframe's word ids are computed here
    (reference ComputeBoW at keyframe creation, src/LocalMapping.cc:145)
    and stored for the direct-index matcher gates."""
    cam = cfg.camera
    kp_words = None
    if vocab_pack is not None:
        from my_orb_slam2_tpu.ops.bow import _tree_words

        kp_words = _tree_words(frame.desc, *vocab_pack, vocab_depth)
    state, kf_id = ms.insert_keyframe(
        state,
        Tcw,
        frame_id,
        timestamp,
        frame.uv,
        frame.ur,
        frame.depth,
        frame.octave,
        frame.angle,
        frame.desc,
        frame.valid,
        cur_mp,
        obs_budget=cfg.capacity.obs_budget,
        kp_words=kp_words,
    )
    if cam.bf > 0:
        # Candidates: valid kps with depth, no map point yet.
        cand = frame.valid & (frame.depth > 0) & (cur_mp < 0)
        depth_key = jnp.where(cand, frame.depth, jnp.inf)
        order = jnp.argsort(depth_key)
        rank = jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0]))
        want = cand & ((frame.depth < cam.close_depth) | (rank < min_new_points))
        state, slots, ok = _spawn_points_from_frame(cfg, state, frame, Tcw, kf_id, want)
        # wire into this KF's rows + inverted index (fresh points: entry 0)
        MP = state.mp_pos.shape[0]
        N = frame.uv.shape[0]
        K = state.mp_obs_kf.shape[1]
        new_mp_row = jnp.where(ok, slots, state.kf_mp[kf_id])
        e_kf = jnp.full((N, K), INVALID, jnp.int32).at[:, 0].set(
            jnp.where(ok, kf_id, INVALID)
        )
        e_slot = jnp.full((N, K), INVALID, jnp.int32).at[:, 0].set(
            jnp.where(ok, jnp.arange(N, dtype=jnp.int32), INVALID)
        )
        tgt = jnp.where(ok, slots, MP)
        state = state._replace(
            kf_mp=state.kf_mp.at[kf_id].set(new_mp_row),
            mp_obs_kf=state.mp_obs_kf.at[tgt].set(e_kf, mode="drop"),
            mp_obs_slot=state.mp_obs_slot.at[tgt].set(e_slot, mode="drop"),
            mp_n_obs=state.mp_n_obs.at[jnp.where(ok, slots, MP - 1)].add(
                jnp.where(ok, jnp.where(frame.ur >= 0, 2, 1), 0), mode="drop"
            ),
        )
    return state, kf_id


def _spawn_points_from_frame(cfg, state, frame, Tcw, kf_id, want):
    """Back-project keypoints with depth into new map points."""
    cam = cfg.camera
    from my_orb_slam2_tpu.ops.projection import backproject

    pc = backproject(frame.uv, frame.depth, cam.fx, cam.fy, cam.cx, cam.cy)
    Twc = lie.se3_inverse(Tcw)
    pw = lie.se3_apply(Twc, pc)
    Ow = Twc[:3, 3]
    d = pw - Ow
    dist = jnp.linalg.norm(d, axis=-1)
    normal = d / jnp.maximum(dist[:, None], 1e-9)
    sf = cfg.orb.scale_factor
    level_sf = sf ** frame.octave.astype(jnp.float32)
    max_dist = dist * level_sf
    min_dist = max_dist / (sf ** (cfg.orb.n_levels - 1))
    state, slots, ok = ms.add_map_points(
        state,
        pw,
        frame.desc,
        normal,
        min_dist,
        max_dist,
        jnp.full(frame.uv.shape[0], kf_id, jnp.int32),
        want,
    )
    return state, slots, ok


# ---------------------------------------------------------------------------
# Host-side tracker (state machine)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg", "loc_mode"))
def track_frame(
    cfg: SlamConfig,
    state: ms.MapState,
    frame: FrameData,
    last_uv,
    last_mp,
    last_valid,
    last_octave,
    Tcw_last,
    Tcw_prev,
    has_velocity,
    ref_kf,
    ref_min_obs,
    last_depth=None,
    last_desc=None,
    loc_mode: bool = False,
):
    """One fused per-frame tracking step: motion-model tracking with
    reference-keyframe fallback, then local-map tracking — a single device
    dispatch returning (state, Tcw, cur_mp, stats).

    stats layout: [lm_inliers, ref_matches, tracked_close, nontracked_close,
    ref_kf, n_local_kfs, stage1_inliers, used_motion(0/1), stage1_map_inliers].

    With `loc_mode` (localization-only, reference mbOnlyTracking) and a
    depth-capable sensor, motion tracking uses temporal visual-odometry
    anchors (see `track_motion_vo`); stage1_map_inliers then drives the
    host's mbVO flag.

    This is the latency-critical path: the host fetches `stats` once per
    frame; everything else stays on device (the reference achieves the same
    by running Tracking inside the caller's thread with no copies,
    src/System.h:158-159 — our equivalent is one dispatch + one readback).
    The velocity model (reference src/Tracking.cc:462-469) is computed HERE
    from the two previous poses rather than on the host, so the pose chain
    `Tcw_last`/`Tcw_prev` can stay on device across frames: dispatches then
    never wait on a device->host round-trip (which costs a full tunnel RTT).
    """
    velocity = Tcw_last @ lie.se3_inverse(Tcw_prev)
    Tcw_pred = jnp.where(has_velocity, velocity @ Tcw_last, Tcw_last)
    if loc_mode and cfg.camera.bf > 0:
        res_m = track_motion_vo(
            cfg, state, frame, last_uv, last_depth, last_desc,
            last_mp, last_valid, last_octave, Tcw_last, Tcw_pred,
        )
    else:
        res_m = track_motion(
            cfg, state, frame, last_uv, last_mp, last_valid, last_octave,
            Tcw_last, Tcw_pred,
        )
    motion_ok = has_velocity & (res_m.n_inliers >= 10)
    # Reference-KF fallback only runs when the motion model failed
    # (reference src/Tracking.cc:339-345); lax.cond skips the unused branch.
    res_f = jax.lax.cond(
        motion_ok,
        lambda: res_m,
        lambda: track_ref_kf(cfg, state, frame, ref_kf, Tcw_last),
    )
    Tcw1, cur_mp1, stage1_inl = res_f.Tcw, res_f.cur_mp, res_f.n_inliers

    state, res_l, stats6 = track_local_map(
        cfg, state, frame, Tcw1, cur_mp1, ref_min_obs
    )
    # Keep the chained pose rigid: exp-updates preserve (and the velocity
    # model's transpose-inverse then amplifies) any non-orthogonality of the
    # initial guess — project back to SO(3) once per frame.
    res_l = res_l._replace(Tcw=lie.se3_orthonormalize(res_l.Tcw))
    stats = jnp.concatenate(
        [stats6, jnp.stack([stage1_inl, motion_ok.astype(jnp.int32), res_f.n_map])]
    )
    # Pack pose + stats + reference-KF pose into one f32 vector: a single
    # device->host fetch per frame (each fetch is a full tunnel round-trip).
    # The ref-KF pose feeds the relative trajectory log without another RTT.
    ref_kf_now = stats6[4].astype(jnp.int32)
    T_ref = state.kf_Tcw[ref_kf_now]
    # Overflow counters ride the same packed readback: silent-cap events
    # (compaction truncation, observation-list saturation) become visible
    # in every frame's info dict at zero extra RTT cost.
    overflow = jnp.stack(
        [state.cap_overflow, state.obs_overflow, state.shed_work]
    ).astype(jnp.float32)
    packed = jnp.concatenate(
        [res_l.Tcw.reshape(16), stats.astype(jnp.float32), T_ref.reshape(16),
         overflow]
    )
    # res_l.Tcw is returned separately as well so the host can chain it into
    # the next dispatch as a device array without ever reading it back.
    return state, res_l.cur_mp, packed, res_l.Tcw


class TrackingState:
    NOT_INITIALIZED = 0
    OK = 1
    LOST = 2


class Tracker:
    """Host orchestration of the per-frame pipeline. Mirrors the reference
    Tracking state machine; owns velocity model + trajectory log."""

    def __init__(self, cfg: SlamConfig, capacity: int, local_mapper=None):
        self.cfg = cfg
        self.capacity = capacity
        self.state = TrackingState.NOT_INITIALIZED
        self.map = ms.init_map_state(cfg, capacity)
        self.Tcw = np.eye(4, dtype=np.float32)
        # Pose chain for dispatch: the pose of the last DISPATCHED frame and
        # the one before it (np or device arrays — in pipelined mode these
        # are unresolved device values, so dispatching never blocks on the
        # tunnel RTT). `_chain_prev is None` == "no velocity model yet"
        # (reference mVelocity empty, src/Tracking.cc:462-469).
        self._chain_Tcw = self.Tcw
        self._chain_prev: Optional[np.ndarray] = None
        self.last_frame: Optional[FrameData] = None
        self.last_mp = None
        self.frame_id = 0
        self.last_kf_frame_id = 0
        self.last_reloc_frame_id = -(10 ** 9)
        self.n_kf = 0
        self.ref_kf = 0
        self.local_mapper = local_mapper
        # Relative-pose trajectory log (reference mlRelativeFramePoses,
        # src/Tracking.cc:535-551): (frame_id, timestamp, ref_kf, T_rel,
        # lost) with T_rel = Tcw * inv(T_ref_kf); composed with the final
        # keyframe poses at save time so loop corrections propagate to the
        # whole trajectory.
        self.trajectory = []
        self.kf_counter = 0
        self.kf_capacity_refusals = 0  # NeedNewKeyFrame hits the KF cap
        # Packed vocabulary tables (centers, children, leaf_word) + depth:
        # wired by SlamSystem so keyframe insertion can store word ids for
        # the direct-index matcher gates; None = no gating.
        self.vocab_pack = None
        self.vocab_depth = 0
        self.only_tracking = False  # localization mode (no KF insertion)
        self.mb_vo = False  # VO mode: few map matches in localization mode
        self.needs_reset = False  # lost-near-init auto-reset signal
        # Pipelined mode: the per-frame device->host readback of frame i is
        # resolved `pipeline_depth` frames later (it completes during the
        # intervening frames' host work), so the tunnel round-trip leaves
        # the critical path entirely. The async-dispatch analog of the
        # reference's decoupled Tracking thread. Enabled by callers that
        # stream frames (bench, dataset drivers); the sync path remains the
        # default. Depth 2 covers one full ~30ms tunnel RTT at 30 fps;
        # decision latency (KF insertion, LOST detection) lags by the same
        # amount, exactly like the reference's asynchronous mapping thread.
        self.pipelined = False
        self.pipeline_depth = 2
        self._pending = []  # FIFO of (frame, ts, frame_id, cur_mp_dev, packed_dev)
        self._anchor_mode = False  # pipelined temporal-VO anchors (hysteresis)
        self._in_retry = False  # guard: one stale-dispatch retry, no recursion

    # -- initialization ----------------------------------------------------

    def initialize_stereo(self, frame: FrameData, timestamp: float) -> bool:
        n_depth = int(jnp.sum(frame.valid & (frame.depth > 0)))
        if n_depth < self.cfg.tracking.min_stereo_init_points:
            return False
        Tcw = jnp.eye(4)
        cur_mp = jnp.full((self.capacity,), INVALID, jnp.int32)
        # Initialization creates a point for every depth-valid keypoint
        # (reference StereoInitialization src/Tracking.cc:575-597), unlike
        # the close/100 policy of later keyframes.
        self.map, kf_id = insert_keyframe_with_points(
            self.cfg, self.map, frame, Tcw, cur_mp,
            jnp.int32(self.frame_id), jnp.float32(timestamp),
            min_new_points=self.capacity,
        )
        # Every created point is now assigned in kf row; mirror into cur_mp.
        self.last_mp = self.map.kf_mp[kf_id]
        self.last_frame = frame
        self.Tcw = np.eye(4, dtype=np.float32)
        self.reset_motion()
        self.state = TrackingState.OK
        # KF slots are allocated sequentially (ms.insert_keyframe) and never
        # reused, so the host mirrors the counter instead of reading it back
        # (each readback stalls the whole device pipeline for a tunnel RTT).
        self.n_kf = 1
        self.ref_kf = 0
        self._ref_pose_host = np.eye(4, dtype=np.float32)
        self.last_kf_frame_id = self.frame_id
        self.kf_counter += 1
        if self.local_mapper is not None:
            self.map = self.local_mapper.process(self.map, int(kf_id))
        return True

    # -- motion model ---------------------------------------------------

    def reset_motion(self, Tcw: Optional[np.ndarray] = None):
        """Clear the velocity model and rebase the dispatch pose chain on a
        resolved host pose (after init, relocalization, or LOST)."""
        if Tcw is not None:
            self.Tcw = np.asarray(Tcw, np.float32)
        self._chain_Tcw = self.Tcw
        self._chain_prev = None

    # -- per-frame ---------------------------------------------------------

    def track(self, frame: FrameData, timestamp: float) -> dict:
        """Process one frame; returns dict with pose + status scalars.

        In pipelined mode the readback of frame i is resolved at the start
        of frame i+pipeline_depth (it completed during the intervening
        frames), so dispatching never blocks on the tunnel round-trip; the
        returned pose is the freshest resolved one (pipeline_depth frames of
        latency), exactly as the reference's consumers see poses one thread
        hop late.
        """
        info = {"state": self.state, "kf": False}
        if self.pipelined:
            while self._pending and (
                len(self._pending) >= max(1, self.pipeline_depth)
                or self.state != TrackingState.OK
            ):
                info = self._resolve_one()
                if self.state != TrackingState.OK:
                    break
        if self.state == TrackingState.NOT_INITIALIZED:
            if self.cfg.camera.bf > 0:
                ok = self.initialize_stereo(frame, timestamp)
            else:
                if not hasattr(self, "_mono_init") or self._mono_init is None:
                    from my_orb_slam2_tpu.models.mono_init import MonoInitializer

                    self._mono_init = MonoInitializer(self.cfg)
                ok = self._mono_init.try_initialize(self, frame, timestamp)
            info["initialized"] = ok
            self._log_pose(timestamp)
            self.frame_id += 1
            info["Tcw"] = self.Tcw.copy()
            info["state"] = self.state
            return info

        # --- fused device step: motion -> fallback -> local map -----------
        if self.state != TrackingState.OK:
            # LOST: relocalization (wired in by the System once the keyframe
            # database exists; standalone Tracker just fails).
            self._log_pose(timestamp)
            self.frame_id += 1
            info["Tcw"] = self.Tcw.copy()
            return info

        min_obs = 2 if self.n_kf <= 2 else 3
        has_vel = self._chain_prev is not None
        prev = self._chain_prev if has_vel else np.eye(4, dtype=np.float32)
        # Temporal VO anchors in the motion search: localization mode
        # (reference UpdateLastFrame, src/Tracking.cc:849-913) and, in
        # pipelined mode, ADAPTIVELY when the motion stage starves. The
        # reference creates a new keyframe's close stereo points IN the
        # tracking thread, instantly visible to the next frame
        # (src/Tracking.cc:1142-1226); pipelined dispatch defers that by
        # `pipeline_depth` frames, so under keyframe-per-frame cadence the
        # motion model can starve on the lagged map — the same coverage gap
        # localization mode's mbVO handles, with the same remedy. Anchors
        # stay OFF while map matches are plentiful (they anchor to the
        # previous pose and dilute the global map constraints — measured to
        # destabilize tracking when coverage is healthy), with hysteresis
        # in _resolve_one.
        loc_vo = (
            self.only_tracking or (self.pipelined and self._anchor_mode)
        ) and self.cfg.camera.bf > 0
        self.map, cur_mp, packed_dev, Tcw_dev = track_frame(
            self.cfg, self.map, frame,
            self.last_frame.uv, self.last_mp, self.last_frame.valid,
            self.last_frame.octave,
            self._chain_Tcw, prev, has_vel,
            np.int32(self.ref_kf), np.int32(min_obs),
            last_depth=self.last_frame.depth if loc_vo else None,
            last_desc=self.last_frame.desc if loc_vo else None,
            loc_mode=loc_vo,
        )
        # Chain the unresolved device pose into the next dispatch.
        self._chain_prev = self._chain_Tcw
        self._chain_Tcw = Tcw_dev
        self.last_frame = frame
        self.last_mp = cur_mp
        self._pending.append((frame, timestamp, self.frame_id, cur_mp, packed_dev))
        self.frame_id += 1
        if self.pipelined:
            try:
                packed_dev.copy_to_host_async()
            except Exception:
                pass
            info.setdefault("Tcw", self.Tcw.copy())
            info["state"] = self.state
            return info
        return self._resolve_one()

    def flush(self):
        """Resolve all in-flight frames (pipelined mode); call before
        reading trajectory/state that must reflect every tracked frame."""
        while self._pending and self.state == TrackingState.OK:
            self._resolve_one()
        # Leftovers can only remain when the state is no longer OK (e.g.
        # flush called while LOST — the lost/retry paths clear pending
        # themselves): still give each frame a trajectory row so exports
        # cover the whole sequence.
        for (_f2, ts2, fid2, _c2, _p2) in self._pending:
            self._log_pose(ts2, frame_id=fid2, lost_override=True)
        self._pending.clear()

    def _dispatch_retry(self, frame: FrameData, timestamp, fid) -> dict:
        """Re-dispatch a frame whose stale pipelined resolve failed the
        lost check, now against the post-epilogue (fresh) map, and resolve
        it synchronously. The pose chain was rebased on the last accepted
        pose (reset_motion), so the fused kernel's reference-keyframe
        fallback drives the search (no velocity prior survives a rebase)."""
        min_obs = 2 if self.n_kf <= 2 else 3
        # NOTE: the frame is tracked twice on device, so per-point
        # visible/found counters and the overflow counters accumulate twice
        # for this one frame (rare path; accepted drift vs the reference's
        # once-per-frame counts). The last-frame args below are dead:
        # has_velocity=False forces the reference-keyframe fallback, so the
        # (newest-dispatch) last_uv/last_mp are never used for matching — a
        # future change to the motion_ok gate must not resurrect them.
        self.map, cur_mp, packed_dev, Tcw_dev = track_frame(
            self.cfg, self.map, frame,
            self.last_frame.uv, self.last_mp, self.last_frame.valid,
            self.last_frame.octave,
            self._chain_Tcw, np.eye(4, dtype=np.float32), False,
            np.int32(self.ref_kf), np.int32(min_obs),
        )
        # No velocity prior survives a rebase: the frames between the last
        # accepted pose and this retry were dropped, so a one-frame
        # velocity from here would under-extrapolate by ~pipeline_depth
        # intervals. Leave the next dispatch on the ref-KF fallback
        # (consistent with reset_motion).
        self._chain_prev = None
        self._chain_Tcw = Tcw_dev
        self.last_frame = frame
        self.last_mp = cur_mp
        self._pending.append((frame, timestamp, fid, cur_mp, packed_dev))
        return self._resolve_one()

    def _resolve_one(self) -> dict:
        """Consume the oldest in-flight frame's readback and run the
        host-side epilogue (state transitions, pose chain, KF insertion)."""
        frame, ts, fid, cur_mp, packed_dev = self._pending.pop(0)
        at_head = not self._pending  # resolving the newest dispatch?
        info = {"state": self.state, "kf": False}
        packed = np.asarray(packed_dev)
        Tcw_res = packed[:16].reshape(4, 4)
        stats = packed[16:25]
        self._ref_pose_host = packed[25:41].reshape(4, 4)
        info["cap_overflow"] = int(packed[41])
        info["obs_overflow"] = int(packed[42])
        info["shed_work"] = int(packed[43])
        n_inliers = int(stats[0])
        stage1_inl = int(stats[6])
        info["motion_inliers" if stats[7] else "refkf_inliers"] = stage1_inl
        info["localmap_inliers"] = n_inliers
        # Anchor-mode hysteresis (see track()): engage when the motion
        # stage starves on the lagged map, release when MAP coverage
        # recovers — judged on map-only inliers (stats[8]); the anchors
        # inflate the raw stage-1 count by design, so gating on it would
        # release while the map is still starved and oscillate.
        if self.pipelined and not self.only_tracking:
            map_inl = int(stats[8])
            if map_inl < 40:
                self._anchor_mode = True
            elif map_inl > 80:
                self._anchor_mode = False
        recently_reloc = fid - self.last_reloc_frame_id < int(self.cfg.camera.fps)
        min_inl = (
            self.cfg.tracking.min_localmap_inliers_after_reloc
            if recently_reloc
            else self.cfg.tracking.min_localmap_inliers
        )
        lost_now = self._lost_check(stats, stage1_inl, n_inliers, min_inl, info)
        # Retry only applies outside localization mode: with only_tracking
        # no keyframes are inserted, so the "stale map" premise is absent
        # and _dispatch_retry's loc_mode=False dispatch would drop the
        # temporal-VO anchors loc-mode tracking relies on.
        if (
            lost_now and self.pipelined and not self._in_retry
            and not self.only_tracking
        ):
            # Stale-dispatch second chance: this frame was dispatched
            # against a map up to pipeline_depth keyframes old; the
            # intervening resolves have since inserted those keyframes and
            # spawned their points. The reference never fails on a stale
            # map (Tracking runs synchronously against the live one,
            # src/Tracking.cc:300-360), so before declaring LOST, re-track
            # the SAME frame once against the CURRENT map from the last
            # accepted pose (one synchronous dispatch — rare, so the RTT
            # doesn't affect steady-state throughput). Measured on the
            # KITTI-format driver E2E: the stale resolve dips to ~27
            # local-map inliers at a sharp feature-density drop while the
            # fresh-map retry holds >100 — without the retry the pipelined
            # driver goes LOST mid-sequence where the sync path survives.
            dropped = list(self._pending)
            self._pending.clear()
            self.reset_motion()
            self._in_retry = True
            try:
                info = self._dispatch_retry(frame, ts, fid)
            finally:
                self._in_retry = False
            # The cleared in-flight frames were chained off the rejected
            # pose and are never re-tracked: log them (as lost, at the
            # rebased pose) so every frame has a trajectory row — the
            # reference likewise records every frame, flagging untracked
            # ones (mlbLost, src/Tracking.cc:334-357).
            for (_f2, ts2, fid2, _c2, _p2) in dropped:
                self._log_pose(ts2, frame_id=fid2, lost_override=True)
            return info
        if lost_now:
            self.state = TrackingState.LOST
            # Lost soon after initialization: the map is unreliable — signal
            # a full system reset (reference src/Tracking.cc:519-527).
            if self.n_kf <= 5:
                self.needs_reset = True
            # Later in-flight frames chained off a lost pose: discard them
            # and rebase the dispatch chain on the last good resolved pose.
            dropped = list(self._pending)
            self._pending.clear()
            self.reset_motion()
            info["state"] = self.state
            self._log_pose(ts, frame_id=fid)
            for (_f2, ts2, fid2, _c2, _p2) in dropped:
                self._log_pose(ts2, frame_id=fid2, lost_override=True)
            info["Tcw"] = self.Tcw.copy()
            return info

        Tcw_new = Tcw_res.astype(np.float32)
        self.Tcw = Tcw_new  # velocity lives on device (see track_frame)
        self.ref_kf = int(stats[4])

        # --- keyframe decision --------------------------------------------
        if self._need_new_keyframe(stats, frame_id=fid):
            # Host mirror of the device slot counter (sequential, never
            # reused): avoids a device->host readback that would stall the
            # whole in-flight pipeline for a tunnel RTT per keyframe.
            kf_slot = self.n_kf
            # KF burst = the synchronous analog of the reference's non-empty
            # keyframe queue: the mapper sheds its optional passes under it
            # (reference src/LocalMapping.cc:86-102).
            kf_burst = (fid - self.last_kf_frame_id) <= 1 and self.kf_counter > 1
            self.map, kf_id = insert_keyframe_with_points(
                self.cfg, self.map, frame, Tcw_new, cur_mp,
                np.int32(fid), np.float32(ts),
                vocab_pack=self.vocab_pack, vocab_depth=self.vocab_depth,
            )
            self.n_kf = kf_slot + 1
            self.last_kf_frame_id = fid
            self.ref_kf = kf_slot
            self._ref_pose_host = Tcw_new  # new KF pose == that frame's pose
            self.kf_counter += 1
            info["kf"] = True
            if at_head:
                # No newer dispatch in flight: the KF's point assignments
                # (including freshly spawned stereo points) are aligned with
                # self.last_frame — mirror them for the next motion search.
                # (jitted: an eager row slice costs ~5 ms of device time
                # through the tunnel vs ~0 for the compiled program)
                self.last_mp = _row_i32(self.map.kf_mp, np.int32(kf_slot))
            if self.local_mapper is not None:
                self.map = self.local_mapper.process(
                    self.map, kf_slot, queue_pressure=kf_burst
                )

        self._log_pose(ts, frame_id=fid)
        info["Tcw"] = self.Tcw.copy()
        info["state"] = self.state
        return info

    def _lost_check(self, stats, stage1_inl, n_inliers, min_inl, info) -> bool:
        """Decide OK vs LOST from the packed stats (one place for both the
        sync and pipelined paths).

        In localization mode, temporal VO inliers count toward the
        local-map acceptance — in the reference the temporal points live in
        mvpMapPoints, so TrackLocalMap's mnMatchesInliers includes them
        (src/Tracking.cc:849-913,1013-1032) — and pure-VO frames (mbVO,
        <10 map matches) are accepted on raw motion inliers alone
        (src/Tracking.cc:962-973)."""
        if not self.only_tracking:
            return stage1_inl < 10 or n_inliers < min_inl
        n_map_s1 = int(stats[8])
        self.mb_vo = n_map_s1 < 10
        info["vo_mode"] = self.mb_vo
        if self.mb_vo:
            return stage1_inl < 20
        eff_inliers = n_inliers + max(0, stage1_inl - n_map_s1)
        return stage1_inl < 10 or eff_inliers < min_inl

    def _need_new_keyframe(self, stats, frame_id=None) -> bool:
        """Reference NeedNewKeyFrame conditions (src/Tracking.cc:1049-1140)."""
        if self.only_tracking:  # localization mode (src/Tracking.cc:1051)
            return False
        cfg = self.cfg
        n_inliers = int(stats[0])
        ref_matches = int(stats[1])
        tracked_close = int(stats[2])
        nontracked_close = int(stats[3])
        n_kfs = self.n_kf
        frames_since_kf = (
            frame_id if frame_id is not None else self.frame_id
        ) - self.last_kf_frame_id

        th_ref = 0.75 if cfg.camera.bf > 0 else 0.9
        if n_kfs <= 2:
            th_ref = 0.4
        need_close = tracked_close < 100 and nontracked_close > 70
        c1a = frames_since_kf >= cfg.tracking.max_frames_between_kf
        c1b = frames_since_kf >= cfg.tracking.min_frames_between_kf
        c1c = cfg.camera.bf > 0 and (n_inliers < ref_matches * 0.25 or need_close)
        c2 = (n_inliers < ref_matches * th_ref or need_close) and n_inliers > 15
        want = bool((c1a or c1b or c1c) and c2)
        if want and n_kfs >= self.cfg.capacity.max_keyframes:
            # Capacity refusal is a silent behavioral divergence from the
            # reference (which has no KF cap) — count it so drivers/benches
            # can surface map-saturation instead of it hiding as "no KF".
            self.kf_capacity_refusals += 1
            return False
        return want

    def _log_pose(self, timestamp: float, frame_id=None, lost_override=None):
        lost = (
            self.state != TrackingState.OK
            if lost_override is None
            else lost_override
        )
        T_ref = getattr(self, "_ref_pose_host", None)
        if T_ref is None:
            T_ref = self.Tcw  # first frames: ref == self
        T_rel = self.Tcw @ np.linalg.inv(T_ref)
        self.trajectory.append(
            (
                frame_id if frame_id is not None else self.frame_id,
                timestamp,
                self.ref_kf,
                T_rel.astype(np.float32),
                lost,
            )
        )

    def trajectory_poses(self) -> list:
        """Compose the relative log with the *current* keyframe poses
        (reference SaveTrajectoryTUM, src/System.cc:322-380). Returns
        [(frame_id, timestamp, Tcw (4,4) np, lost)]."""
        self.flush()  # resolve in-flight pipelined frames first
        kf_Tcw = np.asarray(self.map.kf_Tcw)
        out = []
        for fid, ts, ref, T_rel, lost in self.trajectory:
            out.append((fid, ts, T_rel @ kf_Tcw[ref], lost))
        return out

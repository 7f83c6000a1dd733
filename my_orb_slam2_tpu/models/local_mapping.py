"""Local mapping: keyframe-triggered map growth + refinement.

Replaces the reference LocalMapping thread (src/LocalMapping.cc) with a
sequence of jitted passes over the SoA map state, run after each keyframe
insertion:

1. `map_point_culling`    — reference MapPointCulling (src/LocalMapping.cc:201)
2. `create_new_map_points`— reference CreateNewMapPoints (:268): epipolar
   search against the top-K covisible neighbors, DLT triangulation,
   cheirality / reprojection-chi2 / scale-consistency gates
3. `fuse_neighbors`       — reference SearchInNeighbors (:530): two-way
   projection fuse with first+second-ring neighbors, MapPoint::Replace
   semantics via a replacement map
4. local bundle adjustment — reference Optimizer::LocalBundleAdjustment
   (src/Optimizer.cc:459) via ops/ba with a fixed-anchor window
5. `keyframe_culling`     — reference KeyFrameCulling (:708): redundant
   keyframes whose points are >=90% covered by >=3 other keyframes at the
   same or finer octave

All passes are static-shape; the host `LocalMapper.process` chains them.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from my_orb_slam2_tpu.models import map_state as ms
from my_orb_slam2_tpu.ops import ba, lie, matching
from my_orb_slam2_tpu.ops.projection import (
    fundamental_from_poses,
    parallax_cos,
    project,
    triangulate_dlt,
)
from my_orb_slam2_tpu.utils.config import SlamConfig

INVALID = -1


# ---------------------------------------------------------------------------
# 1. Map point culling
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def map_point_culling(cfg: SlamConfig, state: ms.MapState, kf_id):
    """Kill recently created points that are under-observed or rarely found
    (reference src/LocalMapping.cc:201-243):
      - found/visible ratio < 0.25
      - age >= 2 keyframes and observations <= threshold (2 mono, 3 stereo)
    Points older than 3 keyframes graduate and are never culled here.
    """
    age = kf_id - state.mp_first_kf  # in keyframe ids
    recent = (age >= 0) & (age <= 3) & state.mp_valid
    ratio = state.mp_found.astype(jnp.float32) / jnp.maximum(
        state.mp_visible.astype(jnp.float32), 1.0
    )
    th_obs = 2 if cfg.sensor.name == "MONOCULAR" else 3
    bad_ratio = recent & (ratio < cfg.mapping.min_found_ratio)
    bad_obs = recent & (age >= 2) & (state.mp_n_obs <= th_obs)
    return ms.erase_map_points(state, bad_ratio | bad_obs)


# ---------------------------------------------------------------------------
# 2. New map point creation (triangulation)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("cfg", "n_neighbors", "max_queries"),
    donate_argnames=("state",),
)
def create_new_map_points(
    cfg: SlamConfig, state: ms.MapState, kf_id, n_neighbors: int = 10,
    max_queries: int = 1024,
):
    """Triangulate new points between the new keyframe and its top covisible
    neighbors (reference src/LocalMapping.cc:268-528).

    For every unmatched keypoint of kf_id, the best epipolar-consistent match
    across all neighbors is kept (the reference's sequential first-wins over
    neighbors becomes a best-wins reduction), then triangulated and gated.

    Queries are COMPACTED to the <= max_queries keypoints without map points
    (the only ones the reference searches, src/ORBmatcher.cc:739), which
    shrinks every (queries x candidates) matrix ~2x AND makes it feasible to
    batch all neighbors in one vmap instead of a sequential lax.map — the
    per-step dispatch overhead of K sequential searches was the dominant
    cost of this pass at capacity. Queries beyond max_queries (the
    coarsest-octave slots, by extraction order) are shed this pass and
    counted in shed_work; raising the bound to cover them was measured to
    flood the map with duplicate far points (29k vs 5k live points, 4x
    worse ATE) — the bound doubles as the reference's natural rate limit
    that its direct-index matcher provides.
    """
    cam = cfg.camera
    KF, N = state.kf_mp.shape
    MP = state.mp_pos.shape[0]
    sf = cfg.orb.scale_factor
    sigma2 = jnp.asarray([sf ** (2 * l) for l in range(cfg.orb.n_levels)], jnp.float32)
    sf_tab = jnp.asarray([sf ** l for l in range(cfg.orb.n_levels)], jnp.float32)

    neigh_ids, neigh_w = ms.best_covisible(state, kf_id, n_neighbors)

    T1 = state.kf_Tcw[kf_id]
    O1w = -(T1[:3, :3].T @ T1[:3, 3])

    # --- compact the query side: valid kps of kf_id without a map point ---
    Q = min(max_queries, N)
    q_cand = state.kf_kp_valid[kf_id] & (state.kf_mp[kf_id] < 0)
    n_q = jnp.sum(q_cand, dtype=jnp.int32)
    state = state._replace(
        shed_work=state.shed_work + jnp.maximum(n_q - Q, 0)
    )
    q_slot = jnp.nonzero(q_cand, size=Q, fill_value=N)[0]  # (Q,)
    q_ok = q_slot < N
    qs = jnp.clip(q_slot, 0, N - 1)
    uv1 = state.kf_uv[kf_id][qs]
    oct1 = state.kf_octave[kf_id][qs]
    ur1 = state.kf_ur[kf_id][qs]
    depth1 = state.kf_depth[kf_id][qs]
    desc1 = state.kf_desc[kf_id][qs]
    angle1 = state.kf_angle[kf_id][qs]
    words1 = state.kf_words[kf_id][qs]
    valid1 = q_ok
    bucket_div = cfg.matcher.bow_gate_div

    def per_neighbor(nid, ok_n):
        T2 = state.kf_Tcw[nid]
        O2w = -(T2[:3, :3].T @ T2[:3, 3])
        baseline = jnp.linalg.norm(O2w - O1w)
        # Baseline gate (reference src/LocalMapping.cc:307-327): stereo
        # requires baseline > camera baseline; mono requires ratio to median
        # scene depth > 0.01.
        if cfg.sensor.name == "MONOCULAR":
            d2 = state.kf_depth[nid]
            v2 = state.kf_kp_valid[nid]
            # median scene depth of neighbor via its observed points
            mp2 = state.kf_mp[nid]
            pos2 = jnp.take(state.mp_pos, jnp.clip(mp2, 0, MP - 1), axis=0)
            pc2 = lie.se3_apply(T2, pos2)
            zvals = jnp.where((mp2 >= 0) & v2, pc2[:, 2], jnp.nan)
            med = jnp.nanmedian(zvals)
            base_ok = baseline / jnp.maximum(med, 1e-6) > 0.01
        else:
            base_ok = baseline > cam.baseline
        F12 = fundamental_from_poses(T1, T2, cam.fx, cam.fy, cam.cx, cam.cy)
        # Epipole of camera 1 in image 2.
        e_uv, e_z = project(T2, O1w[None, :], cam.fx, cam.fy, cam.cx, cam.cy)
        idx2, ok, dist = matching.search_for_triangulation(
            uv1,
            valid1,
            jnp.zeros((Q,), bool),  # queries are mp-free by construction
            desc1,
            angle1,
            ur1,
            state.kf_uv[nid],
            state.kf_octave[nid],
            state.kf_kp_valid[nid],
            state.kf_mp[nid] >= 0,
            state.kf_desc[nid],
            state.kf_angle[nid],
            state.kf_ur[nid],
            F12,
            e_uv[0],
            jnp.take(sigma2, state.kf_octave[nid]),
            words1=words1,
            words2=state.kf_words[nid],
            bucket_div=bucket_div,
        )
        ok = ok & ok_n & base_ok
        return idx2, ok, jnp.where(ok, dist, 1e9)

    # All neighbors in one batch: with Q-compacted queries the (K, Q, N)
    # workspace fits comfortably (the old N x N formulation needed GBs,
    # forcing a sequential lax.map whose per-step dispatch overhead
    # dominated the pass).
    idx2_all, ok_all, dist_all = jax.vmap(per_neighbor)(
        jnp.maximum(neigh_ids, 0), neigh_ids >= 0
    )  # (K, Q)

    # Best neighbor per query.
    best_n = jnp.argmin(dist_all, axis=0)  # (Q,)
    sel = jnp.take_along_axis(ok_all, best_n[None, :], axis=0)[0]
    sel_idx2 = jnp.take_along_axis(idx2_all, best_n[None, :], axis=0)[0]
    nid = jnp.take(jnp.maximum(neigh_ids, 0), best_n)  # (Q,)

    # --- triangulate each selected pair -----------------------------------
    T2s = state.kf_Tcw[nid]  # (Q, 4, 4)
    uv2 = jnp.take_along_axis(
        state.kf_uv[nid], sel_idx2[:, None, None].repeat(2, -1), axis=1
    )[:, 0, :]
    oct2 = jnp.take_along_axis(state.kf_octave[nid], sel_idx2[:, None], axis=1)[:, 0]
    ur2 = jnp.take_along_axis(state.kf_ur[nid], sel_idx2[:, None], axis=1)[:, 0]
    depth2 = jnp.take_along_axis(state.kf_depth[nid], sel_idx2[:, None], axis=1)[:, 0]

    # Ray parallax between the two observations (reference :358-394).
    def ray_cos(T, uv):
        x = (uv[:, 0] - cam.cx) / cam.fx
        y = (uv[:, 1] - cam.cy) / cam.fy
        r_cam = jnp.stack([x, y, jnp.ones_like(x)], axis=1)
        return r_cam @ T[:3, :3]  # == R^T ray -> world

    r1 = (lambda uv: jnp.stack([(uv[:, 0] - cam.cx) / cam.fx, (uv[:, 1] - cam.cy) / cam.fy, jnp.ones_like(uv[:, 0])], 1))(uv1)
    r1w = r1 @ T1[:3, :3]  # (N, 3) world rays
    x2 = (uv2[:, 0] - cam.cx) / cam.fx
    y2 = (uv2[:, 1] - cam.cy) / cam.fy
    r2 = jnp.stack([x2, y2, jnp.ones_like(x2)], axis=1)
    r2w = jnp.einsum("ni,nij->nj", r2, T2s[:, :3, :3])
    cos_rays = jnp.sum(r1w * r2w, axis=1) / jnp.maximum(
        jnp.linalg.norm(r1w, axis=1) * jnp.linalg.norm(r2w, axis=1), 1e-9
    )
    # Stereo parallax comparison (reference cosParallaxStereo).
    cos_stereo1 = jnp.where(
        depth1 > 0, jnp.cos(2.0 * jnp.arctan2(cam.baseline / 2.0, depth1)), 1.1
    )
    cos_stereo2 = jnp.where(
        depth2 > 0, jnp.cos(2.0 * jnp.arctan2(cam.baseline / 2.0, depth2)), 1.1
    )
    cos_stereo = jnp.minimum(cos_stereo1, cos_stereo2)

    # Triangulate by DLT (batched over slots).
    def tri_one(T2_i, uv1_i, uv2_i):
        X, okw = triangulate_dlt(T1, T2_i, uv1_i, uv2_i, cam.fx, cam.fy, cam.cx, cam.cy)
        return X, okw

    X_dlt, okw = jax.vmap(tri_one)(T2s, uv1, uv2)
    # Stereo unproject alternatives.
    from my_orb_slam2_tpu.ops.projection import backproject

    X_st1 = lie.se3_apply(lie.se3_inverse(T1), backproject(uv1, depth1, cam.fx, cam.fy, cam.cx, cam.cy))
    Twc2 = jax.vmap(lie.se3_inverse)(T2s)
    X_st2_c = backproject(uv2, depth2, cam.fx, cam.fy, cam.cx, cam.cy)
    X_st2 = jnp.einsum("nij,nj->ni", Twc2[:, :3, :3], X_st2_c) + Twc2[:, :3, 3]

    good_par = (cos_rays < 0.9998) & (cos_rays > 0) & (cos_rays < cos_stereo)
    use_st1 = ~good_par & (depth1 > 0) & (cos_stereo1 < cos_stereo2)
    use_st2 = ~good_par & ~use_st1 & (depth2 > 0)
    X = jnp.where(
        good_par[:, None], X_dlt, jnp.where(use_st1[:, None], X_st1, X_st2)
    )
    usable = sel & (good_par & okw | use_st1 | use_st2)

    # --- acceptance gates (cheirality, chi2 both views, scale ratio) ------
    def gate(T, uv, ur, oct_, X):
        pc = lie.se3_apply(T, X)
        z = pc[:, 2]
        iz = 1.0 / jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
        u = cam.fx * pc[:, 0] * iz + cam.cx
        v = cam.fy * pc[:, 1] * iz + cam.cy
        urp = u - cam.bf * iz
        s2 = jnp.take(sigma2, oct_)
        e_mono = ((u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2) / s2
        e_st = e_mono + (urp - ur) ** 2 / s2
        is_st = ur >= 0
        chi_ok = jnp.where(is_st, e_st < 7.8, e_mono < 5.991)
        return (z > 0) & chi_ok, pc

    ok1, pc1 = gate(T1, uv1, ur1, oct1, X)
    def gate2(T2_i, uv2_i, ur2_i, oct2_i, X_i):
        pc = T2_i[:3, :3] @ X_i + T2_i[:3, 3]
        z = pc[2]
        iz = 1.0 / jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
        u = cam.fx * pc[0] * iz + cam.cx
        v = cam.fy * pc[1] * iz + cam.cy
        urp = u - cam.bf * iz
        s2 = jnp.take(sigma2, oct2_i)
        e_mono = ((u - uv2_i[0]) ** 2 + (v - uv2_i[1]) ** 2) / s2
        e_st = e_mono + (urp - ur2_i) ** 2 / s2
        chi_ok = jnp.where(ur2_i >= 0, e_st < 7.8, e_mono < 5.991)
        return (z > 0) & chi_ok

    ok2 = jax.vmap(gate2)(T2s, uv2, ur2, oct2, X)

    # Scale consistency (reference :491-507): distance ratio vs octave ratio.
    d1 = jnp.linalg.norm(X - O1w, axis=1)
    O2s = -jnp.einsum("nij,ni->nj", T2s[:, :3, :3], T2s[:, :3, 3])
    d2 = jnp.linalg.norm(X - O2s, axis=1)
    ratio_dist = d2 / jnp.maximum(d1, 1e-9)
    ratio_oct = jnp.take(sf_tab, oct1) / jnp.take(sf_tab, oct2)
    ratio_factor = 1.5 * sf
    scale_ok = (ratio_dist * ratio_factor > ratio_oct) & (
        ratio_dist < ratio_oct * ratio_factor
    )

    # Stereo-depth consistency: when a view carries a stereo measurement,
    # the triangulated depth must agree with it within 3 sigma of the
    # stereo depth uncertainty (sigma_z = z^2 / bf * sigma_px). Epipolar-
    # aliased WRONG matches triangulate to arbitrary depths yet reproject
    # perfectly in both views (any two rays' intersection does), so the
    # chi2 gates cannot catch them — the independent stereo depth can.
    # (The reference gets a weaker form of this by preferring stereo
    # unprojection at low ray parallax, src/LocalMapping.cc:382-425; with
    # ~10% of observations landing on aliased points beyond the scene's
    # physical extent, the explicit test is the TPU build's answer.)
    def stereo_consistent(z_tri, depth_meas, oct_):
        sig_z = depth_meas * depth_meas / cam.bf * jnp.sqrt(jnp.take(sigma2, oct_))
        return jnp.abs(z_tri - depth_meas) <= 3.0 * sig_z

    st_ok1 = jnp.where(
        depth1 > 0, stereo_consistent(pc1[:, 2], depth1, oct1), True
    )
    pc2_z = jnp.einsum("nj,nj->n", T2s[:, 2, :3], X) + T2s[:, 2, 3]
    st_ok2 = jnp.where(
        depth2 > 0, stereo_consistent(pc2_z, depth2, oct2), True
    )
    want = (
        usable & ok1 & ok2 & scale_ok & st_ok1 & st_ok2
        & (d1 > 1e-6) & (d2 > 1e-6)
    )

    # --- allocate + wire into both keyframes ------------------------------
    normal = (X - O1w) / jnp.maximum(d1[:, None], 1e-9)
    max_dist = d1 * jnp.take(sf_tab, oct1)
    min_dist = max_dist / (sf ** (cfg.orb.n_levels - 1))
    state, slots, okalloc = ms.add_map_points(
        state,
        X,
        desc1,
        normal,
        min_dist,
        max_dist,
        jnp.full((Q,), kf_id, jnp.int32),
        want,
    )
    wired = want & okalloc
    # kf_id row: query slot -> new point (scatter back to original slots).
    row1 = state.kf_mp[kf_id].at[jnp.where(wired, qs, N)].set(
        jnp.where(wired, slots, INVALID), mode="drop"
    )
    state = state._replace(kf_mp=state.kf_mp.at[kf_id].set(row1))
    # neighbor rows: scatter (nid, sel_idx2) -> slot. Collisions: keep min
    # slot id (arbitrary but deterministic).
    flat_idx = nid * N + sel_idx2
    kf_mp_flat = state.kf_mp.reshape(-1)
    cur = jnp.take(kf_mp_flat, flat_idx)
    can_wire = wired & (cur < 0)
    kf_mp_flat = kf_mp_flat.at[jnp.where(can_wire, flat_idx, 0)].max(
        jnp.where(can_wire, slots, -1)
    )
    state = state._replace(kf_mp=kf_mp_flat.reshape(KF, N))
    # observation counts
    inc1 = jnp.where(ur1 >= 0, 2, 1)
    inc2 = jnp.where(ur2 >= 0, 2, 1)
    obs_add = jnp.zeros((MP + 1,), jnp.int32)
    obs_add = obs_add.at[jnp.where(wired, slots, MP)].add(inc1)
    obs_add = obs_add.at[jnp.where(can_wire, slots, MP)].add(inc2)
    state = state._replace(mp_n_obs=state.mp_n_obs + obs_add[:MP])
    # Inverted-index rows for the new points: entry 0 = (kf_id, query slot),
    # entry 1 = the neighbor observation when its row slot was free.
    K = state.mp_obs_kf.shape[1]
    e_kf = jnp.full((Q, K), INVALID, jnp.int32)
    e_slot = jnp.full((Q, K), INVALID, jnp.int32)
    e_kf = e_kf.at[:, 0].set(jnp.where(wired, kf_id, INVALID))
    e_slot = e_slot.at[:, 0].set(jnp.where(wired, qs, INVALID))
    e_kf = e_kf.at[:, 1].set(jnp.where(can_wire, nid, INVALID))
    e_slot = e_slot.at[:, 1].set(jnp.where(can_wire, sel_idx2, INVALID))
    tgt = jnp.where(wired, slots, MP)
    state = state._replace(
        mp_obs_kf=state.mp_obs_kf.at[tgt].set(e_kf, mode="drop"),
        mp_obs_slot=state.mp_obs_slot.at[tgt].set(e_slot, mode="drop"),
    )
    return state, jnp.sum(wired)


# ---------------------------------------------------------------------------
# 3. Fuse with neighbors
# ---------------------------------------------------------------------------


def fuse_neighbors(
    cfg: SlamConfig, state: ms.MapState, kf_id, n_targets: int = 20,
    max_cand_b: int = 4096, refresh_derived: bool = True,
):
    """Two-way projection fuse between the new keyframe and its covisibility
    neighborhood (reference SearchInNeighbors src/LocalMapping.cc:530-610 +
    ORBmatcher::Fuse src/ORBmatcher.cc:879-1029).

    Direction A: project kf_id's map points into each target keyframe;
    Direction B: project each target's points into kf_id. A match against a
    keypoint that already observes a different point triggers
    MapPoint::Replace semantics (keep the point with more observations);
    a match against a free keypoint adds the observation.

    Candidate compaction keeps the quadratic search small at dataset-scale
    capacity: direction A's candidates are exactly the new KF's <=N points
    (no MP-wide rows), direction B's are the frustum-gated union of the
    targets' points compacted to `max_cand_b`.

    Three ASYNC DISPATCHES (direction A / direction B / replacement
    epilogue) rather than one fused program — long programs pessimize
    per-op performance on the target chip (see full_pass docstring).
    """
    kf_id = jnp.int32(kf_id)
    state, replace_map, tgt_ids, src_mask = _fuse_dir_a(
        cfg, state, kf_id, n_targets
    )
    state, replace_map, tgt_mask_rows = _fuse_dir_b(
        cfg, state, kf_id, tgt_ids, replace_map, max_cand_b
    )
    state = _fuse_epilogue(
        cfg, state, kf_id, replace_map, tgt_ids, src_mask, tgt_mask_rows,
        refresh_derived, max_cand_b,
    )
    return state, tgt_ids


def _fuse_search(cfg, state, cand_ids, cand_ok, tkf):
    """Project candidate points (compacted ids) into keyframe tkf;
    return (matched_kp_slot, accept) aligned with the candidates,
    under the reference Fuse gates."""
    cam = cfg.camera
    sf = cfg.orb.scale_factor
    sf_tab = jnp.asarray([sf ** l for l in range(cfg.orb.n_levels)], jnp.float32)
    log_sf = float(np.log(sf))
    from my_orb_slam2_tpu.ops.projection import frustum_check, predict_scale

    pos = jnp.take(state.mp_pos, cand_ids, axis=0)
    nrm = jnp.take(state.mp_normal, cand_ids, axis=0)
    dmin = jnp.take(state.mp_min_dist, cand_ids)
    dmax = jnp.take(state.mp_max_dist, cand_ids)
    desc = jnp.take(state.mp_desc, cand_ids, axis=0)
    T = state.kf_Tcw[tkf]
    okf, uvp, zp, distp, vcos = frustum_check(
        T, pos, nrm, dmin * 0.8, dmax * 1.2,
        cam.fx, cam.fy, cam.cx, cam.cy, 0.0, float(cam.width), 0.0, float(cam.height),
    )
    pred_lvl = predict_scale(distp, dmax * 1.2, log_sf, cfg.orb.n_levels)
    radius = 3.0 * jnp.take(sf_tab, pred_lvl)
    urp = uvp[:, 0] - cam.bf / jnp.where(zp > 1e-6, zp, 1e9)
    idx, ok, dist = matching.search_by_projection(
        uvp,
        pred_lvl,
        cand_ok & okf,
        desc,
        radius,
        state.kf_uv[tkf],
        state.kf_octave[tkf],
        state.kf_kp_valid[tkf],
        state.kf_desc[tkf],
        kp_ur=state.kf_ur[tkf],
        pred_ur=urp,
        level_lo=pred_lvl - 1,
        level_hi=pred_lvl + 1,
        max_dist=float(cfg.matcher.th_low),
        ratio=1.0,
    )
    return idx, ok


@functools.partial(
    jax.jit, static_argnames=("cfg", "n_targets"), donate_argnames=("state",)
)
def _fuse_dir_a(cfg: SlamConfig, state: ms.MapState, kf_id, n_targets: int):
    KF, N = state.kf_mp.shape
    MP = state.mp_pos.shape[0]
    # First ring (top-10) + implicit second ring approximated by top-20.
    tgt_ids, tgt_w = ms.best_covisible(state, kf_id, n_targets)

    replace_map = jnp.arange(MP, dtype=jnp.int32)  # loser -> winner
    # Direction A: kf_id's points into ALL targets in one batched pass.
    # The old formulation scanned targets sequentially (obs updates chained
    # through the carry) — ~25 dispatched kernels per target x 20 targets
    # dominated the fused mapper pass at capacity. Here every target's
    # search runs under one vmap and the index/count updates collapse into
    # a single ranked multi-append (a point may gain one observation per
    # target; entries are grouped by point and inserted at count+rank).
    row_pid = jnp.where(state.kf_mp[kf_id] >= 0, state.kf_mp[kf_id], 0)  # (N,)
    row_ok = (
        (state.kf_mp[kf_id] >= 0)
        & state.kf_kp_valid[kf_id]
        & jnp.take(state.mp_valid, row_pid)
    )
    src_mask = jnp.zeros((MP,), bool).at[row_pid].set(row_ok)
    # Compact the source candidates: a keyframe tracks far fewer points
    # than its N keypoint slots at capacity (~500-900 of 2048), and every
    # per-target search matrix scales with this axis. Overflow is shed and
    # retried on later passes (counted).
    CA = min(1024, N)
    sel = jnp.nonzero(row_ok, size=CA, fill_value=N)[0]  # (CA,) slot ids
    candA_ok = sel < N
    selc = jnp.clip(sel, 0, N - 1)
    candA = jnp.take(row_pid, selc)  # (CA,) point ids
    n_src = jnp.sum(row_ok, dtype=jnp.int32)
    state = state._replace(
        shed_work=state.shed_work + jnp.maximum(n_src - CA, 0)
    )

    # Compact the candidate points' index rows once so the multi-append's
    # count+rank insert positions are exact.
    obs_kf0, obs_slot0 = ms.obs_compact_rows(
        state.mp_obs_kf, state.mp_obs_slot, jnp.where(candA_ok, candA, MP),
        candA_ok,
    )
    state = state._replace(mp_obs_kf=obs_kf0, mp_obs_slot=obs_slot0)
    rowsA = obs_kf0[candA]  # (N, K)
    cntA = jnp.sum(rowsA >= 0, axis=1).astype(jnp.int32)  # (N,)

    def dir_a_search(t):
        tkf = jnp.maximum(tgt_ids[t], 0)
        ok_t = tgt_ids[t] >= 0
        # Skip candidates the target already observes (reference Fuse:
        # pMP->IsInKeyFrame(pKF) -> continue, src/ORBmatcher.cc:901).
        already_in = jnp.any(rowsA == tkf, axis=1)
        idx, ok = _fuse_search(cfg, state, candA, candA_ok & ok_t & ~already_in, tkf)
        return idx, ok & ok_t & ~already_in

    idxA, okA = jax.vmap(dir_a_search)(jnp.arange(n_targets))  # (T, N)

    # --- batched update phase --------------------------------------------
    T = n_targets
    tkf_e = jnp.broadcast_to(jnp.maximum(tgt_ids, 0)[:, None], (T, CA))
    pid_e = jnp.broadcast_to(candA[None, :], (T, CA))
    existing = state.kf_mp[tkf_e, idxA]  # (T, CA)
    add = okA & (existing < 0)
    inc_e = jnp.where(state.kf_ur[tkf_e, idxA] >= 0, 2, 1)
    cnt_e = jnp.broadcast_to(cntA[None, :], (T, CA))
    # Observation budget: fuse never fills a point's observer row past
    # K-4 — a 28+-observer point is fully constrained (descriptor median,
    # culling counts and BA all saturate long before that), and without
    # the headroom every later fuse pass re-attempts the same adds into
    # full rows, inflating obs_overflow with re-counted non-losses
    # (measured 16k over a 1,400-frame circuit) and leaving no room for
    # the semantically critical tracking observations at keyframe
    # insertion. Declined adds are budget policy, counted as shed work.
    K_OBS = state.mp_obs_kf.shape[1]
    budget_ok = cnt_e < (K_OBS - 4)
    shed_budget = jnp.sum(add & ~budget_ok, dtype=jnp.int32)
    add = add & budget_ok
    obs_kf, obs_slot, did_f, n_over = ms.obs_add_pairs_multi(
        state.mp_obs_kf, state.mp_obs_slot,
        jnp.where(add, pid_e, INVALID).reshape(-1),
        tkf_e.reshape(-1), idxA.reshape(-1), add.reshape(-1),
        cnt_e.reshape(-1),
    )
    did = did_f.reshape(T, CA)
    # kf_mp rows: matched keypoints are unique per target (one_to_one in
    # the search), so a flat scatter is collision-free.
    kf_mp = state.kf_mp.at[
        jnp.where(did, tkf_e, KF), jnp.where(did, idxA, 0)
    ].set(jnp.where(did, pid_e, INVALID), mode="drop")
    mp_n_obs = state.mp_n_obs.at[jnp.where(did, pid_e, MP).reshape(-1)].add(
        jnp.where(did, inc_e, 0).reshape(-1), mode="drop"
    )
    # Conflicts: keypoint already bound to a different point -> Replace,
    # keeping the point with more (pre-pass) observations. Duplicate losers
    # across targets resolve to the max-id winner (deterministic; the
    # reference's sequential pass keeps the last writer).
    conflict = okA & (existing >= 0) & (existing != pid_e)
    ex = jnp.where(conflict, existing, 0)
    keep_existing = jnp.take(state.mp_n_obs, ex) >= jnp.take(
        state.mp_n_obs, jnp.where(conflict, pid_e, 0)
    )
    loser = jnp.where(keep_existing, pid_e, ex)
    winner = jnp.where(keep_existing, ex, pid_e)
    upd = conflict & (loser != winner)
    win_of = jnp.full((MP,), -1, jnp.int32).at[
        jnp.where(upd, loser, 0).reshape(-1)
    ].max(jnp.where(upd, winner, -1).reshape(-1))
    replace_map = jnp.where(win_of >= 0, win_of, replace_map)
    state = state._replace(
        kf_mp=kf_mp, mp_n_obs=mp_n_obs,
        mp_obs_kf=obs_kf, mp_obs_slot=obs_slot,
        obs_overflow=state.obs_overflow + n_over,
        shed_work=state.shed_work + shed_budget,
    )
    return state, replace_map, tgt_ids, src_mask


@functools.partial(
    jax.jit, static_argnames=("cfg", "max_cand_b"), donate_argnames=("state",)
)
def _fuse_dir_b(
    cfg: SlamConfig, state: ms.MapState, kf_id, tgt_ids, replace_map,
    max_cand_b: int,
):
    """Direction B: targets' points into kf_id (single pass, union of the
    target rows dedup'd through an MP mask, frustum-gated against kf_id,
    then compacted to max_cand_b ids)."""
    cam = cfg.camera
    KF, N = state.kf_mp.shape
    MP = state.mp_pos.shape[0]
    from my_orb_slam2_tpu.ops.projection import frustum_check

    tgt_ok = tgt_ids >= 0
    tgt_rows = jnp.take(state.kf_mp, jnp.maximum(tgt_ids, 0), axis=0)  # (T, N)
    tvalid = tgt_ok[:, None] & (tgt_rows >= 0)
    tgt_mask_rows = jnp.zeros((MP,), bool).at[
        jnp.where(tvalid, tgt_rows, 0).reshape(-1)
    ].set(tvalid.reshape(-1))
    tgt_mask_rows = tgt_mask_rows & state.mp_valid
    okf_all, _, _, _, _ = frustum_check(
        state.kf_Tcw[kf_id], state.mp_pos, state.mp_normal,
        state.mp_min_dist * 0.8, state.mp_max_dist * 1.2,
        cam.fx, cam.fy, cam.cx, cam.cy, 0.0, float(cam.width), 0.0, float(cam.height),
    )
    in_view = tgt_mask_rows & okf_all
    state = state._replace(
        shed_work=state.shed_work
        + jnp.maximum(jnp.sum(in_view, dtype=jnp.int32) - max_cand_b, 0)
    )
    candB = jnp.nonzero(in_view, size=min(max_cand_b, MP), fill_value=MP)[0]
    candB_ok = candB < MP
    candB = jnp.clip(candB, 0, MP - 1)
    # Skip points kf_id already observes (reference Fuse IsInKeyFrame gate).
    rowsB = state.mp_obs_kf[candB]
    candB_ok = candB_ok & ~jnp.any(rowsB == kf_id, axis=1)
    idx, ok = _fuse_search(cfg, state, candB, candB_ok, kf_id)
    existing = jnp.take(state.kf_mp[kf_id], idx)
    pid = candB
    add = ok & (existing < 0)
    # Same observation budget as direction A (see _fuse_dir_a).
    K_OBS = state.mp_obs_kf.shape[1]
    cntB = jnp.sum(rowsB >= 0, axis=1)
    shed_budget = jnp.sum(add & (cntB >= K_OBS - 4), dtype=jnp.int32)
    add = add & (cntB < K_OBS - 4)
    obs_kf, obs_slot, did, novB = ms.obs_add_pairs(
        state.mp_obs_kf, state.mp_obs_slot, jnp.where(add, pid, INVALID),
        jnp.full(pid.shape, 0, jnp.int32) + kf_id, idx, add,
    )
    row = state.kf_mp[kf_id]
    row = row.at[jnp.where(did, idx, N)].set(
        jnp.where(did, pid, INVALID), mode="drop"
    )
    inc = jnp.where(jnp.take(state.kf_ur[kf_id], idx) >= 0, 2, 1)
    n_obs = state.mp_n_obs.at[jnp.where(did, pid, MP)].add(
        jnp.where(did, inc, 0), mode="drop"
    )
    conflict = ok & (existing >= 0) & (existing != pid)
    ex = jnp.where(conflict, existing, 0)
    keep_existing = jnp.take(n_obs, ex) >= jnp.take(n_obs, jnp.where(conflict, pid, 0))
    loser = jnp.where(keep_existing, pid, ex)
    winner = jnp.where(keep_existing, ex, pid)
    upd = conflict & (loser != winner)
    replace_map = replace_map.at[jnp.where(upd, loser, 0)].set(
        jnp.where(upd, winner, replace_map[0])
    )
    state = state._replace(
        kf_mp=state.kf_mp.at[kf_id].set(row), mp_n_obs=n_obs,
        mp_obs_kf=obs_kf, mp_obs_slot=obs_slot,
        obs_overflow=state.obs_overflow + novB,
        shed_work=state.shed_work + shed_budget,
    )
    return state, replace_map, tgt_mask_rows


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "refresh_derived", "max_cand_b"),
    donate_argnames=("state",),
)
def _fuse_epilogue(
    cfg: SlamConfig, state: ms.MapState, kf_id, replace_map, tgt_ids,
    src_mask, tgt_mask_rows, refresh_derived: bool, max_cand_b: int,
):
    KF, N = state.kf_mp.shape
    MP = state.mp_pos.shape[0]
    # --- apply replacements globally (MapPoint::Replace) ------------------
    # Resolve replacement CHAINS (A->B set by one target, B->C by a later
    # one) by path-halving composition — an un-resolved chain would leave
    # observations pointing at an invalidated intermediate. 2-cycles
    # (A<->B, possible from tie-breaking across targets) self-collapse to
    # identity, leaving both points valid.
    for _ in range(3):
        replace_map = jnp.take(replace_map, replace_map)
    replaced = replace_map != jnp.arange(MP)

    def do_replace(state):
        st = state._replace(
            mp_found=state.mp_found
            + jnp.zeros((MP,), jnp.int32).at[
                jnp.where(replaced, replace_map, 0)
            ].add(jnp.where(replaced, state.mp_found, 0)),
            mp_visible=state.mp_visible
            + jnp.zeros((MP,), jnp.int32).at[
                jnp.where(replaced, replace_map, 0)
            ].add(jnp.where(replaced, state.mp_visible, 0)),
        )
        return _apply_replacements(st, replace_map, replaced)

    # Most fuse passes produce ZERO replacements — skip the whole counter
    # merge + sorted migration machinery (its sorts and (L, K) row surgery
    # cost ~20 ms at capacity) on the device via cond.
    state = jax.lax.cond(jnp.any(replaced), do_replace, lambda st: st, state)
    # Covisibility rows of the touched KFs (loop detection depends on
    # these). When local BA follows (refresh_derived=False), only the new
    # keyframe's row is refreshed here — the BA window selection needs it —
    # and the targets ride along in the writeback's single refresh instead
    # of paying a second 21-row pass.
    if refresh_derived:
        upd_kfs = jnp.concatenate([jnp.array([kf_id], jnp.int32), tgt_ids])
        state = ms.refresh_covisibility(state, upd_kfs)
        # point geometry (normals + scale rings) — skipped when local BA's
        # writeback immediately follows: BA moves the points, so it must
        # recompute geometry anyway; doing it here too would double the
        # epilogue passes
        touched = (src_mask | tgt_mask_rows) & state.mp_valid
        state = ms.update_point_geometry(
            state, touched, cfg.orb.scale_factor, cfg.orb.n_levels,
            max_touched=max_cand_b + N,
        )
    else:
        state = ms.refresh_covisibility(state, jnp.array([kf_id], jnp.int32))
    return state


def _apply_replacements(state, replace_map, replaced, max_losers: int = 1024):
    """MapPoint::Replace over the inverted index (reference
    src/MapPoint.cc:Replace): migrate every loser observation to its winner,
    EXCEPT where the winner already observes that keyframe — there the
    keypoint match is erased instead (reference EraseMapPointMatch branch).
    O(losers x K), entry-exact on both index directions.

    replace_map must be chain-resolved (loser -> final winner, winners map
    to themselves)."""
    MP = replace_map.shape[0]
    KF, N = state.kf_mp.shape
    K = state.mp_obs_kf.shape[1]
    # Typical fuse passes produce tens of replacements; losers beyond the
    # static cap stay un-merged (valid duplicates) and are counted.
    n_replaced = jnp.sum(replaced, dtype=jnp.int32)
    state = state._replace(
        shed_work=state.shed_work
        + jnp.maximum(n_replaced - min(max_losers, MP), 0)
    )
    lids = jnp.nonzero(replaced, size=min(max_losers, MP), fill_value=MP)[0]
    l_ok = lids < MP
    lc = jnp.clip(lids, 0, MP - 1)
    win = jnp.take(replace_map, lc)  # (L,) final winners (never losers)
    win_c = jnp.clip(win, 0, MP - 1)
    L = lids.shape[0]

    obs_kf, obs_slot = state.mp_obs_kf, state.mp_obs_slot
    # Compact winner rows so (entry count) == (first free position).
    obs_kf, obs_slot = ms.obs_compact_rows(obs_kf, obs_slot, win, l_ok)

    # Capture loser entries, then clear loser rows.
    E_kf = obs_kf[lc]  # (L, K)
    E_slot = obs_slot[lc]
    e_ok = l_ok[:, None] & (E_kf >= 0)
    empty = jnp.full((L, K), INVALID, jnp.int32)
    obs_kf = obs_kf.at[jnp.where(l_ok, lids, MP)].set(empty, mode="drop")
    obs_slot = obs_slot.at[jnp.where(l_ok, lids, MP)].set(empty, mode="drop")

    # Winner already observes this keyframe -> erase the keypoint match.
    W_kf = obs_kf[win_c]  # (L, K)
    dup_exist = jnp.any(
        E_kf[:, :, None] == jnp.where(W_kf >= 0, W_kf, -2)[:, None, :], axis=2
    )
    erase = e_ok & dup_exist
    kf_mp = state.kf_mp.at[
        jnp.where(erase, E_kf, KF), jnp.where(erase, E_slot, 0)
    ].set(INVALID, mode="drop")

    # Candidate migrations, deduped per (winner, keyframe): two losers may
    # both have observed the same keyframe — only one survives; the other's
    # keypoint match is erased.
    cand = (e_ok & ~dup_exist).reshape(-1)  # (L*K,)
    f_w = jnp.broadcast_to(win[:, None], (L, K)).reshape(-1)
    f_kf = E_kf.reshape(-1)
    f_slot = E_slot.reshape(-1)
    f_w_m = jnp.where(cand, f_w, MP)
    f_kf_m = jnp.where(cand, f_kf, KF)
    # Stable two-pass sort == lexsort by (winner, keyframe).
    o1 = jnp.argsort(f_kf_m, stable=True)
    o2 = jnp.argsort(f_w_m[o1], stable=True)
    order = o1[o2]
    sw = f_w_m[order]
    skf = f_kf_m[order]
    sslot = f_slot[order]
    svalid = sw < MP
    prev_same = jnp.concatenate(
        [jnp.array([False]), (sw[1:] == sw[:-1]) & (skf[1:] == skf[:-1])]
    )
    acc = svalid & ~prev_same  # accepted migration candidates
    dup_add = svalid & prev_same  # dropped duplicate -> erase keypoint match

    # Rank of each accepted migration within its winner run.
    E = L * K
    lin = jnp.arange(E, dtype=jnp.int32)
    cum = jnp.cumsum(acc.astype(jnp.int32))  # inclusive
    run_start = jnp.full((MP + 1,), E, jnp.int32).at[sw].min(lin)
    rs = jnp.take(run_start, jnp.where(svalid, sw, MP))
    base = jnp.where(rs > 0, jnp.take(cum, jnp.clip(rs - 1, 0, E - 1)), 0)
    base = jnp.where(rs > 0, base, 0)
    rank = cum - 1 - base
    # Insert position = winner's current entry count + rank.
    wcnt = jnp.sum(obs_kf[jnp.clip(sw, 0, MP - 1)] >= 0, axis=1)
    j = wcnt + rank
    fits = j < K
    accept = acc & fits
    over = acc & ~fits

    # Writes: accepted -> winner's row + kf_mp = winner; rejected -> erase.
    obs_kf = obs_kf.at[
        jnp.where(accept, sw, MP), jnp.clip(j, 0, K - 1)
    ].set(skf, mode="drop")
    obs_slot = obs_slot.at[
        jnp.where(accept, sw, MP), jnp.clip(j, 0, K - 1)
    ].set(sslot, mode="drop")
    kf_mp = kf_mp.at[
        jnp.where(svalid, skf, KF), jnp.where(svalid, sslot, 0)
    ].set(jnp.where(accept, sw, INVALID), mode="drop")

    # Exact observation-count deltas: winners gain the migrated
    # observations; losers zero out (no global recount needed).
    inc = jnp.where(
        state.kf_ur[jnp.clip(skf, 0, KF - 1), jnp.clip(sslot, 0, N - 1)] >= 0,
        2, 1,
    )
    mp_n_obs = state.mp_n_obs.at[jnp.where(accept, sw, MP)].add(
        jnp.where(accept, inc, 0), mode="drop"
    )
    processed = jnp.zeros((MP,), bool).at[
        jnp.where(l_ok, lids, MP)
    ].set(l_ok, mode="drop")
    mp_n_obs = jnp.where(processed, 0, mp_n_obs)

    return state._replace(
        kf_mp=kf_mp,
        mp_obs_kf=obs_kf,
        mp_obs_slot=obs_slot,
        mp_n_obs=mp_n_obs,
        mp_valid=state.mp_valid
        & ~(jnp.zeros((MP,), bool).at[jnp.where(l_ok, lids, MP)].set(
            l_ok, mode="drop")),
        # Only rank-overflowed migrations are capacity losses. dup_add
        # (two losers observed the same keyframe; one migration survives,
        # the other keypoint match is ERASED) is the reference's own
        # Replace behavior (MapPoint::Replace -> EraseMapPointMatch,
        # src/MapPoint.cc) — counting it as overflow mislabeled ~16k
        # reference-faithful erasures per 1,400-frame circuit as losses.
        obs_overflow=state.obs_overflow + jnp.sum(over, dtype=jnp.int32),
    )


# ---------------------------------------------------------------------------
# 4. Local bundle adjustment
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_cams", "max_points", "max_obs"),
)
def extract_local_ba(
    cfg: SlamConfig,
    state: ms.MapState,
    kf_id,
    max_cams: int = 32,
    max_points: int = 4096,
    max_obs: int = 16384,
):
    """Build a static-shape BAProblem for the covisibility window of kf_id
    (reference local window: KF + first-ring covis as free cameras, other
    observers fixed, src/Optimizer.cc:461-510)."""
    KF, N = state.kf_mp.shape
    MP = state.mp_pos.shape[0]
    # Free cams: kf_id + covis (weight ordered), up to max_cams-?; fixed
    # anchors: additional observers, filling the remaining slots.
    w_row = state.covis[kf_id] * state.kf_valid
    w_row = w_row.at[kf_id].set(jnp.iinfo(jnp.int32).max)  # center first
    n_free = max_cams // 2
    free_w, free_ids = jax.lax.top_k(w_row, n_free)
    free_ok = free_w > 0
    free_mask_kf = jnp.zeros((KF,), bool).at[free_ids].set(free_ok)

    # Local points: union of free cams' observations.
    rows = jnp.take(state.kf_mp, free_ids, axis=0)  # (n_free, N)
    rows_ok = free_ok[:, None] & (rows >= 0) & jnp.take(state.kf_kp_valid, free_ids, axis=0)
    pt_mask = jnp.zeros((MP,), bool).at[jnp.where(rows_ok, rows, 0).reshape(-1)].set(
        rows_ok.reshape(-1)
    )
    pt_mask = pt_mask & state.mp_valid
    pt_ids = jnp.nonzero(pt_mask, size=max_points, fill_value=MP)[0]  # (P,)
    pt_local = jnp.full((MP + 1,), -1, jnp.int32).at[pt_ids].set(
        jnp.arange(max_points, dtype=jnp.int32)
    )

    # Fixed cams: observers of local points that are not free — read off the
    # local points' observer lists (O(P x K)) instead of scanning the full
    # (KF x N) observation table.
    loc_obs_kf = state.mp_obs_kf[jnp.clip(pt_ids, 0, MP - 1)]  # (P, K)
    loc_e_ok = (pt_ids < MP)[:, None] & (loc_obs_kf >= 0)
    obs_votes = jnp.zeros((KF + 1,), jnp.int32).at[
        jnp.where(loc_e_ok, loc_obs_kf, KF).reshape(-1)
    ].add(1)[:KF]
    observes_local = obs_votes > 0
    fixed_cand = observes_local & ~free_mask_kf & state.kf_valid
    n_fixed = max_cams - n_free
    fixed_score = fixed_cand.astype(jnp.int32) * (1 + state.covis[kf_id])
    fixed_w, fixed_ids = jax.lax.top_k(fixed_score, n_fixed)
    fixed_ok = fixed_w > 0

    cam_ids = jnp.concatenate([free_ids, fixed_ids])  # (C,)
    cam_ok = jnp.concatenate([free_ok, fixed_ok])
    cam_fixed = jnp.concatenate([jnp.zeros((n_free,), bool), jnp.ones((n_fixed,), bool)])
    # Keep the gauge: the oldest free cam is fixed too when the window has
    # few anchors (reference fixes map-origin KF0 when included; we fix the
    # lowest-id free cam if no fixed cams exist).
    no_anchor = ~jnp.any(fixed_ok)
    oldest = jnp.argmin(jnp.where(free_ok, free_ids, jnp.iinfo(jnp.int32).max))
    cam_fixed = cam_fixed.at[oldest].set(cam_fixed[oldest] | no_anchor)

    cam_local = jnp.full((KF + 1,), -1, jnp.int32).at[
        jnp.where(cam_ok, cam_ids, KF)
    ].set(jnp.arange(max_cams, dtype=jnp.int32))
    cam_local = cam_local.at[KF].set(-1)

    # Observations: all (cam in cam_ids, slot) pairs with local points.
    cam_rows = jnp.take(state.kf_mp, cam_ids, axis=0)  # (C, N)
    cam_rows_ok = (
        cam_ok[:, None]
        & (cam_rows >= 0)
        & jnp.take(state.kf_kp_valid, cam_ids, axis=0)
    )
    pt_loc = jnp.take(pt_local, jnp.where(cam_rows_ok, cam_rows, MP))  # (C, N)
    obs_ok = cam_rows_ok & (pt_loc >= 0)
    flat_ok = obs_ok.reshape(-1)
    sel = jnp.nonzero(flat_ok, size=max_obs, fill_value=max_cams * N)[0]
    sel_valid = sel < max_cams * N
    sel_safe = jnp.where(sel_valid, sel, 0)
    o_cam = (sel_safe // N).astype(jnp.int32)
    o_slot = (sel_safe % N).astype(jnp.int32)
    o_pt = pt_loc.reshape(-1)[sel_safe]
    kf_of_obs = jnp.take(cam_ids, o_cam)
    uv = state.kf_uv[kf_of_obs, o_slot]
    ur = state.kf_ur[kf_of_obs, o_slot]
    octv = state.kf_octave[kf_of_obs, o_slot]
    sf = cfg.orb.scale_factor
    inv_sigma2 = jnp.asarray(
        [1.0 / sf ** (2 * l) for l in range(cfg.orb.n_levels)], jnp.float32
    )[octv]
    prob = ba.BAProblem(
        cam_Tcw=jnp.take(state.kf_Tcw, cam_ids, axis=0),
        cam_fixed=cam_fixed | ~cam_ok,
        pt_pos=jnp.take(state.mp_pos, jnp.clip(pt_ids, 0, MP - 1), axis=0),
        pt_valid=pt_ids < MP,
        obs_cam=o_cam,
        obs_pt=jnp.where(sel_valid, o_pt, 0),
        obs_uv=uv,
        obs_ur=ur,
        obs_inv_sigma2=inv_sigma2,
        obs_mask=sel_valid,
    )
    aux = {
        "cam_ids": cam_ids,
        "cam_ok": cam_ok,
        "pt_ids": pt_ids,
        "obs_kf": kf_of_obs,
        "obs_slot": o_slot,
        "obs_valid": sel_valid,
    }
    return prob, aux


def _refresh_distinctive_descriptors(state: ms.MapState, aux, final_mask, max_obs_per_pt: int = 8):
    """Min-median-Hamming representative descriptor per local point
    (reference MapPoint::ComputeDistinctiveDescriptors,
    src/MapPoint.cc:252-318), batched over the local-BA observation list:
    per point, gather up to `max_obs_per_pt` observation descriptors, pick
    the one minimizing the median distance to the others."""
    MP = state.mp_pos.shape[0]
    P = aux["pt_ids"].shape[0]
    K = max_obs_per_pt
    obs_pt = jnp.where(final_mask, aux["obs_pt_local"], P)  # (O,) local idx
    # Rank of each observation within its point (first K kept).
    order = jnp.argsort(obs_pt)
    sorted_pt = obs_pt[order]
    O = obs_pt.shape[0]
    first_pos = jnp.full((P + 1,), O, jnp.int32).at[sorted_pt].min(
        jnp.arange(O, dtype=jnp.int32)
    )
    rank = jnp.arange(O, dtype=jnp.int32) - jnp.take(first_pos, sorted_pt)
    desc_sorted = state.kf_desc[aux["obs_kf"][order], aux["obs_slot"][order]]  # (O, 8)
    keep = (rank < K) & (sorted_pt < P)
    table = jnp.zeros((P + 1, K, 8), jnp.uint32).at[
        jnp.where(keep, sorted_pt, P), jnp.where(keep, rank, 0)
    ].set(desc_sorted, mode="drop")[:P]
    cnt = jnp.zeros((P + 1,), jnp.int32).at[jnp.where(keep, sorted_pt, P)].add(1)[:P]
    # Pairwise Hamming within each point's observation set.
    x = jnp.bitwise_xor(table[:, :, None, :], table[:, None, :, :])
    d = jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.float32)  # (P,K,K)
    col_ok = (jnp.arange(K)[None, :] < cnt[:, None])  # (P, K)
    big = 1e9
    d = jnp.where(col_ok[:, None, :], d, big)
    # Median over valid columns per row: sort and index (cnt-1)//2.
    d_sorted = jnp.sort(d, axis=2)
    med_idx = jnp.clip((cnt - 1) // 2, 0, K - 1)
    med = jnp.take_along_axis(
        d_sorted, med_idx[:, None, None].repeat(K, 1), axis=2
    )[:, :, 0]  # (P, K)
    med = jnp.where(col_ok, med, big)
    best = jnp.argmin(med, axis=1)  # (P,)
    new_desc = jnp.take_along_axis(table, best[:, None, None].repeat(8, 2), axis=1)[:, 0, :]
    upd = (cnt >= 2) & (aux["pt_ids"] < MP)
    tgt = jnp.where(upd, aux["pt_ids"], MP)
    return state._replace(
        mp_desc=state.mp_desc.at[jnp.clip(tgt, 0, MP - 1)].set(
            jnp.where(upd[:, None], new_desc, state.mp_desc[jnp.clip(tgt, 0, MP - 1)])
        )
    )


@functools.partial(
    jax.jit, static_argnames=("cfg", "max_cams", "max_points")
)
def extract_local_ba_dense(
    cfg: SlamConfig,
    state: ms.MapState,
    kf_id,
    max_cams: int = 32,
    max_points: int = 4096,
):
    """Build a DenseBAProblem straight from the map's inverted index: the
    window's points keep their native (P, K) observer rows, so the LM loop
    never scatters or gathers (see ops/ba.py DenseBAProblem).

    Window semantics match `extract_local_ba` (reference
    src/Optimizer.cc:461-510): free cams = kf_id + top covis, fixed cams =
    other observers of the local points; observations at keyframes outside
    the selected camera set are dropped from the problem (the flat extract
    drops the same ones — both bound the fixed-anchor count)."""
    KF, N = state.kf_mp.shape
    MP = state.mp_pos.shape[0]
    K = state.mp_obs_kf.shape[1]
    w_row = state.covis[kf_id] * state.kf_valid
    w_row = w_row.at[kf_id].set(jnp.iinfo(jnp.int32).max)
    n_free = max_cams // 2
    free_w, free_ids = jax.lax.top_k(w_row, n_free)
    free_ok = free_w > 0
    free_mask_kf = jnp.zeros((KF,), bool).at[free_ids].set(free_ok)

    rows = jnp.take(state.kf_mp, free_ids, axis=0)  # (n_free, N)
    rows_ok = free_ok[:, None] & (rows >= 0) & jnp.take(state.kf_kp_valid, free_ids, axis=0)
    pt_mask = jnp.zeros((MP,), bool).at[jnp.where(rows_ok, rows, 0).reshape(-1)].set(
        rows_ok.reshape(-1)
    )
    pt_mask = pt_mask & state.mp_valid
    pt_ids = jnp.nonzero(pt_mask, size=max_points, fill_value=MP)[0]  # (P,)
    ok_pt = pt_ids < MP
    ptc = jnp.clip(pt_ids, 0, MP - 1)

    # Observer entries: the points' own index rows.
    e_kf = state.mp_obs_kf[ptc]  # (P, K)
    e_slot = state.mp_obs_slot[ptc]
    e_ok = ok_pt[:, None] & (e_kf >= 0)

    obs_votes = jnp.zeros((KF + 1,), jnp.int32).at[
        jnp.where(e_ok, e_kf, KF).reshape(-1)
    ].add(1)[:KF]
    fixed_cand = (obs_votes > 0) & ~free_mask_kf & state.kf_valid
    n_fixed = max_cams - n_free
    fixed_score = fixed_cand.astype(jnp.int32) * (1 + state.covis[kf_id])
    fixed_w, fixed_ids = jax.lax.top_k(fixed_score, n_fixed)
    fixed_ok = fixed_w > 0

    cam_ids = jnp.concatenate([free_ids, fixed_ids])  # (C,)
    cam_ok = jnp.concatenate([free_ok, fixed_ok])
    cam_fixed = jnp.concatenate(
        [jnp.zeros((n_free,), bool), jnp.ones((n_fixed,), bool)]
    )
    no_anchor = ~jnp.any(fixed_ok)
    oldest = jnp.argmin(jnp.where(free_ok, free_ids, jnp.iinfo(jnp.int32).max))
    cam_fixed = cam_fixed.at[oldest].set(cam_fixed[oldest] | no_anchor)

    cam_local = jnp.full((KF + 1,), -1, jnp.int32).at[
        jnp.where(cam_ok, cam_ids, KF)
    ].set(jnp.arange(max_cams, dtype=jnp.int32))
    cam_local = cam_local.at[KF].set(-1)

    e_kfc = jnp.clip(e_kf, 0, KF - 1)
    e_slotc = jnp.clip(e_slot, 0, N - 1)
    e_cam = jnp.where(e_ok, jnp.take(cam_local, e_kfc), -1)  # (P, K)
    e_mask = e_ok & (e_cam >= 0) & state.kf_kp_valid[e_kfc, e_slotc]

    # The index rows carry up to K observers, but the LM loop's cost is
    # linear in the problem's obs width: keep a K_BA-entry subset per point
    # — in-window observations first, free-camera ones before fixed anchors
    # (those constrain the cameras being optimized; entries at cameras
    # outside the window carry no residual at all and sort last).
    K_BA = 16
    e_col = jnp.broadcast_to(
        jnp.arange(e_kf.shape[1], dtype=jnp.int32)[None, :], e_kf.shape
    )
    if e_kf.shape[1] > K_BA:
        # In-window entries first, keeping row (insertion) order — measured
        # indistinguishable from free-first / interleaved orderings across
        # seeds (tools/ate_seed_sweep.py), so the simplest policy wins.
        key = jnp.where(e_mask, 0, 1)
        order = jnp.argsort(key, axis=1, stable=True)[:, :K_BA]
        sub = lambda a: jnp.take_along_axis(a, order, axis=1)
        e_kf, e_slot, e_cam = sub(e_kf), sub(e_slot), sub(e_cam)
        e_ok, e_mask, e_col = sub(e_ok), sub(e_mask), sub(e_col)
        e_kfc = jnp.clip(e_kf, 0, KF - 1)
        e_slotc = jnp.clip(e_slot, 0, N - 1)

    uv = state.kf_uv[e_kfc, e_slotc]  # (P, K, 2)
    ur = jnp.where(e_mask, state.kf_ur[e_kfc, e_slotc], -1.0)
    octv = state.kf_octave[e_kfc, e_slotc]
    sf = cfg.orb.scale_factor
    inv_sigma2 = jnp.asarray(
        [1.0 / sf ** (2 * l) for l in range(cfg.orb.n_levels)], jnp.float32
    )[octv]

    prob = ba.DenseBAProblem(
        cam_Tcw=jnp.take(state.kf_Tcw, cam_ids, axis=0),
        cam_fixed=cam_fixed | ~cam_ok,
        pt_pos=jnp.take(state.mp_pos, ptc, axis=0),
        pt_valid=ok_pt,
        e_cam=jnp.where(e_mask, e_cam, -1),
        e_uv=uv,
        e_ur=ur,
        e_inv_sigma2=inv_sigma2,
        e_mask=e_mask,
    )
    aux = {
        "cam_ids": cam_ids,
        "cam_ok": cam_ok,
        "pt_ids": pt_ids,
        "e_kf": e_kf,
        "e_slot": e_slot,
        # index-row column of each problem entry (the K_BA subset permutes
        # them, so the writeback cannot assume column k == position k)
        "e_col": e_col,
    }
    return prob, aux


def _refresh_descriptors_dense(state: ms.MapState, pt_ids, ok_pt):
    """Min-median-Hamming representative descriptor per point (reference
    MapPoint::ComputeDistinctiveDescriptors, src/MapPoint.cc:252-318),
    computed directly on the points' (K-entry) observer rows."""
    MP = state.mp_pos.shape[0]
    KF, N = state.kf_mp.shape
    ptc = jnp.clip(pt_ids, 0, MP - 1)
    # Full observer rows. Observation rows are NOT compacted: obs_remove
    # leaves INVALID holes in place and obs_add fills the first free slot,
    # so any fixed prefix subset (a round-4 attempt used [:16]) drops real
    # observers arbitrarily and deterministically regressed KITTI ATE
    # 0.11 -> 3.39 m. Reference computes the representative over ALL
    # observations (src/MapPoint.cc:252-318).
    e_kf = state.mp_obs_kf[ptc]  # (P, K)
    e_slot = state.mp_obs_slot[ptc]
    e_ok = ok_pt[:, None] & (e_kf >= 0)
    desc = state.kf_desc[
        jnp.clip(e_kf, 0, KF - 1), jnp.clip(e_slot, 0, N - 1)
    ]  # (P, K_DESC, 8)
    x = jnp.bitwise_xor(desc[:, :, None, :], desc[:, None, :, :])
    d = jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.float32)
    big = 1e9
    d = jnp.where(e_ok[:, None, :], d, big)  # (P, K, K)
    cnt = jnp.sum(e_ok, axis=1)
    K = e_kf.shape[1]
    d_sorted = jnp.sort(d, axis=2)
    med_idx = jnp.clip((cnt - 1) // 2, 0, K - 1)
    med = jnp.take_along_axis(
        d_sorted, med_idx[:, None, None].repeat(K, 1), axis=2
    )[:, :, 0]  # (P, K)
    med = jnp.where(e_ok, med, big)
    best = jnp.argmin(med, axis=1)
    new_desc = jnp.take_along_axis(desc, best[:, None, None].repeat(8, 2), axis=1)[:, 0, :]
    upd = (cnt >= 2) & ok_pt
    tgt = jnp.where(upd, pt_ids, MP)
    return state._replace(
        mp_desc=state.mp_desc.at[jnp.clip(tgt, 0, MP - 1)].set(
            jnp.where(upd[:, None], new_desc, state.mp_desc[ptc])
        )
    )


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def writeback_local_ba_dense(
    cfg: SlamConfig, state: ms.MapState, prob: ba.DenseBAProblem, aux, final_mask
):
    """Write optimized poses/points back and erase outlier observations
    (reference src/Optimizer.cc:717-763). Outlier entries are index entries
    (point row, position k) by construction, so removal is two direct
    scatters + a row compaction — no pair matching."""
    MP = state.mp_pos.shape[0]
    KF, N = state.kf_mp.shape
    K = state.mp_obs_kf.shape[1]
    upd_cam = aux["cam_ok"] & ~prob.cam_fixed
    tgt_kf = jnp.where(upd_cam, aux["cam_ids"], KF)
    kf_Tcw = state.kf_Tcw.at[tgt_kf].set(prob.cam_Tcw, mode="drop")
    pt_ids = aux["pt_ids"]
    ok_pt = pt_ids < MP
    tgt_pt = jnp.where(ok_pt, pt_ids, MP)
    mp_pos = state.mp_pos.at[tgt_pt].set(prob.pt_pos, mode="drop")

    drop = prob.e_mask & ~final_mask  # (P, K)
    e_kf = jnp.where(drop, aux["e_kf"], KF)
    e_slot = jnp.where(drop, aux["e_slot"], 0)
    kf_mp = state.kf_mp.at[e_kf, e_slot].set(INVALID, mode="drop")
    # Remove the dropped entries from the index rows at their known
    # positions, then compact the touched rows.
    rowi = jnp.broadcast_to(tgt_pt[:, None], drop.shape)
    coli = aux["e_col"]
    mp_obs_kf = state.mp_obs_kf.at[
        jnp.where(drop, rowi, MP), coli
    ].set(INVALID, mode="drop")
    mp_obs_slot = state.mp_obs_slot.at[
        jnp.where(drop, rowi, MP), coli
    ].set(INVALID, mode="drop")
    # Row compaction only for points that actually LOST an entry (the
    # scatter above left holes there); compacting all window rows cost a
    # (P, K) gather+sort for rows that are already hole-free.
    P, K_BA = drop.shape
    Emax = P * K_BA
    D = 2048
    dids = jnp.nonzero(drop.reshape(-1), size=D, fill_value=Emax)[0]
    d_ok = dids < Emax
    dc = jnp.clip(dids, 0, Emax - 1)
    d_pid = jnp.take(rowi.reshape(-1), dc)  # (D,) pids with removed entries
    mp_obs_kf, mp_obs_slot = ms.obs_compact_rows(
        mp_obs_kf, mp_obs_slot, jnp.where(d_ok, d_pid, MP), d_ok
    )
    dec = jnp.sum(jnp.where(drop, jnp.where(prob.e_ur >= 0, 2, 1), 0), axis=1)
    mp_n_obs = state.mp_n_obs.at[tgt_pt].add(-dec, mode="drop")
    mp_n_obs = jnp.maximum(mp_n_obs, 0)
    state = state._replace(
        kf_Tcw=kf_Tcw, mp_pos=mp_pos, kf_mp=kf_mp, mp_n_obs=mp_n_obs,
        mp_obs_kf=mp_obs_kf, mp_obs_slot=mp_obs_slot,
    )
    # Derived-state refresh set: ALL window points (the union of the free
    # cameras' rows). The reference refreshes descriptors + normals for
    # every keyframe's matches at ProcessNewKeyFrame time
    # (src/LocalMapping.cc:161-170) and again post-fuse for the current
    # keyframe (src/LocalMapping.cc:584-595); our full pass runs every
    # `full_every` keyframes, so the window — whose free cameras are
    # exactly the recent keyframes — is the batched equivalent of those
    # per-keyframe refreshes. A round-5 attempt to restrict this to the
    # NEW keyframe's row alone starved the intervening keyframes' points
    # of their refresh and deterministically regressed the KITTI-format
    # driver E2E 0.1 -> 3.40 m (the same staleness failure mode as
    # round 4's observer-subset regression).
    ref_ids, ref_ok = pt_ids, ok_pt
    state = ms.update_point_geometry_ids(
        state, ref_ids, ref_ok, cfg.orb.scale_factor, cfg.orb.n_levels
    )
    # Covisibility: BA pose updates do not change shared-point counts, so
    # only the dropped outlier observations (few hundred per pass) carry
    # covis deltas — applied exactly, entry by entry, instead of recounting
    # every window row (a 52-row recount was ~21 ms/pass at capacity, ~25%
    # of the whole full pass). The new keyframe's own row is still
    # recounted, mirroring the reference's UpdateConnections-on-current-KF
    # (src/LocalMapping.cc:604-608) — other rows drift until their own next
    # update, exactly as the reference's do.
    d_kf = jnp.take(aux["e_kf"].reshape(-1), dc)
    state = ms.covis_sub_removed_obs(state, d_pid, d_kf, d_ok)
    state = state._replace(
        shed_work=state.shed_work
        + jnp.maximum(jnp.sum(drop, dtype=jnp.int32) - D, 0)
    )
    state = ms.refresh_covisibility(state, aux["cam_ids"][:1])
    state = _refresh_descriptors_dense(state, ref_ids, ref_ok)
    return state


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def writeback_local_ba(cfg: SlamConfig, state: ms.MapState, prob: ba.BAProblem, aux, final_mask):
    """Write optimized poses/points back into the map and erase outlier
    observations (reference src/Optimizer.cc:717-763)."""
    MP = state.mp_pos.shape[0]
    KF = state.kf_Tcw.shape[0]
    upd_cam = aux["cam_ok"] & ~prob.cam_fixed
    tgt_kf = jnp.where(upd_cam, aux["cam_ids"], KF)
    kf_Tcw = state.kf_Tcw.at[tgt_kf].set(prob.cam_Tcw, mode="drop")
    ok_pt = aux["pt_ids"] < MP
    tgt_pt = jnp.where(ok_pt, aux["pt_ids"], MP)
    mp_pos = state.mp_pos.at[tgt_pt].set(prob.pt_pos, mode="drop")
    # Outlier observations: obs that were valid going in but failed the
    # final chi2 classification. Dropped from kf_mp, the inverted index and
    # the counts with exact deltas — no global recount.
    drop = aux["obs_valid"] & ~final_mask
    kf_mp = state.kf_mp.at[
        jnp.where(drop, aux["obs_kf"], KF), jnp.where(drop, aux["obs_slot"], 0)
    ].set(INVALID, mode="drop")
    gpt = jnp.take(aux["pt_ids"], prob.obs_pt)  # (O,) global point ids
    mp_obs_kf, mp_obs_slot = ms.obs_remove_pairs(
        state.mp_obs_kf, state.mp_obs_slot,
        jnp.where(drop & (gpt < MP), gpt, INVALID),
        aux["obs_kf"], aux["obs_slot"], drop,
    )
    dec = jnp.where(
        state.kf_ur[jnp.where(drop, aux["obs_kf"], 0), jnp.where(drop, aux["obs_slot"], 0)] >= 0,
        2,
        1,
    )
    mp_n_obs = state.mp_n_obs.at[
        jnp.where(drop & (gpt < MP), gpt, MP)
    ].add(jnp.where(drop, -dec, 0), mode="drop")
    mp_n_obs = jnp.maximum(mp_n_obs, 0)
    state = state._replace(
        kf_Tcw=kf_Tcw, mp_pos=mp_pos, kf_mp=kf_mp, mp_n_obs=mp_n_obs,
        mp_obs_kf=mp_obs_kf, mp_obs_slot=mp_obs_slot,
    )
    state = ms.update_point_geometry_ids(
        state, aux["pt_ids"], ok_pt, cfg.orb.scale_factor, cfg.orb.n_levels
    )
    state = ms.refresh_covisibility(
        state, jnp.where(aux["cam_ok"], aux["cam_ids"], -1)
    )
    aux2 = dict(aux, obs_pt_local=prob.obs_pt)
    state = _refresh_distinctive_descriptors(state, aux2, final_mask)
    return state


# ---------------------------------------------------------------------------
# 5. Keyframe culling
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def keyframe_culling(cfg: SlamConfig, state: ms.MapState, kf_id):
    """Cull redundant local keyframes: >= 90% of their tracked points are
    observed by >= 3 other keyframes at the same or finer octave (reference
    KeyFrameCulling src/LocalMapping.cc:708-772). KF 0 is never culled."""
    KF, N = state.kf_mp.shape
    MP = state.mp_pos.shape[0]
    L = cfg.orb.n_levels

    # Candidates: covisible neighbors of kf_id (not kf_id itself, not 0).
    cand_mask = (state.covis[kf_id] > 0) & state.kf_valid
    cand_mask = cand_mask.at[0].set(False).at[kf_id].set(False)

    # Only the covisible neighbors are candidates (reference iterates
    # GetVectorCovisibleKeyFrames, src/LocalMapping.cc:712) — evaluate the
    # redundancy test on the top-K of those.
    # Top-16 covis candidates per pass (the reference checks every covis
    # neighbor, src/LocalMapping.cc:712, but re-runs on every keyframe —
    # the top-by-weight subset converges to the same culls over passes at
    # half the gather volume).
    MAXCAND = min(16, KF)
    cand_w = jnp.where(cand_mask, state.covis[kf_id], 0)
    top_w, top_ids = jax.lax.top_k(cand_w, MAXCAND)

    # Redundancy: a keyframe is redundant if >=90% of its (close) tracked
    # points have >=3 OTHER observers at the same-or-finer octave
    # (reference src/LocalMapping.cc:708-772, over ALL observations — see
    # _refresh_descriptors_dense: observer rows have holes, so prefix
    # subsets are wrong). Counted via a per-point cumulative octave
    # histogram over the UNION of the candidates' points: candidates share
    # most of their points, so one (U, K) observer-octave gather replaces
    # MAXCAND per-candidate (N, K) gathers (~4x less gather volume — the
    # octave gather was the dominant cull cost at capacity). For a point p
    # with octave `own` in candidate k: k itself observes p at own <= own+1,
    # so #other same-or-finer observers = c8[p, min(own+1, L-1)] - 1,
    # exactly the reference count.
    rows = jnp.take(state.kf_mp, top_ids, axis=0)  # (MAXCAND, N)
    rows_ok = (rows >= 0) & jnp.take(state.kf_kp_valid, top_ids, axis=0)
    rows_ok = rows_ok & (top_w > 0)[:, None]
    # stereo/RGB-D only counts close points (reference :728-733)
    if cfg.camera.bf > 0:
        depth = jnp.take(state.kf_depth, top_ids, axis=0)
        rows_ok = rows_ok & (depth > 0) & (depth < cfg.camera.close_depth)
    U = min(8192, MP)
    in_union = jnp.zeros((MP + 1,), bool).at[
        jnp.where(rows_ok, rows, MP).reshape(-1)
    ].set(True)[:MP]
    union_ids = jnp.nonzero(in_union, size=U, fill_value=MP)[0]  # (U,)
    u_ok = union_ids < MP
    uc = jnp.clip(union_ids, 0, MP - 1)
    o_kf = state.mp_obs_kf[uc]  # (U, K)
    o_slot = state.mp_obs_slot[uc]
    o_ok = u_ok[:, None] & (o_kf >= 0)
    o_oct = state.kf_octave[
        jnp.clip(o_kf, 0, KF - 1), jnp.clip(o_slot, 0, N - 1)
    ]
    hist = jnp.zeros((U, L), jnp.int32).at[
        jnp.broadcast_to(jnp.arange(U, dtype=jnp.int32)[:, None], o_kf.shape),
        jnp.clip(o_oct, 0, L - 1),
    ].add(jnp.where(o_ok, 1, 0))
    c8 = jnp.cumsum(hist, axis=1)  # (U, L): observers with octave <= l
    u_pos = jnp.full((MP + 1,), U, jnp.int32).at[
        jnp.where(u_ok, union_ids, MP)
    ].set(jnp.arange(U, dtype=jnp.int32), mode="drop")[:MP]
    # Points past the U bound map to a zero histogram row -> n_fine = -1 ->
    # never redundant (conservative: that cull is skipped, retried on a
    # later pass); the overflow is load-shedding, counted as such.
    c8_pad = jnp.concatenate([c8, jnp.zeros((1, L), jnp.int32)], axis=0)
    pos = jnp.take(u_pos, jnp.clip(rows, 0, MP - 1))  # (MAXCAND, N)
    own = jnp.take(state.kf_octave, top_ids, axis=0)
    n_fine = c8_pad[pos, jnp.clip(own + 1, 0, L - 1)] - 1  # (MAXCAND, N)
    redundant = rows_ok & (n_fine >= cfg.mapping.kf_cull_min_obs)
    n_ok = jnp.sum(rows_ok, axis=1)
    red_top = jnp.where(
        n_ok > 0,
        jnp.sum(redundant, axis=1) >= cfg.mapping.kf_cull_redundancy * n_ok,
        False,
    ) & (top_w > 0)
    union_over = jnp.sum(in_union, dtype=jnp.int32) - jnp.sum(
        u_ok, dtype=jnp.int32
    )
    state = state._replace(
        shed_work=state.shed_work + jnp.maximum(union_over, 0)
    )
    red = jnp.zeros((KF,), bool).at[top_ids].set(red_top)
    culled_mask = red

    def detach(state):
        # Detach: drop the culled keyframes' observations from the inverted
        # index + counts (exact deltas), invalidate, re-home children to the
        # culled KF's parent (simplified re-homing vs the reference's greedy
        # candidate loop, src/KeyFrame.cc:467-559).
        state = ms.erase_keyframe_observations(state, top_ids, red_top)
        kf_valid = state.kf_valid & ~red
        kf_mp = jnp.where(red[:, None], INVALID, state.kf_mp)
        # EraseObservation cascade (reference MapPoint::EraseObservation,
        # src/MapPoint.cc: nObs<=2 -> SetBadFlag): points whose observer
        # count the cull just dropped to <=2 die WITH the keyframe. Without
        # this, culled keyframes strand zombie points (measured: ~50% of
        # the valid map at KITTI capacity had ZERO live observers) that
        # keep passing the frustum check, saturate the local-search
        # candidate cap, and alias into wrong matches.
        touched_rows = jnp.where(
            red_top[:, None] & (jnp.take(state.kf_mp, top_ids, axis=0) >= 0),
            jnp.take(state.kf_mp, top_ids, axis=0), MP,
        ).reshape(-1)
        touched = jnp.zeros((MP + 1,), bool).at[touched_rows].set(True)[:MP]
        dead = touched & state.mp_valid & (state.mp_n_obs <= 2)
        state = ms.erase_map_points(state._replace(kf_mp=kf_mp), dead)
        kf_mp = state.kf_mp
        parent_of = state.kf_parent
        # Children of culled keyframes re-home GREEDILY by covisibility
        # weight (reference KeyFrame::SetBadFlag, src/KeyFrame.cc:467-559
        # picks the max-weight candidate per child). Candidates here are
        # all surviving OLDER keyframes — the age constraint keeps the tree
        # acyclic, which the reference gets from its parent-candidate
        # bookkeeping; the culled KF's own parent remains the fallback when
        # no covisible candidate exists.
        ids = jnp.arange(KF)
        child_of_culled = (parent_of >= 0) & jnp.take(red, jnp.maximum(parent_of, 0))
        cand_ok = (ids[None, :] < ids[:, None]) & kf_valid[None, :]
        w = jnp.where(cand_ok, state.covis, -1)
        best_parent = jnp.argmax(w, axis=1).astype(jnp.int32)
        best_w = jnp.max(w, axis=1)
        grandparent = jnp.take(parent_of, jnp.maximum(parent_of, 0))
        rehomed = jnp.where(best_w > 0, best_parent, grandparent)
        new_parent = jnp.where(child_of_culled, rehomed, parent_of)
        covis = jnp.where(red[:, None] | red[None, :], 0, state.covis)
        return state._replace(
            kf_valid=kf_valid, kf_mp=kf_mp, kf_parent=new_parent, covis=covis,
        )

    # Most passes cull NOTHING: the detach machinery (observation erasure,
    # dead-point cascade with its MP-wide compaction, (KF, KF) re-homing
    # argmax, covis zeroing) only runs when a keyframe was actually culled.
    state = jax.lax.cond(jnp.any(red_top), detach, lambda s: s, state)
    return state, culled_mask


# ---------------------------------------------------------------------------
# Fused per-keyframe passes (one device dispatch each)
# ---------------------------------------------------------------------------


def light_pass(cfg: SlamConfig, state: ms.MapState, kf_id, n_neighbors: int):
    """Per-keyframe mandatory passes: map-point culling + triangulation
    (reference runs these on every keyframe regardless of queue pressure,
    src/LocalMapping.cc:75-85). Two async dispatches (see full_pass)."""
    kf_id = jnp.int32(kf_id)
    state = map_point_culling(cfg, state, kf_id)
    state, n_new = create_new_map_points(
        cfg, state, kf_id, n_neighbors=n_neighbors
    )
    return state, n_new


def full_pass(cfg: SlamConfig, state: ms.MapState, kf_id,
              run_ba: bool = True, cull: bool = True, fuse_targets: int = 20):
    """The optional mapper passes: neighbor fuse, local BA, keyframe
    culling (reference runs these when its queue is empty,
    src/LocalMapping.cc:86-102).

    Each stage is its OWN async dispatch (and each local-BA LM step too):
    on the target chip a long fused program pessimizes per-op performance
    ~2.5-4x (layout/scheduling degrade with program size) while an async
    dispatch costs the host ~0.15 ms and never blocks on the tunnel — the
    round-2 single-dispatch fusion optimized the wrong quantity."""
    cam = cfg.camera
    kf_id = jnp.int32(kf_id)
    # geometry refresh inside fuse is redundant when BA's writeback follows
    # (BA moves the points and refreshes geometry itself)
    state, fuse_tgts = fuse_neighbors(
        cfg, state, kf_id, n_targets=fuse_targets, refresh_derived=not run_ba
    )
    if run_ba:
        prob, aux = extract_local_ba_dense(cfg, state, kf_id)
        prob, final_mask = ba.local_ba_dense(
            prob, cam.fx, cam.fy, cam.cx, cam.cy, cam.bf,
            iters1=cfg.mapping.local_ba_iters1,
            iters2=cfg.mapping.local_ba_iters2,
            n_free=prob.cam_Tcw.shape[0] // 2,  # extract's free/fixed split
        )
        state = writeback_local_ba_dense(cfg, state, prob, aux, final_mask)
    if cull:
        state, culled_mask = keyframe_culling(cfg, state, kf_id)
    else:
        culled_mask = jnp.zeros(state.kf_valid.shape, bool)
    return state, culled_mask


# ---------------------------------------------------------------------------
# Host orchestration
# ---------------------------------------------------------------------------


class LocalMapper:
    """Chains the local-mapping passes after each keyframe insertion
    (the synchronous analog of the reference LocalMapping::Run loop).

    Load shedding mirrors the reference exactly: when keyframes arrive
    back-to-back ("queue pressure"), SearchInNeighbors and local BA are
    skipped — the reference runs them only when its KF queue is empty
    (src/LocalMapping.cc:86-102) and aborts a running BA on new arrivals
    (mbAbortBA, src/LocalMapping.cc:631-706). `full_every` bounds the
    staleness: every Mth keyframe gets the full pass even under pressure
    (the reference's queue likewise drains eventually).
    """

    def __init__(
        self,
        cfg: SlamConfig,
        run_ba: bool = True,
        cull_keyframes: bool = True,
        full_every: int = 1,
        cull_every: int = 2,
        fuse_targets: int = 20,
    ):
        self.cfg = cfg
        self.run_ba = run_ba
        self.cull = cull_keyframes
        self.full_every = max(1, full_every)
        # Keyframe culling runs on every `cull_every`-th FULL pass: the
        # redundancy test re-evaluates the same covisible neighborhood each
        # time, so halving its frequency converges to the same culls at
        # half the gather cost (the reference also skips culling whenever
        # its queue is non-empty, src/LocalMapping.cc:86-102).
        self.cull_every = max(1, cull_every)
        # Fuse-target count: reference SearchInNeighbors gathers 10 (stereo)
        # first-ring covis neighbors plus each one's 5 best
        # (src/LocalMapping.cc:530-552); top-20 (the default) covers the
        # dedup'd union. Measured: cutting to 12 LOWERS sustained fps — the
        # weaker fuse degrades the map, which inflates keyframe insertion
        # (109 -> 124 KFs over the same 190 frames) and the extra mapper
        # passes cost more than the smaller search saves.
        self.fuse_targets = fuse_targets
        self._since_cull = 0
        self._since_full = 0
        # Deferred (device-scalar) counters: converting per-call would stall
        # the in-flight dispatch pipeline for a tunnel RTT each keyframe.
        self._created = []
        self._culled = []
        self._ba_runs = 0

    @property
    def stats(self) -> dict:
        return {
            "points_created": int(sum(int(np.asarray(x)) for x in self._created)),
            "kfs_culled": int(sum(int(np.asarray(x)) for x in self._culled)),
            "ba_runs": self._ba_runs,
        }

    def process(
        self, state: ms.MapState, kf_id: int, queue_pressure: bool = False
    ) -> ms.MapState:
        cfg = self.cfg
        kf = jnp.int32(kf_id)
        n_neigh = (
            cfg.mapping.triangulation_neighbors_mono
            if cfg.sensor.name == "MONOCULAR"
            else cfg.mapping.triangulation_neighbors_stereo
        )
        state, n_new = light_pass(cfg, state, kf, n_neigh)
        self._created.append(n_new)
        self._since_full += 1
        do_full = (not queue_pressure) or self._since_full >= self.full_every
        if not do_full:
            self.last_culled_mask = None
            return state
        self._since_full = 0
        run_ba = self.run_ba and kf_id >= 2
        self._since_cull += 1
        do_cull = self.cull and self._since_cull >= self.cull_every
        if do_cull:
            self._since_cull = 0
        state, culled_mask = full_pass(
            cfg, state, kf, run_ba=run_ba, cull=do_cull,
            fuse_targets=self.fuse_targets,
        )
        if run_ba:
            self._ba_runs += 1
        if do_cull:
            # Exposed so the owning pipeline can sync the keyframe database
            # (reference SetBadFlag -> KeyFrameDatabase::erase).
            self.last_culled_mask = culled_mask
            self._culled.append(jnp.sum(culled_mask))
        else:
            self.last_culled_mask = None
        return state

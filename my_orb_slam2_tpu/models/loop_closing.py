"""Loop closing: detection, Sim3 computation, loop correction, global BA.

Replaces the reference LoopClosing thread (src/LoopClosing.cc) with jitted
device passes driven by a host `LoopCloser`:

1. `detect` — BoW candidates above the covisibility-neighbor minimum score
   (src/LoopClosing.cc:115-265) + the 3-consecutive-keyframe covisibility
   consistency check (host-side group bookkeeping, mnCovisibilityConsistencyTh).
2. `compute_sim3` — per candidate: descriptor matching (>=20) -> batched
   Horn Sim3 RANSAC -> guided SearchBySim3 rematch -> 7-dof Sim3 LM
   (>=20 inliers) -> loop-point projection check (>=40 total matches)
   (src/LoopClosing.cc:281-477).
3. `correct_loop` — propagate the corrected Sim3 through the current
   covisibility group and its map points, fuse loop points, optimize the
   essential graph with the loop keyframe fixed, then run global bundle
   adjustment and remap all points (src/LoopClosing.cc:489-865; the
   reference runs GBA in a transient thread — here it runs synchronously
   after the pose graph).
"""

from __future__ import annotations

import collections
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from my_orb_slam2_tpu.models import keyframe_db as kdb
from my_orb_slam2_tpu.models import map_state as ms
from my_orb_slam2_tpu.ops import ba, horn, lie, matching, pose_graph, sim3_opt
from my_orb_slam2_tpu.utils.config import SlamConfig

INVALID = -1


# ---------------------------------------------------------------------------
# Sim3 computation for a candidate pair
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg",))
def match_and_sim3(cfg: SlamConfig, state: ms.MapState, kf_cur, kf_cand, key):
    """Steps 2a-2c: match descriptors, RANSAC Horn, Sim3 LM.

    Returns (ok, S_cur_cand (4,4), n_inliers, match_idx (N,), match_ok (N,)).
    match_idx maps current-KF keypoint slots -> candidate keypoint slots.
    """
    cam = cfg.camera
    MP = state.mp_pos.shape[0]
    sf = cfg.orb.scale_factor
    sigma2 = jnp.asarray([sf ** (2 * l) for l in range(cfg.orb.n_levels)], jnp.float32)
    fix_scale = cfg.sensor.name != "MONOCULAR"

    mp_c = state.kf_mp[kf_cur]
    mp_d = state.kf_mp[kf_cand]
    ok_c = (mp_c >= 0) & state.kf_kp_valid[kf_cur] & jnp.take(
        state.mp_valid, jnp.maximum(mp_c, 0)
    )
    ok_d = (mp_d >= 0) & state.kf_kp_valid[kf_cand] & jnp.take(
        state.mp_valid, jnp.maximum(mp_d, 0)
    )
    idx, mok, _ = matching.search_brute(
        state.kf_desc[kf_cur],
        ok_c,
        state.kf_desc[kf_cand],
        ok_d,
        state.kf_angle[kf_cur],
        state.kf_angle[kf_cand],
        max_dist=float(cfg.matcher.th_low),
        ratio=0.75,
        words1=state.kf_words[kf_cur],
        words2=state.kf_words[kf_cand],
        bucket_div=cfg.matcher.bow_gate_div,
    )
    n_matches = jnp.sum(mok)

    # 3D points of both sides in their camera frames.
    T_c = state.kf_Tcw[kf_cur]
    T_d = state.kf_Tcw[kf_cand]
    p_cur_w = jnp.take(state.mp_pos, jnp.maximum(mp_c, 0), axis=0)
    p_cand_w = jnp.take(
        state.mp_pos, jnp.maximum(jnp.take(mp_d, idx), 0), axis=0
    )
    p1 = lie.se3_apply(T_c, p_cur_w)  # current cam frame
    p2 = lie.se3_apply(T_d, p_cand_w)  # candidate cam frame
    uv1 = state.kf_uv[kf_cur]
    uv2 = jnp.take(state.kf_uv[kf_cand], idx, axis=0)
    oct1 = state.kf_octave[kf_cur]
    oct2 = jnp.take(state.kf_octave[kf_cand], idx)
    max_e1 = 9.21 * jnp.take(sigma2, oct1)
    max_e2 = 9.21 * jnp.take(sigma2, oct2)

    rs = horn.ransac_sim3(
        key, p1, p2, uv1, uv2, mok, max_e1, max_e2,
        cam.fx, cam.fy, cam.cx, cam.cy,
        n_iters=128, fix_scale=fix_scale,
    )

    # Guided SearchBySim3 rematch (reference src/LoopClosing.cc:372-380 via
    # src/ORBmatcher.cc:1158-1390): mutual projection under the RANSAC Sim3
    # fills match slots the BoW join missed, before the LM refinement.
    sf_tab = jnp.asarray([sf ** l for l in range(cfg.orb.n_levels)], jnp.float32)
    p2_slot_w = jnp.take(state.mp_pos, jnp.maximum(mp_d, 0), axis=0)
    idx_g, ok_g, _ = matching.search_by_sim3(
        p_cur_w, ok_c, state.kf_desc[kf_cur],
        p2_slot_w, ok_d, state.kf_desc[kf_cand],
        T_c, T_d, rs["S12"],
        uv1, oct1, state.kf_uv[kf_cand], state.kf_octave[kf_cand],
        sf_tab, cam.fx, cam.fy, cam.cx, cam.cy,
    )
    # BoW matches keep their slot; guided matches fill vacant ones
    # (reference: SearchBySim3 only writes empty vpMapPointMatches entries).
    idx_m = jnp.where(mok, idx, idx_g)
    ok_m = mok | (ok_g & ok_c & ~mok)

    # Re-gather the candidate-side quantities for the merged match set.
    p_cand_m = jnp.take(
        state.mp_pos, jnp.maximum(jnp.take(mp_d, idx_m), 0), axis=0
    )
    p2_m = lie.se3_apply(T_d, p_cand_m)
    uv2_m = jnp.take(state.kf_uv[kf_cand], idx_m, axis=0)
    oct2_m = jnp.take(state.kf_octave[kf_cand], idx_m)

    # Sim3 LM refinement on the merged matches (5 -> prune -> 10 schedule
    # with Huber classifies the guided additions, reference OptimizeSim3).
    inv_s1 = 1.0 / jnp.take(sigma2, oct1)
    inv_s2_ = 1.0 / jnp.take(sigma2, oct2_m)
    opt = sim3_opt.optimize_sim3(
        rs["S12"], p1, p2_m, uv1, uv2_m, inv_s1, inv_s2_,
        ok_m, cam.fx, cam.fy, cam.cx, cam.cy,
        fix_scale=fix_scale,
    )
    ok = (n_matches >= cfg.loop.sim3_min_bow_matches) & (
        opt["n_inliers"] >= cfg.loop.sim3_min_inliers
    )
    return ok, opt["S12"], opt["n_inliers"], idx_m, ok_m & opt["inliers"]


@functools.partial(jax.jit, static_argnames=("consistency_th",))
def consistency_check(
    state: ms.MapState, cand_ids, prev_masks, prev_counts, consistency_th: int
):
    """Covisibility-consistency bookkeeping ON DEVICE (reference
    src/LoopClosing.cc:186-247): a candidate's group (candidate + covis>=15
    neighbors) must intersect a previous keyframe's consistent group for
    `consistency_th` consecutive keyframes before the candidate is eligible.

    The reference walks std::sets on the CPU; here the groups are (C, KF)
    bitmasks so the whole update is one batched intersection — the host
    never reads the (KF, KF) covisibility matrix back (a 9.4 MB readback
    per keyframe at KITTI capacity).

    cand_ids: (C,) i32, -1 padded. prev_masks: (G, KF) bool, prev_counts:
    (G,) i32 — the previous keyframe's groups (zeros when none).
    Returns (new_masks (C, KF), new_counts (C,), enough (C,) bool).
    """
    C = cand_ids.shape[0]
    ok = cand_ids >= 0
    cid = jnp.maximum(cand_ids, 0)
    groups = state.covis[cid] >= 15  # (C, KF)
    groups = groups.at[jnp.arange(C), cid].set(True) & state.kf_valid[None, :]
    groups = groups & ok[:, None]
    overlap = jnp.any(groups[:, None, :] & prev_masks[None, :, :], axis=2)  # (C, G)
    counts = jnp.max(
        jnp.where(overlap, prev_counts[None, :] + 1, 0), axis=1
    ).astype(jnp.int32)
    enough = ok & (counts >= consistency_th)
    # Packed (2C,) readback row [ids | enough]: the host fetches ONE small
    # array per keyframe instead of two (each fetch through the tunnel is a
    # full round trip).
    packed = jnp.concatenate([cand_ids, enough.astype(jnp.int32)])
    return groups, jnp.where(ok, counts, 0), packed


@functools.partial(jax.jit, static_argnames=("cfg",))
def count_loop_point_matches(cfg: SlamConfig, state: ms.MapState, kf_cur, kf_cand, S_cur_cand):
    """Step 2d: project the candidate neighborhood's map points into the
    current keyframe through Scw = S_cur_cand * T_cand_w; count matches
    (reference :408-462, accept at >=40). Returns (n_total, loop_pt_mask,
    match_idx (N,), match_ok (N,))."""
    cam = cfg.camera
    MP = state.mp_pos.shape[0]
    KF = state.kf_Tcw.shape[0]
    # Loop points: candidate + its covis neighbors' observations.
    neigh = state.covis[kf_cand] >= 15
    group = neigh.at[kf_cand].set(True) & state.kf_valid
    sel = group[:, None] & (state.kf_mp >= 0) & state.kf_kp_valid
    loop_pts = jnp.zeros((MP,), bool).at[
        jnp.where(sel, state.kf_mp, 0).reshape(-1)
    ].set(sel.reshape(-1))
    loop_pts = loop_pts & state.mp_valid

    # Scw: world -> current camera through the Sim3.
    T_cand = state.kf_Tcw[kf_cand]
    Scw = lie.sim3_mul(S_cur_cand, T_cand)  # T_cand is Sim3 with s=1
    pc = lie.sim3_apply(Scw, state.mp_pos)
    z = pc[:, 2]
    zs = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    uv_p = jnp.stack(
        [cam.fx * pc[:, 0] / zs + cam.cx, cam.fy * pc[:, 1] / zs + cam.cy], axis=1
    )
    in_img = (
        (uv_p[:, 0] >= 0) & (uv_p[:, 0] < cam.width)
        & (uv_p[:, 1] >= 0) & (uv_p[:, 1] < cam.height) & (z > 0)
    )
    sf = cfg.orb.scale_factor
    sf_tab = jnp.asarray([sf ** l for l in range(cfg.orb.n_levels)], jnp.float32)
    idx, okm, _ = matching.search_by_projection(
        uv_p,
        jnp.zeros((MP,), jnp.int32),
        loop_pts & in_img,
        state.mp_desc,
        jnp.full((MP,), 8.0),
        state.kf_uv[kf_cur],
        state.kf_octave[kf_cur],
        state.kf_kp_valid[kf_cur],
        state.kf_desc[kf_cur],
        level_lo=jnp.zeros((MP,), jnp.int32),
        level_hi=jnp.full((MP,), cfg.orb.n_levels - 1, jnp.int32),
        max_dist=float(cfg.matcher.th_low),
        ratio=1.0,
    )
    N = state.kf_uv.shape[1]
    kp_match = jnp.full((N,), INVALID, jnp.int32).at[
        jnp.where(okm, idx, N - 1)
    ].max(jnp.where(okm, jnp.arange(MP), INVALID), mode="drop")
    return jnp.sum(okm), loop_pts, kp_match


def _search_and_fuse_group(
    cfg: SlamConfig, state: ms.MapState, kf_cur, group, loop_pt_mask,
    n_members: int = 16, max_loop_pts: int = 4096,
):
    """Project loop-side map points into each corrected-group keyframe and
    fuse (reference SearchAndFuse, src/LoopClosing.cc:698-727 +
    ORBmatcher::Fuse): a free keypoint gains the loop point as observation;
    a conflicting keypoint's point is REPLACED by the loop point globally.
    """
    from my_orb_slam2_tpu.models.local_mapping import _apply_replacements
    from my_orb_slam2_tpu.ops.projection import frustum_check, predict_scale

    cam = cfg.camera
    KF, N = state.kf_mp.shape
    MP = state.mp_pos.shape[0]
    sf = cfg.orb.scale_factor
    sf_tab = jnp.asarray([sf ** l for l in range(cfg.orb.n_levels)], jnp.float32)
    log_sf = float(np.log(sf))

    n_loop_pts = jnp.sum(loop_pt_mask & state.mp_valid, dtype=jnp.int32)
    cand = jnp.nonzero(
        loop_pt_mask & state.mp_valid, size=min(max_loop_pts, MP), fill_value=MP
    )[0]
    cand_ok0 = cand < MP
    cand = jnp.clip(cand, 0, MP - 1)

    # Group members by covisibility weight with the current keyframe
    # (current KF first).
    g_w = jnp.where(group, state.covis[kf_cur] + 1, 0)
    g_w = g_w.at[kf_cur].set(jnp.iinfo(jnp.int32).max)
    gw, gids = jax.lax.top_k(g_w, min(n_members, KF))
    g_ok = gw > 0
    # Surface both static caps: group members beyond the top-`n_members`
    # and loop points beyond `max_loop_pts` are silently skipped — count
    # them so drivers can see the truncation instead of inferring "covered".
    skipped_members = jnp.maximum(
        jnp.sum(group, dtype=jnp.int32) - jnp.sum(g_ok, dtype=jnp.int32), 0
    )
    skipped_pts = jnp.maximum(n_loop_pts - min(max_loop_pts, MP), 0)
    state = state._replace(
        cap_overflow=state.cap_overflow + skipped_members + skipped_pts
    )

    pos = jnp.take(state.mp_pos, cand, axis=0)
    nrm = jnp.take(state.mp_normal, cand, axis=0)
    dmin = jnp.take(state.mp_min_dist, cand) * 0.8
    dmax = jnp.take(state.mp_max_dist, cand) * 1.2
    desc = jnp.take(state.mp_desc, cand, axis=0)

    def member(carry, t):
        kf_mp_all, mp_n_obs, obs_kf, obs_slot, replace_map, n_over = carry
        g = jnp.maximum(gids[t], 0)
        ok_g = g_ok[t]
        already = jnp.any(obs_kf[cand] == g, axis=1)
        c_ok = cand_ok0 & ok_g & ~already
        T = state.kf_Tcw[g]
        okf, uvp, zp, distp, _ = frustum_check(
            T, pos, nrm, dmin, dmax,
            cam.fx, cam.fy, cam.cx, cam.cy,
            0.0, float(cam.width), 0.0, float(cam.height),
        )
        pred_lvl = predict_scale(distp, dmax, log_sf, cfg.orb.n_levels)
        radius = 4.0 * jnp.take(sf_tab, pred_lvl)  # th=4 (reference :711)
        urp = uvp[:, 0] - cam.bf / jnp.where(zp > 1e-6, zp, 1e9)
        idx, okm, _ = matching.search_by_projection(
            uvp, pred_lvl, c_ok & okf, desc, radius,
            state.kf_uv[g], state.kf_octave[g], state.kf_kp_valid[g],
            state.kf_desc[g],
            kp_ur=state.kf_ur[g], pred_ur=urp,
            level_lo=pred_lvl - 1, level_hi=pred_lvl + 1,
            max_dist=float(cfg.matcher.th_low), ratio=1.0,
        )
        existing = jnp.take(kf_mp_all[g], idx)
        add = okm & (existing < 0)
        obs_kf, obs_slot, did, nov = ms.obs_add_pairs(
            obs_kf, obs_slot, jnp.where(add, cand, INVALID),
            jnp.full(cand.shape, 0, jnp.int32) + g, idx, add,
        )
        row = kf_mp_all[g]
        row = row.at[jnp.where(did, idx, N)].set(
            jnp.where(did, cand, INVALID), mode="drop"
        )
        kf_mp_all = kf_mp_all.at[g].set(jnp.where(ok_g, row, kf_mp_all[g]))
        inc = jnp.where(jnp.take(state.kf_ur[g], idx) >= 0, 2, 1)
        mp_n_obs = mp_n_obs.at[jnp.where(did, cand, MP)].add(
            jnp.where(did, inc, 0), mode="drop"
        )
        # conflict: the loop point replaces the existing point globally
        conflict = okm & (existing >= 0) & (existing != cand)
        replace_map = replace_map.at[jnp.where(conflict, existing, 0)].set(
            jnp.where(conflict, cand, replace_map[0])
        )
        return (kf_mp_all, mp_n_obs, obs_kf, obs_slot, replace_map, n_over + nov), 0

    replace_map0 = jnp.arange(MP, dtype=jnp.int32)
    (kf_mp, mp_n_obs, obs_kf, obs_slot, replace_map, n_over), _ = jax.lax.scan(
        member,
        (state.kf_mp, state.mp_n_obs, state.mp_obs_kf, state.mp_obs_slot,
         replace_map0, jnp.zeros((), jnp.int32)),
        jnp.arange(gids.shape[0]),
    )
    state = state._replace(
        kf_mp=kf_mp, mp_n_obs=mp_n_obs,
        mp_obs_kf=obs_kf, mp_obs_slot=obs_slot,
        obs_overflow=state.obs_overflow + n_over,
    )
    for _ in range(3):
        replace_map = jnp.take(replace_map, replace_map)
    replaced = replace_map != jnp.arange(MP)
    # merge found/visible counters into the winner (MapPoint::Replace)
    state = state._replace(
        mp_found=state.mp_found
        + jnp.zeros((MP,), jnp.int32).at[jnp.where(replaced, replace_map, 0)].add(
            jnp.where(replaced, state.mp_found, 0)
        ),
        mp_visible=state.mp_visible
        + jnp.zeros((MP,), jnp.int32).at[jnp.where(replaced, replace_map, 0)].add(
            jnp.where(replaced, state.mp_visible, 0)
        ),
    )
    # Loop fusions can replace thousands of revisit duplicates at once —
    # keep the large loser budget here (rare event; the per-keyframe fuse
    # uses the small default).
    state = _apply_replacements(state, replace_map, replaced, max_losers=4096)
    state = ms.refresh_covisibility(state, jnp.where(g_ok, gids, -1))
    return state


# ---------------------------------------------------------------------------
# Loop correction
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def correct_loop_state(
    cfg: SlamConfig,
    state: ms.MapState,
    kf_cur,
    kf_cand,
    S_cur_cand,
    loop_pt_mask,
    kp_loop_match,  # (N,) map-point id matched to each current-KF keypoint
):
    """Apply the loop correction (reference CorrectLoop :489-696):

    - corrected Scw for the current covisibility group via relative poses
    - group map points remapped through old->corrected transforms
    - matched loop points replace the current keypoints' points
    - essential-graph optimization with the loop keyframe fixed
    - all keyframe poses + map points updated from the optimized graph
    """
    cam = cfg.camera
    KF, N = state.kf_mp.shape
    MP = state.mp_pos.shape[0]
    fix_scale = cfg.sensor.name != "MONOCULAR"

    pre_Tcw = state.kf_Tcw  # snapshot for edge measurements + remapping
    pre_covis = state.covis  # pre-fusion connectivity (new-connection test)
    T_cur = state.kf_Tcw[kf_cur]
    T_cand = state.kf_Tcw[kf_cand]
    Scw_corr = lie.sim3_mul(S_cur_cand, T_cand)  # corrected current pose

    group = (state.covis[kf_cur] >= 15).at[kf_cur].set(True) & state.kf_valid

    # Corrected Sim3 per group member: S_iw = T_ic * Scw_corr.
    T_wc = lie.se3_inverse(T_cur)

    def member_pose(i):
        T_ic = state.kf_Tcw[i] @ T_wc  # SE3 relative, scale 1
        return lie.sim3_mul(T_ic, Scw_corr)

    S_all = jax.vmap(member_pose)(jnp.arange(KF))  # (KF, 4, 4)
    S_corrected = jnp.where(group[:, None, None], S_all, pre_Tcw)

    # Remap the group's map points: p' = S_corr^-1 (S_old p) using the
    # observing member (first-come via scatter; reference marks each point
    # once with mnCorrectedByKF, :560-583).
    obs_sel = group[:, None] & (state.kf_mp >= 0) & state.kf_kp_valid
    corrector = jnp.full((MP + 1,), -1, jnp.int32).at[
        jnp.where(obs_sel, state.kf_mp, MP).reshape(-1)
    ].max(
        jnp.where(obs_sel, jnp.arange(KF)[:, None].repeat(N, 1), -1).reshape(-1)
    )[:MP]
    has_corr = corrector >= 0
    ci = jnp.maximum(corrector, 0)
    T_old = pre_Tcw[ci]  # (MP, 4, 4)
    S_new = S_corrected[ci]

    def remap(p, T_o, S_n):
        pc = lie.se3_apply(T_o, p)
        return lie.sim3_apply(lie.sim3_inverse(S_n), pc)

    p_corr = jax.vmap(remap)(state.mp_pos, T_old, S_new)
    mp_pos = jnp.where((has_corr & state.mp_valid)[:, None], p_corr, state.mp_pos)

    # Group keyframe poses -> SE3 (t/s, reference :597-606).
    Tcw_corr = jax.vmap(lie.sim3_to_se3)(S_corrected)
    kf_Tcw = jnp.where(group[:, None, None], Tcw_corr, state.kf_Tcw)
    state = state._replace(mp_pos=mp_pos, kf_Tcw=kf_Tcw)

    # Replace current keypoints' points with matched loop points
    # (reference :615-630: loop point wins). Skipped where the loop point
    # already observes kf_cur (would duplicate the per-KF observation).
    row = state.kf_mp[kf_cur]
    wc = jnp.clip(kp_loop_match, 0, MP - 1)
    already = jnp.any(state.mp_obs_kf[wc] == kf_cur, axis=1)
    do_rep = (
        (kp_loop_match >= 0)
        & ~already
        & state.kf_kp_valid[kf_cur]
        & (row != kp_loop_match)
    )
    # tombstone the replaced duplicates (clears their observations
    # everywhere, including this row's slots)
    dead = jnp.zeros((MP,), bool).at[
        jnp.where(do_rep & (row >= 0), row, 0)
    ].set(do_rep & (row >= 0))
    N_row = row.shape[0]
    state = ms.erase_map_points(state, dead, max_kill=N_row)
    # wire loop points into the row + index (winners unique per keypoint)
    new_row = jnp.where(do_rep, kp_loop_match, state.kf_mp[kf_cur])
    obs_kf, obs_slot, did, nov = ms.obs_add_pairs(
        state.mp_obs_kf, state.mp_obs_slot,
        jnp.where(do_rep, kp_loop_match, ms.INVALID),
        jnp.full((N_row,), 0, jnp.int32) + kf_cur,
        jnp.arange(N_row, dtype=jnp.int32), do_rep,
    )
    new_row = jnp.where(do_rep & ~did, ms.INVALID, new_row)
    state = state._replace(
        kf_mp=state.kf_mp.at[kf_cur].set(new_row),
        mp_obs_kf=obs_kf,
        mp_obs_slot=obs_slot,
        obs_overflow=state.obs_overflow + nov,
    )
    state = ms.recount_observations(state)

    # --- SearchAndFuse: project the loop-side points into EVERY corrected
    # keyframe and fuse (reference src/LoopClosing.cc:698-727, th=4; the
    # loop point always wins a conflict via MapPoint::Replace). ------------
    state = _search_and_fuse_group(
        cfg, state, kf_cur, group, loop_pt_mask
    )

    # Loop edge + refreshed covisibility for the current keyframe.
    state = ms.refresh_covisibility(
        state, jnp.array([kf_cur, kf_cand], jnp.int32)
    )
    loop_edges = state.loop_edges.at[kf_cur, kf_cand].set(True).at[kf_cand, kf_cur].set(True)
    state = state._replace(loop_edges=loop_edges)

    # Essential graph: vertices = corrected poses as Sim3; measurements from
    # pre-correction poses except the new loop constraint.
    S_vertices = jnp.where(
        group[:, None, None], S_corrected, pre_Tcw
    )
    ei, ej, Sji, e_ok = pose_graph.build_essential_edges(
        state.covis,
        state.kf_parent,
        loop_edges,
        state.kf_valid,
        pre_Tcw,
        min_weight=cfg.loop.essential_graph_min_weight,
    )
    # Measurement override ONLY for NEW loop connections — edges with a
    # corrected-group endpoint that did NOT exist before the loop fusion
    # (reference CorrectLoop :645-665 builds LoopConnections as post-fusion
    # covis minus previous neighbors minus group members; those edges get
    # corrected vScw measurements in OptimizeEssentialGraph while spanning
    # tree/old covis edges keep NonCorrectedSim3 — the accumulated drift
    # stays as residual the optimizer distributes around the loop).
    def fix_meas(a, b, sji):
        new_conn = (group[a] | group[b]) & (pre_covis[a, b] < 15) & ~(
            group[a] & group[b]
        )
        cross = new_conn | loop_edges[a, b]
        S_a = jnp.where(group[a], S_corrected[a], pre_Tcw[a])
        S_b = jnp.where(group[b], S_corrected[b], pre_Tcw[b])
        corr = lie.sim3_mul(S_b, lie.sim3_inverse(S_a))
        return jnp.where(cross, corr, sji)

    Sji = jax.vmap(fix_meas)(ei, ej, Sji)

    S_opt = pose_graph.optimize_pose_graph(
        S_vertices,
        state.kf_valid,
        jnp.zeros((KF,), bool).at[kf_cand].set(True),
        ei, ej, Sji, e_ok,
        n_iters=cfg.loop.pose_graph_iters,
        fix_scale=fix_scale,
    )
    # Apply: poses to SE3; points remapped through their reference keyframe
    # (reference :1036-1067).
    Tcw_opt = jax.vmap(lie.sim3_to_se3)(S_opt)
    ref = jnp.clip(state.mp_ref_kf, 0, KF - 1)
    T_old_ref = kf_Tcw[ref]  # post-group-correction, pre-pose-graph

    def remap2(p, T_o, S_n):
        pc = lie.se3_apply(T_o, p)
        return lie.sim3_apply(lie.sim3_inverse(S_n), pc)

    p2 = jax.vmap(remap2)(state.mp_pos, T_old_ref, S_opt[ref])
    mp_pos2 = jnp.where(state.mp_valid[:, None], p2, state.mp_pos)
    state = state._replace(
        kf_Tcw=jnp.where(state.kf_valid[:, None, None], Tcw_opt, state.kf_Tcw),
        mp_pos=mp_pos2,
    )
    state = ms.update_point_geometry(
        state, state.mp_valid, cfg.orb.scale_factor, cfg.orb.n_levels
    )
    return state


# ---------------------------------------------------------------------------
# Global bundle adjustment
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg", "max_obs"))
def extract_global_ba(cfg: SlamConfig, state: ms.MapState, max_obs: int = 262144):
    """Full-map BA problem: all valid keyframes + points + observations
    (reference GlobalBundleAdjustemnt, src/Optimizer.cc:41-46; KF0 fixed)."""
    KF, N = state.kf_mp.shape
    MP = state.mp_pos.shape[0]
    obs_ok = (state.kf_mp >= 0) & state.kf_kp_valid & state.kf_valid[:, None]
    lm = jnp.where(obs_ok, state.kf_mp, MP)
    obs_ok = obs_ok & jnp.take(
        jnp.concatenate([state.mp_valid, jnp.array([False])]), lm
    )
    flat = obs_ok.reshape(-1)
    sel = jnp.nonzero(flat, size=max_obs, fill_value=KF * N)[0]
    ok = sel < KF * N
    s = jnp.where(ok, sel, 0)
    o_kf = (s // N).astype(jnp.int32)
    o_slot = (s % N).astype(jnp.int32)
    o_pt = state.kf_mp[o_kf, o_slot]
    sf = cfg.orb.scale_factor
    inv_sigma2 = jnp.asarray(
        [1.0 / sf ** (2 * l) for l in range(cfg.orb.n_levels)], jnp.float32
    )[state.kf_octave[o_kf, o_slot]]
    prob = ba.BAProblem(
        cam_Tcw=state.kf_Tcw,
        cam_fixed=(~state.kf_valid).at[0].set(True),
        pt_pos=state.mp_pos,
        pt_valid=state.mp_valid,
        obs_cam=o_kf,
        obs_pt=jnp.where(ok, jnp.maximum(o_pt, 0), 0),
        obs_uv=state.kf_uv[o_kf, o_slot],
        obs_ur=jnp.where(ok, state.kf_ur[o_kf, o_slot], -1.0),
        obs_inv_sigma2=inv_sigma2,
        obs_mask=ok,
    )
    return prob


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def writeback_global_ba(cfg: SlamConfig, state: ms.MapState, prob: ba.BAProblem):
    state = state._replace(
        kf_Tcw=jnp.where(state.kf_valid[:, None, None], prob.cam_Tcw, state.kf_Tcw),
        mp_pos=jnp.where(state.mp_valid[:, None], prob.pt_pos, state.mp_pos),
    )
    return ms.update_point_geometry(
        state, state.mp_valid, cfg.orb.scale_factor, cfg.orb.n_levels
    )


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def writeback_global_ba_async(
    cfg: SlamConfig,
    state: ms.MapState,
    prob: ba.BAProblem,
    n_kf_start,
    mp_valid_start,
    mp_first_start,
):
    """Apply an asynchronously-computed global BA to a map that kept GROWING
    while the BA ran (reference RunGlobalBundleAdjustment,
    src/LoopClosing.cc:793-852):

    - keyframes that existed at GBA start take the optimized poses;
    - keyframes born during the BA are corrected THROUGH the spanning tree:
      T_child_new = (T_child_cur @ T_parent_cur^-1) @ T_parent_new,
      iterated so chains of new keyframes resolve;
    - points that existed at start (same slot, same creator) take the
      optimized positions; newer points remap through their reference
      keyframe's old->new transform.
    """
    KF, N = state.kf_mp.shape
    MP = state.mp_pos.shape[0]
    pre_Tcw = state.kf_Tcw
    corrected = (jnp.arange(KF) < n_kf_start) & state.kf_valid
    Tcw = jnp.where(corrected[:, None, None], prob.cam_Tcw, pre_Tcw)

    def prop(_, carry):
        Tcw, done = carry
        par = jnp.clip(state.kf_parent, 0, KF - 1)
        can = (
            state.kf_valid & ~done & (state.kf_parent >= 0) & jnp.take(done, par)
        )
        T_rel = jnp.einsum(
            "kij,kjl->kil", pre_Tcw, jax.vmap(lie.se3_inverse)(pre_Tcw[par])
        )
        T_new = jnp.einsum("kij,kjl->kil", T_rel, Tcw[par])
        Tcw = jnp.where(can[:, None, None], T_new, Tcw)
        return Tcw, done | can

    Tcw, done = jax.lax.fori_loop(0, 8, prop, (Tcw, corrected))

    ok_old = mp_valid_start & state.mp_valid & (state.mp_first_kf == mp_first_start)
    mp_pos = jnp.where(ok_old[:, None], prob.pt_pos, state.mp_pos)
    # newer points: p' = T_ref_new^-1 (T_ref_old p)
    ref = jnp.clip(state.mp_ref_kf, 0, KF - 1)
    pc = jnp.einsum("pij,pj->pi", pre_Tcw[ref, :3, :3], state.mp_pos) + pre_Tcw[ref, :3, 3]
    Twc_new = jax.vmap(lie.se3_inverse)(Tcw)
    p_new = jnp.einsum("pij,pj->pi", Twc_new[ref, :3, :3], pc) + Twc_new[ref, :3, 3]
    newer = state.mp_valid & ~ok_old & jnp.take(done, ref)
    mp_pos = jnp.where(newer[:, None], p_new, mp_pos)

    state = state._replace(kf_Tcw=Tcw, mp_pos=mp_pos)
    return ms.update_point_geometry(
        state, state.mp_valid, cfg.orb.scale_factor, cfg.orb.n_levels
    )


class AsyncGba:
    """A chunked global bundle adjustment running CONCURRENTLY with
    tracking: one LM iteration is dispatched per tick, so the device stream
    interleaves tracking work between BA kernels instead of stalling for the
    whole optimization (the single-stream analog of the reference's
    transient GBA thread, src/LoopClosing.cc:690,759-865).
    """

    def __init__(self, cfg: SlamConfig, state: ms.MapState, n_kf_start: int,
                 n_iters: int):
        self.cfg = cfg
        self.prob = extract_global_ba(cfg, state)
        self.n_kf_start = jnp.int32(n_kf_start)
        # Snapshots must be copies: the live state's buffers get donated to
        # later pipeline dispatches.
        self.mp_valid_start = state.mp_valid.copy()
        self.mp_first_start = state.mp_first_kf.copy()
        self.iters_left = n_iters
        self.lam = jnp.float32(1e-4)

    @property
    def finished(self) -> bool:
        return self.iters_left <= 0

    def step(self):
        """Dispatch one LM iteration (returns immediately; device-async)."""
        if self.iters_left <= 0:
            return
        cam = self.cfg.camera
        self.prob, self.lam = ba.bundle_adjust(
            self.prob, cam.fx, cam.fy, cam.cx, cam.cy, cam.bf,
            n_iters=1, cg_iters=64, lam0=self.lam, return_lam=True,
        )
        self.iters_left -= 1

    def apply(self, state: ms.MapState) -> ms.MapState:
        return writeback_global_ba_async(
            self.cfg, state, self.prob, self.n_kf_start,
            self.mp_valid_start, self.mp_first_start,
        )


# ---------------------------------------------------------------------------
# Host driver
# ---------------------------------------------------------------------------


class LoopCloser:
    def __init__(self, cfg: SlamConfig, vocab, run_global_ba: bool = True,
                 async_global_ba: bool = True):
        self.cfg = cfg
        self.vocab = vocab
        self.run_global_ba = run_global_ba
        # Async mode chunks GBA into one-LM-iteration dispatches advanced by
        # tick() (one per tracked frame), so a loop closure never stalls
        # tracking for the whole optimization (reference GBA thread).
        self.async_global_ba = async_global_ba
        self.pending_gba: Optional[AsyncGba] = None
        self.last_loop_kf = -(10 ** 9)
        # Device-resident consistency chains (lazily sized on first use).
        self._group_masks = None  # (C, KF) bool
        self._group_counts = None  # (C,) i32
        # Detection readbacks resolve `detect_depth` keyframes late: the
        # tracker keeps ~5 frames of dispatches in flight, so a 1-deep
        # pipeline forces the host to wait for the device to drain its whole
        # queue every keyframe (measured ~2 RTT-sized stalls per frame at
        # capacity — the single largest cost in the full-system drive). The
        # reference's loop thread lags its queue the same way.
        self.detect_depth = 4
        self._pending_detect = collections.deque()  # (kf_id, packed_dev)
        self._key = jax.random.PRNGKey(11)
        self.loops_closed = 0
        self.gbas_completed = 0

    def tick(self, state: ms.MapState):
        """Advance a pending asynchronous GBA by one LM iteration; apply it
        to the map when finished. Returns (state, applied: bool)."""
        gba = self.pending_gba
        if gba is None:
            return state, False
        if not gba.finished:
            gba.step()
            return state, False
        state = gba.apply(state)
        self.pending_gba = None
        self.gbas_completed += 1
        return state, True

    def process(self, state: ms.MapState, db: kdb.KfDatabase, kf_id: int,
                n_docs: int = None):
        """Run detection (+ correction if a loop is confirmed).

        Detection is PIPELINED `detect_depth` keyframes deep: this call
        dispatches the candidate+consistency computation for kf_id and
        resolves a PREVIOUS keyframe's readback (whose async host copy had
        several inter-keyframe intervals to land). A synchronous — or even
        1-deep — readback here waits for the device to drain the tracker's
        ~5-frame in-flight dispatch queue every keyframe; at KITTI capacity
        that stall was the single largest cost in the full-system drive
        (~2 tunnel round trips per frame). The reference's loop thread lags
        its queue the same way (src/LoopClosing.cc:57-91).

        n_docs: host-mirrored database size (avoids reading db.n_docs back
        from the device). Returns (state, closed: bool).
        """
        cfg = self.cfg
        if kf_id - self.last_loop_kf < cfg.loop.min_kfs_since_last_loop:
            return state, False
        if n_docs is None:
            n_docs = int(db.n_docs)  # non-pipelined callers only
        if n_docs < cfg.loop.min_kfs_since_last_loop:
            return state, False

        # One dispatch: BoW scores vs all keyframes, min-score floor over the
        # covisible neighbors, shared-word/accumulated-group gating
        # (reference :140-208).
        ids_dev, scores, _min_score = kdb.detect_loop_candidates(
            db, state, jnp.int32(kf_id)
        )
        # Covisibility consistency over consecutive keyframes (:186-247) —
        # group masks live on device; per keyframe the host reads back only
        # the (C,) candidate ids + eligibility bits.
        if self._group_masks is None:
            KF = state.kf_valid.shape[0]
            C = ids_dev.shape[0]
            self._group_masks = jnp.zeros((C, KF), bool)
            self._group_counts = jnp.zeros((C,), jnp.int32)
        masks, counts, packed_dev = consistency_check(
            state, ids_dev, self._group_masks, self._group_counts,
            cfg.loop.covisibility_consistency_th,
        )
        self._group_masks, self._group_counts = masks, counts
        try:
            packed_dev.copy_to_host_async()
        except Exception:
            pass
        self._pending_detect.append((kf_id, packed_dev))
        if len(self._pending_detect) <= self.detect_depth:
            return state, False
        return self._resolve_one_pending(state)

    def drain(self, state: ms.MapState):
        """Resolve ALL still-pending detections (sequence end / shutdown):
        short runs would otherwise lose loops detected in the last
        `detect_depth` keyframes. Returns (state, closed_any)."""
        closed_any = False
        while self._pending_detect:
            state, closed = self._resolve_one_pending(state)
            closed_any |= closed
        return state, closed_any

    def _resolve_one_pending(self, state: ms.MapState):
        """Pop the oldest pending detection readback and, if its candidates
        are consistency-eligible, run the Sim3 + correction accept path."""
        cfg = self.cfg
        det_kf, packed_dev = self._pending_detect.popleft()
        packed = np.asarray(packed_dev)
        c = packed.shape[0] // 2
        ids, enough_bits = packed[:c], packed[c:]
        if not (ids >= 0).any():
            return state, False
        enough = [int(i) for i, e in zip(ids, enough_bits) if e]
        if not enough:
            return state, False
        kf_id = det_kf  # the loop closes at the DETECTED keyframe

        # Sim3 per consistent candidate.
        for cand in enough:
            self._key, k1 = jax.random.split(self._key)
            ok, S12, n_inl, idx, mok = match_and_sim3(
                cfg, state, jnp.int32(kf_id), jnp.int32(cand), k1
            )
            if not bool(ok):
                continue
            n_total, loop_pts, kp_match = count_loop_point_matches(
                cfg, state, jnp.int32(kf_id), jnp.int32(cand), S12
            )
            if int(n_total) < cfg.loop.min_total_matches:
                continue
            # Accept: correct the loop.
            state = correct_loop_state(
                cfg, state, jnp.int32(kf_id), jnp.int32(cand),
                S12, loop_pts, kp_match,
            )
            if self.run_global_ba:
                if self.async_global_ba:
                    # A new loop aborts any still-running GBA (reference
                    # mnFullBAIdx guard, src/LoopClosing.cc:505) and starts
                    # a fresh one from the corrected map.
                    self.pending_gba = AsyncGba(
                        cfg, state, n_kf_start=int(np.asarray(state.n_kf)),
                        n_iters=cfg.loop.global_ba_iters,
                    )
                else:
                    cam = cfg.camera
                    prob = extract_global_ba(cfg, state)
                    prob = ba.bundle_adjust(
                        prob, cam.fx, cam.fy, cam.cx, cam.cy, cam.bf,
                        n_iters=cfg.loop.global_ba_iters, cg_iters=64,
                    )
                    state = writeback_global_ba(cfg, state, prob)
            self.last_loop_kf = kf_id
            self._group_masks = jnp.zeros_like(self._group_masks)
            self._group_counts = jnp.zeros_like(self._group_counts)
            self._pending_detect.clear()  # pre-closure detections are stale
            self.loops_closed += 1
            return state, True
        return state, False

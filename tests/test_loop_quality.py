"""Quantitative loop-closure quality: a synthetically DRIFTED loop map must
snap back to ground truth after correct_loop_state (Sim3 propagation +
SearchAndFuse + essential-graph optimization).

Unlike test_system's end-to-end loop run (where the accumulated drift is
small), this builds a map with large injected drift and asserts the
correction reduces keyframe ATE by a required factor — the reference's
CorrectLoop contract (src/LoopClosing.cc:489-696).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from my_orb_slam2_tpu.models import map_state as ms
from my_orb_slam2_tpu.models.loop_closing import correct_loop_state
from my_orb_slam2_tpu.ops import lie
from my_orb_slam2_tpu.utils.config import (
    CameraConfig, CapacityConfig, LoopConfig, SlamConfig, Sensor,
)
from tests.test_obs_index import check_obs_invariants

N_KP = 160  # keypoint capacity per keyframe


def _project(Tcw, pts, cam):
    pc = (Tcw[:3, :3] @ pts.T).T + Tcw[:3, 3]
    z = pc[:, 2]
    u = cam.fx * pc[:, 0] / z + cam.cx
    v = cam.fy * pc[:, 1] / z + cam.cy
    ur = u - cam.bf / z
    return np.stack([u, v], 1), ur, z


def _circle_gt(M, radius=5.0):
    poses = []
    Twc = np.eye(4)
    yaw = 2 * np.pi / M
    fwd = 2 * np.pi * radius / M
    for _ in range(M):
        poses.append(np.linalg.inv(Twc).astype(np.float32))
        adv = np.asarray(lie.se3_exp(jnp.asarray([0.0, 0.0, fwd, 0.0, yaw, 0.0])))
        Twc = Twc @ adv
    return poses


def _build_drifted_loop(cfg, M=20, drift_yaw=0.004, drift_t=0.01, seed=0):
    """Build a MapState for a circular loop with accumulated drift; the last
    keyframe revisits keyframe 0's area but observes DUPLICATE map points
    (as a real drifted revisit would). Returns (state, gt_poses (M,4,4),
    kp_loop_match (N,), loop_pt_mask (MP,))."""
    rng = np.random.default_rng(seed)
    cam = cfg.camera
    gt = _circle_gt(M)
    # Landmarks on a ring around the circle so every pose sees some.
    n_lm = 4000
    ang = rng.uniform(0, 2 * np.pi, n_lm)
    rad = rng.uniform(7.0, 16.0, n_lm)
    lm = np.stack(
        [rad * np.sin(ang), rng.uniform(-2, 2, n_lm), rad * np.cos(ang) - 5.0], 1
    )
    lm_desc = rng.integers(0, 2 ** 32, size=(n_lm, 8), dtype=np.uint32)

    # Accumulated drift: Twc_drift = Drift_i @ Twc_gt, Drift grows with i.
    drifts = [np.eye(4, dtype=np.float32)]
    for i in range(1, M):
        d = np.asarray(
            lie.se3_exp(jnp.asarray([drift_t, 0.0, 0.0, 0.0, drift_yaw, 0.0]))
        )
        drifts.append((drifts[-1] @ d).astype(np.float32))
    Tcw_drift = [
        (np.linalg.inv(drifts[i] @ np.linalg.inv(gt[i]))).astype(np.float32)
        for i in range(M)
    ]

    state = ms.init_map_state(cfg, N_KP)
    lid_to_slot = {}
    next_slot = 0
    MP = state.mp_pos.shape[0]
    mp_pos = np.zeros((MP, 3), np.float32)
    mp_desc = np.zeros((MP, 8), np.uint32)
    mp_valid = np.zeros(MP, bool)
    mp_ref = np.full(MP, -1, np.int32)
    kf_rows = np.full((M, N_KP), -1, np.int32)
    frames = []
    kf0_lids = None
    for i in range(M):
        uv, ur, z = _project(gt[i], lm, cam)
        vis = (
            (z > 1.0) & (z < 30.0)
            & (uv[:, 0] > 5) & (uv[:, 0] < cam.width - 5)
            & (uv[:, 1] > 5) & (uv[:, 1] < cam.height - 5)
        )
        ids = np.nonzero(vis)[0][:N_KP]
        if i == 0:
            kf0_lids = set(ids.tolist())
        row = np.full(N_KP, -1, np.int32)
        for n, lid in enumerate(ids):
            # The LAST keyframe re-observes KF0-AREA landmarks as NEW
            # duplicate points (the pre-loop-closure state of a drifted
            # revisit); landmarks it shares with its temporal neighbors stay
            # the same points, as real tracking would keep them.
            make_new = (
                i == M - 1 and lid in kf0_lids
            ) or (lid not in lid_to_slot)
            if make_new:
                slot = next_slot
                next_slot += 1
                # point placed consistently with the drifted first observer
                p_cam = (gt[i][:3, :3] @ lm[lid]) + gt[i][:3, 3]
                Twc_d = np.linalg.inv(Tcw_drift[i])
                mp_pos[slot] = Twc_d[:3, :3] @ p_cam + Twc_d[:3, 3]
                mp_desc[slot] = lm_desc[lid]
                mp_valid[slot] = True
                mp_ref[slot] = i
                if i < M - 1:
                    lid_to_slot[lid] = slot
                key_slot = slot
            else:
                key_slot = lid_to_slot[lid]
            row[n] = key_slot
        kf_rows[i] = row
        frames.append((ids, uv[ids], ur[ids], z[ids]))

    KF = state.kf_Tcw.shape[0]
    kf_Tcw = np.tile(np.eye(4, dtype=np.float32), (KF, 1, 1))
    kf_uv = np.zeros((KF, N_KP, 2), np.float32)
    kf_ur = np.full((KF, N_KP), -1.0, np.float32)
    kf_depth = np.full((KF, N_KP), -1.0, np.float32)
    kf_desc = np.zeros((KF, N_KP, 8), np.uint32)
    kf_kp_valid = np.zeros((KF, N_KP), bool)
    kf_valid = np.zeros(KF, bool)
    kf_parent = np.full(KF, -1, np.int32)
    for i in range(M):
        ids, uv, ur, z = frames[i]
        n = len(ids)
        kf_Tcw[i] = Tcw_drift[i]
        kf_uv[i, :n] = uv
        kf_ur[i, :n] = ur
        kf_depth[i, :n] = z
        kf_desc[i, :n] = lm_desc[ids]
        kf_kp_valid[i, :n] = True
        kf_valid[i] = True
        kf_parent[i] = i - 1 if i > 0 else -1
    state = state._replace(
        kf_Tcw=jnp.asarray(kf_Tcw),
        kf_uv=jnp.asarray(kf_uv),
        kf_ur=jnp.asarray(kf_ur),
        kf_depth=jnp.asarray(kf_depth),
        kf_desc=jnp.asarray(kf_desc),
        kf_kp_valid=jnp.asarray(kf_kp_valid),
        kf_valid=jnp.asarray(kf_valid),
        kf_parent=jnp.asarray(kf_parent),
        kf_mp=jnp.asarray(kf_rows if KF == M else np.vstack(
            [kf_rows, np.full((KF - M, N_KP), -1, np.int32)]
        )),
        mp_pos=jnp.asarray(mp_pos),
        mp_desc=jnp.asarray(mp_desc),
        mp_valid=jnp.asarray(mp_valid),
        mp_ref_kf=jnp.asarray(mp_ref),
        n_kf=jnp.asarray(M, jnp.int32),
    )
    state = ms.rebuild_obs_index(state)
    state = ms.refresh_covisibility(
        state, jnp.asarray(np.arange(KF, dtype=np.int32))
    )
    state = ms.update_point_geometry(
        state, state.mp_valid, cfg.orb.scale_factor, cfg.orb.n_levels
    )

    # Loop match: current keypoints -> the ORIGINAL KF0-side point slots.
    ids_last = frames[M - 1][0]
    kp_loop_match = np.full(N_KP, -1, np.int32)
    for n, lid in enumerate(ids_last):
        if lid in kf0_lids and lid in lid_to_slot:
            kp_loop_match[n] = lid_to_slot[lid]
    # Loop points: everything observed by keyframes 0..2.
    loop_pt_mask = np.zeros(MP, bool)
    for i in range(3):
        r = kf_rows[i]
        loop_pt_mask[r[r >= 0]] = True
    return state, np.stack(gt), jnp.asarray(kp_loop_match), jnp.asarray(loop_pt_mask)


def _kf_ate(state, gt, M):
    Tcw = np.asarray(state.kf_Tcw)[:M]
    c_est = np.stack([-T[:3, :3].T @ T[:3, 3] for T in Tcw])
    c_gt = np.stack([-T[:3, :3].T @ T[:3, 3] for T in gt])
    return float(np.sqrt(np.mean(np.sum((c_est - c_gt) ** 2, axis=1))))


def test_loop_correction_reduces_drift():
    M = 20
    cfg = SlamConfig(
        sensor=Sensor.STEREO,
        camera=CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=40.0, th_depth=40.0),
        capacity=CapacityConfig(max_keyframes=32, max_map_points=8192),
        loop=LoopConfig(essential_graph_min_weight=40),
    )
    state, gt, kp_loop_match, loop_pt_mask = _build_drifted_loop(cfg, M=M)
    ate_before = _kf_ate(state, gt, M)
    n_valid_before = int(np.asarray(state.mp_valid).sum())  # pre-donation
    assert ate_before > 0.05, "drift injection too small to test anything"

    # Ground-truth relative Sim3 (scale 1, stereo): current camera <- world
    # of the candidate side.
    S_cur_cand = jnp.asarray(
        (gt[M - 1] @ np.linalg.inv(gt[0])).astype(np.float32)
    )
    state2 = correct_loop_state(
        cfg, state, jnp.int32(M - 1), jnp.int32(0),
        S_cur_cand, loop_pt_mask, kp_loop_match,
    )
    ate_pg = _kf_ate(state2, gt, M)
    # The Sim3 propagation + essential graph must help (it redistributes the
    # loop error; the full snap-back is GBA's job, as in the reference).
    assert ate_pg < 0.85 * ate_before, (ate_before, ate_pg)

    # Full accept path: global BA after the pose graph
    # (reference RunGlobalBundleAdjustment, src/LoopClosing.cc:759-865).
    from my_orb_slam2_tpu.models.loop_closing import (
        extract_global_ba, writeback_global_ba,
    )
    from my_orb_slam2_tpu.ops import ba

    cam = cfg.camera
    prob = extract_global_ba(cfg, state2, max_obs=8192)
    prob = ba.bundle_adjust(
        prob, cam.fx, cam.fy, cam.cx, cam.cy, cam.bf, n_iters=15, cg_iters=64
    )
    state2 = writeback_global_ba(cfg, state2, prob)
    ate_after = _kf_ate(state2, gt, M)
    # Required improvement: loop closure + GBA removes most of the drift.
    assert ate_after < 0.35 * ate_before, (ate_before, ate_pg, ate_after)
    # loop edge recorded + duplicated revisit points fused away
    assert bool(np.asarray(state2.loop_edges)[M - 1, 0])
    # SearchAndFuse + replacement kept the index consistent
    check_obs_invariants(state2)
    # the duplicate points of the revisit keyframe: most were replaced by
    # the KF0-side originals
    n_valid_after = int(np.asarray(state2.mp_valid).sum())
    assert n_valid_after < n_valid_before, "no duplicates fused"


def test_async_gba_with_midflight_keyframe():
    """Chunked asynchronous GBA: keyframes inserted WHILE the BA runs get
    corrected through the spanning tree at apply time (reference
    RunGlobalBundleAdjustment propagation, src/LoopClosing.cc:793-852)."""
    from my_orb_slam2_tpu.models.loop_closing import AsyncGba

    M = 20
    cfg = SlamConfig(
        sensor=Sensor.STEREO,
        camera=CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=40.0, th_depth=40.0),
        capacity=CapacityConfig(max_keyframes=32, max_map_points=8192),
        loop=LoopConfig(essential_graph_min_weight=40),
    )
    state, gt, kp_loop_match, loop_pt_mask = _build_drifted_loop(cfg, M=M)
    ate_before = _kf_ate(state, gt, M)
    S_cur_cand = jnp.asarray((gt[M - 1] @ np.linalg.inv(gt[0])).astype(np.float32))
    state = correct_loop_state(
        cfg, state, jnp.int32(M - 1), jnp.int32(0),
        S_cur_cand, loop_pt_mask, kp_loop_match,
    )
    gba = AsyncGba(cfg, state, n_kf_start=M, n_iters=12)

    # A keyframe arrives while the BA runs: pose = parent pose shifted by a
    # known relative transform; parent = the (corrected) last keyframe.
    from my_orb_slam2_tpu.ops import lie
    T_rel = np.asarray(lie.se3_exp(jnp.asarray([0.05, 0.0, 0.2, 0.0, 0.02, 0.0])))
    parent_pose = np.asarray(state.kf_Tcw[M - 1])
    T_new = (T_rel @ parent_pose).astype(np.float32)
    state, kf_new = ms.insert_keyframe(
        state, jnp.asarray(T_new), jnp.int32(999), jnp.float32(9.9),
        state.kf_uv[M - 1], state.kf_ur[M - 1], state.kf_depth[M - 1],
        state.kf_octave[M - 1], state.kf_angle[M - 1], state.kf_desc[M - 1],
        state.kf_kp_valid[M - 1], state.kf_mp[M - 1],
    )
    # spanning-tree parent must be the previous keyframe for propagation
    assert int(state.kf_parent[M]) == M - 1

    for _ in range(12):
        gba.step()
    state2 = gba.apply(state)

    ate_after = _kf_ate(state2, gt, M)
    assert ate_after < 0.35 * ate_before, (ate_before, ate_after)
    # the mid-flight keyframe kept its relative pose to its (moved) parent
    T_parent_new = np.asarray(state2.kf_Tcw[M - 1])
    T_child_new = np.asarray(state2.kf_Tcw[M])
    rel_after = T_child_new @ np.linalg.inv(T_parent_new)
    np.testing.assert_allclose(rel_after, T_rel, atol=1e-4)

"""Tests for pose optimization and bundle adjustment on synthetic geometry."""

import numpy as np
import jax.numpy as jnp

from my_orb_slam2_tpu.ops import lie, pose_opt, ba

FX, FY, CX, CY, BF = 500.0, 500.0, 320.0, 240.0, 40.0


def synth_points(rng, n):
    return np.stack(
        [rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(4, 10, n)], axis=1
    )


def project_np(T, pts, noise, rng):
    pc = pts @ T[:3, :3].T + T[:3, 3]
    z = pc[:, 2]
    u = FX * pc[:, 0] / z + CX + rng.normal(size=len(pts)) * noise
    v = FY * pc[:, 1] / z + CY + rng.normal(size=len(pts)) * noise
    ur = u - BF / z + rng.normal(size=len(pts)) * noise
    return np.stack([u, v], 1), ur, z


def test_pose_optimization_converges(rng):
    n = 256
    pts = synth_points(rng, n)
    xi = np.concatenate([[0.2, -0.1, 0.3], rng.normal(size=3) * 0.1])
    T_true = np.asarray(lie.se3_exp(jnp.asarray(xi)))
    uv, ur, _ = project_np(T_true, pts, 0.5, rng)
    # 20% outliers
    out = rng.choice(n, 50, replace=False)
    uv[out] += rng.uniform(-80, 80, size=(50, 2))
    # Start from a perturbed pose
    T0 = np.asarray(lie.se3_exp(jnp.asarray(xi + rng.normal(size=6) * 0.05)))
    res = pose_opt.pose_optimization(
        jnp.asarray(T0), jnp.asarray(pts), jnp.asarray(uv), jnp.asarray(ur),
        jnp.ones(n), jnp.ones(n, bool), FX, FY, CX, CY, BF,
    )
    T_est = np.asarray(res["Tcw"])
    dT = np.asarray(lie.se3_log(jnp.asarray(T_est @ np.linalg.inv(T_true))))
    assert np.linalg.norm(dT[:3]) < 0.01, dT
    assert np.linalg.norm(dT[3:]) < 0.005, dT
    assert int(res["n_inliers"]) > 180


def test_pose_optimization_mono(rng):
    n = 200
    pts = synth_points(rng, n)
    xi = np.concatenate([[0.1, 0.0, 0.1], rng.normal(size=3) * 0.05])
    T_true = np.asarray(lie.se3_exp(jnp.asarray(xi)))
    uv, _, _ = project_np(T_true, pts, 0.3, rng)
    T0 = np.asarray(lie.se3_exp(jnp.asarray(xi + rng.normal(size=6) * 0.03)))
    res = pose_opt.pose_optimization(
        jnp.asarray(T0), jnp.asarray(pts), jnp.asarray(uv), jnp.full(n, -1.0),
        jnp.ones(n), jnp.ones(n, bool), FX, FY, CX, CY, BF,
    )
    dT = np.asarray(lie.se3_log(jnp.asarray(np.asarray(res["Tcw"]) @ np.linalg.inv(T_true))))
    assert np.linalg.norm(dT) < 0.01, dT


def make_ba_problem(rng, n_cams=8, n_pts=300, noise=0.4, perturb=0.02,
                    stereo=True, fix_first_two=True):
    pts = synth_points(rng, n_pts)
    cams_true = []
    for i in range(n_cams):
        xi = np.concatenate([[0.15 * i, 0.01 * i, 0.0], rng.normal(size=3) * 0.02])
        cams_true.append(np.asarray(lie.se3_exp(jnp.asarray(xi))))
    obs_cam, obs_pt, obs_uv, obs_ur = [], [], [], []
    for c, T in enumerate(cams_true):
        uv, ur, z = project_np(T, pts, noise, rng)
        sel = (uv[:, 0] > 0) & (uv[:, 0] < 640) & (uv[:, 1] > 0) & (uv[:, 1] < 480) & (z > 0.2)
        idx = np.nonzero(sel)[0]
        obs_cam.extend([c] * len(idx))
        obs_pt.extend(idx.tolist())
        obs_uv.extend(uv[idx].tolist())
        obs_ur.extend(ur[idx].tolist() if stereo else [-1.0] * len(idx))
    O = len(obs_cam)
    pad = 64 - O % 64
    cams0 = []
    for c, T in enumerate(cams_true):
        if fix_first_two and c < 2:
            cams0.append(T)
        else:
            d = np.asarray(lie.se3_exp(jnp.asarray(rng.normal(size=6) * perturb)))
            cams0.append(d @ T)
    pts0 = pts + rng.normal(size=pts.shape) * 0.05
    prob = ba.BAProblem(
        cam_Tcw=jnp.asarray(np.stack(cams0)),
        cam_fixed=jnp.asarray([c < 2 if fix_first_two else c < 1 for c in range(n_cams)]),
        pt_pos=jnp.asarray(pts0),
        pt_valid=jnp.ones(n_pts, bool),
        obs_cam=jnp.asarray(obs_cam + [0] * pad, jnp.int32),
        obs_pt=jnp.asarray(obs_pt + [0] * pad, jnp.int32),
        obs_uv=jnp.asarray(obs_uv + [[0.0, 0.0]] * pad),
        obs_ur=jnp.asarray(obs_ur + [-1.0] * pad),
        obs_inv_sigma2=jnp.ones(O + pad),
        obs_mask=jnp.asarray([True] * O + [False] * pad),
    )
    return prob, np.stack(cams_true), pts


def test_bundle_adjust_reduces_error(rng):
    prob, cams_true, pts_true = make_ba_problem(rng)
    out = ba.bundle_adjust(prob, FX, FY, CX, CY, BF, n_iters=12, cg_iters=32)
    err0 = err1 = 0.0
    for c in range(2, cams_true.shape[0]):
        d0 = np.asarray(lie.se3_log(jnp.asarray(np.asarray(prob.cam_Tcw[c]) @ np.linalg.inv(cams_true[c]))))
        d1 = np.asarray(lie.se3_log(jnp.asarray(np.asarray(out.cam_Tcw[c]) @ np.linalg.inv(cams_true[c]))))
        err0 += np.linalg.norm(d0)
        err1 += np.linalg.norm(d1)
    assert err1 < 0.25 * err0, (err0, err1)
    # Points should also improve
    p_err0 = np.linalg.norm(np.asarray(prob.pt_pos) - pts_true, axis=1).mean()
    p_err1 = np.linalg.norm(np.asarray(out.pt_pos) - pts_true, axis=1).mean()
    assert p_err1 < 0.5 * p_err0


def test_local_ba_with_outliers(rng):
    prob, cams_true, pts_true = make_ba_problem(rng, noise=0.3)
    # corrupt 10% of observations
    O = prob.obs_uv.shape[0]
    n_bad = O // 10
    bad = rng.choice(O, n_bad, replace=False)
    uv = np.array(prob.obs_uv)
    uv[bad] += rng.uniform(20, 60, size=(n_bad, 2))
    prob = prob._replace(obs_uv=jnp.asarray(uv))
    out, final_mask = ba.local_ba(prob, FX, FY, CX, CY, BF)
    # Outlier mask should exclude most corrupted observations
    kept_bad = np.asarray(final_mask)[bad].sum()
    assert kept_bad < n_bad * 0.2, kept_bad
    err1 = 0.0
    for c in range(2, cams_true.shape[0]):
        d1 = np.asarray(lie.se3_log(jnp.asarray(np.asarray(out.cam_Tcw[c]) @ np.linalg.inv(cams_true[c]))))
        err1 += np.linalg.norm(d1)
    assert err1 / (cams_true.shape[0] - 2) < 0.01, err1


def flat_to_dense(prob: ba.BAProblem, K: int = 8) -> ba.DenseBAProblem:
    """Repack a flat observation list into the (P, K) dense layout."""
    obs_cam = np.asarray(prob.obs_cam)
    obs_pt = np.asarray(prob.obs_pt)
    mask = np.asarray(prob.obs_mask)
    P = prob.pt_pos.shape[0]
    e_cam = np.full((P, K), -1, np.int32)
    e_uv = np.zeros((P, K, 2), np.float32)
    e_ur = np.full((P, K), -1.0, np.float32)
    e_is2 = np.ones((P, K), np.float32)
    e_mask = np.zeros((P, K), bool)
    cnt = np.zeros(P, int)
    uv = np.asarray(prob.obs_uv)
    ur = np.asarray(prob.obs_ur)
    is2 = np.asarray(prob.obs_inv_sigma2)
    for o in range(len(obs_cam)):
        if not mask[o]:
            continue
        p = obs_pt[o]
        if cnt[p] >= K:
            continue
        k = cnt[p]
        e_cam[p, k] = obs_cam[o]
        e_uv[p, k] = uv[o]
        e_ur[p, k] = ur[o]
        e_is2[p, k] = is2[o]
        e_mask[p, k] = True
        cnt[p] += 1
    return ba.DenseBAProblem(
        cam_Tcw=prob.cam_Tcw,
        cam_fixed=prob.cam_fixed,
        pt_pos=prob.pt_pos,
        pt_valid=prob.pt_valid,
        e_cam=jnp.asarray(e_cam),
        e_uv=jnp.asarray(e_uv),
        e_ur=jnp.asarray(e_ur),
        e_inv_sigma2=jnp.asarray(e_is2),
        e_mask=jnp.asarray(e_mask),
    )


def test_dense_ba_matches_flat(rng):
    """The dense (P, K) local BA must solve the same problem as the flat
    observation-list engine to the same quality."""
    prob, cams_true, pts_true = make_ba_problem(rng, noise=0.3)
    dense = flat_to_dense(prob)
    out_f = ba.bundle_adjust(prob, FX, FY, CX, CY, BF, n_iters=12, cg_iters=32)
    out_d = ba.bundle_adjust_dense(dense, FX, FY, CX, CY, BF, n_iters=12)
    for c in range(2, cams_true.shape[0]):
        d_f = np.asarray(lie.se3_log(jnp.asarray(
            np.asarray(out_f.cam_Tcw[c]) @ np.linalg.inv(cams_true[c]))))
        d_d = np.asarray(lie.se3_log(jnp.asarray(
            np.asarray(out_d.cam_Tcw[c]) @ np.linalg.inv(cams_true[c]))))
        assert np.linalg.norm(d_d) < max(1.5 * np.linalg.norm(d_f), 5e-3), (
            c, np.linalg.norm(d_f), np.linalg.norm(d_d))
    p_err_f = np.linalg.norm(np.asarray(out_f.pt_pos) - pts_true, axis=1).mean()
    p_err_d = np.linalg.norm(np.asarray(out_d.pt_pos) - pts_true, axis=1).mean()
    assert p_err_d < max(1.5 * p_err_f, 1e-2), (p_err_f, p_err_d)


def test_dense_local_ba_outlier_schedule(rng):
    """local_ba_dense reproduces the 5+prune+10 schedule: corrupted
    observations end up classified out and accuracy recovers."""
    prob, cams_true, pts_true = make_ba_problem(rng, noise=0.3)
    O = prob.obs_uv.shape[0]
    n_bad = O // 10
    bad = rng.choice(O, n_bad, replace=False)
    uv = np.array(prob.obs_uv)
    uv[bad] += rng.uniform(20, 60, size=(n_bad, 2))
    prob = prob._replace(obs_uv=jnp.asarray(uv))
    dense = flat_to_dense(prob)
    out, final_mask = ba.local_ba_dense(dense, FX, FY, CX, CY, BF)
    # recover which dense entries were corrupted
    err1 = 0.0
    for c in range(2, cams_true.shape[0]):
        d1 = np.asarray(lie.se3_log(jnp.asarray(
            np.asarray(out.cam_Tcw[c]) @ np.linalg.inv(cams_true[c]))))
        err1 += np.linalg.norm(d1)
    assert err1 / (cams_true.shape[0] - 2) < 0.01, err1
    # the corrupted fraction of entries is mostly masked out
    dropped = np.asarray(dense.e_mask).sum() - np.asarray(final_mask).sum()
    assert dropped >= n_bad * 0.6, (dropped, n_bad)

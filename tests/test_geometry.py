"""Tests for projection, triangulation, two-view estimation, Horn, EPnP
against synthetic scenes with known ground-truth poses."""

import numpy as np
import jax
import jax.numpy as jnp

from my_orb_slam2_tpu.ops import lie, projection, twoview, horn, epnp

FX, FY, CX, CY = 500.0, 500.0, 320.0, 240.0


def make_scene(rng, n=200, depth=(4.0, 10.0)):
    """Random 3D points in front of the first camera + a second camera."""
    pts = np.stack(
        [
            rng.uniform(-3, 3, n),
            rng.uniform(-2, 2, n),
            rng.uniform(depth[0], depth[1], n),
        ],
        axis=1,
    )
    # Second camera: small rotation + baseline translation
    phi = rng.normal(size=3) * 0.05
    t = np.array([0.5, 0.05, 0.1]) + rng.normal(size=3) * 0.02
    T2 = np.asarray(lie.se3_exp(jnp.asarray(np.concatenate([t, phi]))))
    return pts, np.eye(4), T2


def project_np(T, pts):
    pc = pts @ T[:3, :3].T + T[:3, 3]
    return np.stack([FX * pc[:, 0] / pc[:, 2] + CX, FY * pc[:, 1] / pc[:, 2] + CY], axis=1), pc[:, 2]


def test_project_backproject(rng):
    pts, T1, _ = make_scene(rng)
    uv, z = projection.project(jnp.asarray(T1), jnp.asarray(pts), FX, FY, CX, CY)
    back = projection.backproject(uv, z, FX, FY, CX, CY)
    np.testing.assert_allclose(np.asarray(back), pts, atol=1e-4)


def test_triangulate_dlt(rng):
    pts, T1, T2 = make_scene(rng, n=64)
    uv1, _ = project_np(T1, pts)
    uv2, _ = project_np(T2, pts)
    X, ok = projection.triangulate_dlt(
        jnp.asarray(T1), jnp.asarray(T2), jnp.asarray(uv1), jnp.asarray(uv2), FX, FY, CX, CY
    )
    assert bool(jnp.all(ok))
    np.testing.assert_allclose(np.asarray(X), pts, atol=1e-3)


def test_epipolar_distance_zero_for_true_matches(rng):
    pts, T1, T2 = make_scene(rng, n=64)
    uv1, _ = project_np(T1, pts)
    uv2, _ = project_np(T2, pts)
    F12 = projection.fundamental_from_poses(jnp.asarray(T1), jnp.asarray(T2), FX, FY, CX, CY)
    # dist of point-in-2 to epipolar line of point-in-1
    d2 = projection.epipolar_dist_sq(F12, jnp.asarray(uv1), jnp.asarray(uv2))
    assert float(jnp.max(d2)) < 1e-3


def test_ransac_fundamental_recovers_motion(rng):
    pts, T1, T2 = make_scene(rng, n=256)
    uv1, _ = project_np(T1, pts)
    uv2, _ = project_np(T2, pts)
    uv1 += rng.normal(size=uv1.shape) * 0.3
    uv2 += rng.normal(size=uv2.shape) * 0.3
    # 20% outliers
    n_out = 50
    uv2[:n_out] = rng.uniform(0, 480, size=(n_out, 2))
    mask = jnp.ones(256, bool)
    res = twoview.ransac_h_f(jax.random.PRNGKey(0), jnp.asarray(uv1), jnp.asarray(uv2), mask, n_iters=200)
    # F should win over H for general motion
    assert float(res["rh"]) < 0.5
    rec = twoview.reconstruct_f(res["F21"], jnp.asarray(uv1), jnp.asarray(uv2), res["inliers_f"], FX, FY, CX, CY)
    R_true = T2[:3, :3]
    t_true = T2[:3, 3] / np.linalg.norm(T2[:3, 3])
    R_err = np.asarray(rec["R"]) @ R_true.T
    ang = np.degrees(np.arccos(np.clip((np.trace(R_err) - 1) / 2, -1, 1)))
    assert ang < 1.0, f"rotation error {ang} deg"
    t_est = np.asarray(rec["t"])
    assert min(np.linalg.norm(t_est - t_true), np.linalg.norm(t_est + t_true)) < 0.05


def test_ransac_homography_on_plane(rng):
    # Planar scene: z = 5 plane
    n = 200
    pts = np.stack([rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), np.full(n, 5.0)], axis=1)
    phi = rng.normal(size=3) * 0.05
    t = np.array([0.4, 0.0, 0.05])
    T2 = np.asarray(lie.se3_exp(jnp.asarray(np.concatenate([t, phi]))))
    uv1, _ = project_np(np.eye(4), pts)
    uv2, _ = project_np(T2, pts)
    uv1 += rng.normal(size=uv1.shape) * 0.3
    uv2 += rng.normal(size=uv2.shape) * 0.3
    mask = jnp.ones(n, bool)
    res = twoview.ransac_h_f(jax.random.PRNGKey(1), jnp.asarray(uv1), jnp.asarray(uv2), mask, n_iters=200)
    assert float(res["rh"]) > 0.45  # homography dominates on a plane
    rec = twoview.reconstruct_h(res["H21"], jnp.asarray(uv1), jnp.asarray(uv2), res["inliers_h"], FX, FY, CX, CY)
    R_true = T2[:3, :3]
    R_err = np.asarray(rec["R"]) @ R_true.T
    ang = np.degrees(np.arccos(np.clip((np.trace(R_err) - 1) / 2, -1, 1)))
    assert bool(rec["success"])
    assert ang < 1.5, f"rotation error {ang} deg"


def test_horn_align(rng):
    pts2 = rng.normal(size=(50, 3))
    phi = rng.normal(size=3)
    R_true = np.asarray(lie.so3_exp(jnp.asarray(phi)))
    s_true = 1.7
    t_true = np.array([0.3, -0.2, 0.9])
    pts1 = s_true * pts2 @ R_true.T + t_true
    R, t, s = horn.horn_align(jnp.asarray(pts1), jnp.asarray(pts2))
    np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-5)
    np.testing.assert_allclose(float(s), s_true, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-5)
    # Fixed-scale variant
    pts1b = pts2 @ R_true.T + t_true
    R2, t2, s2 = horn.horn_align(jnp.asarray(pts1b), jnp.asarray(pts2), fix_scale=True)
    assert float(s2) == 1.0
    np.testing.assert_allclose(np.asarray(R2), R_true, atol=1e-5)


def test_ransac_sim3(rng):
    n = 128
    # Points in camera-2 frame
    p2 = np.stack([rng.uniform(-2, 2, n), rng.uniform(-2, 2, n), rng.uniform(3, 8, n)], axis=1)
    phi = rng.normal(size=3) * 0.3
    R_true = np.asarray(lie.so3_exp(jnp.asarray(phi)))
    s_true = 1.3
    t_true = np.array([0.5, 0.1, 0.4])
    p1 = s_true * p2 @ R_true.T + t_true
    # Corrupt 30% of correspondences
    n_out = 38
    p2_c = p2.copy()
    p2_c[:n_out] += rng.normal(size=(n_out, 3)) * 2.0
    uv1, _ = project_np(np.eye(4), p1)
    uv2, _ = project_np(np.eye(4), p2_c)
    res = horn.ransac_sim3(
        jax.random.PRNGKey(2),
        jnp.asarray(p1),
        jnp.asarray(p2_c),
        jnp.asarray(uv1),
        jnp.asarray(uv2),
        jnp.ones(n, bool),
        jnp.full(n, 9.21),
        jnp.full(n, 9.21),
        FX, FY, CX, CY,
        n_iters=200,
    )
    assert int(res["n_inliers"]) >= n - n_out - 5
    np.testing.assert_allclose(np.asarray(res["R"]), R_true, atol=1e-2)
    np.testing.assert_allclose(float(res["s"]), s_true, rtol=1e-2)


def test_epnp(rng):
    pts, _, T2 = make_scene(rng, n=64)
    uv2, _ = project_np(T2, pts)
    w = jnp.ones(64)
    R, t, err = epnp.epnp(jnp.asarray(pts), jnp.asarray(uv2), w, FX, FY, CX, CY)
    np.testing.assert_allclose(np.asarray(R), T2[:3, :3], atol=1e-3)
    np.testing.assert_allclose(np.asarray(t), T2[:3, 3], atol=1e-2)
    assert float(err) < 0.1


def test_ransac_epnp_with_outliers(rng):
    pts, _, T2 = make_scene(rng, n=256)
    uv2, _ = project_np(T2, pts)
    uv2 += rng.normal(size=uv2.shape) * 0.5
    n_out = 100
    uv2[:n_out] = rng.uniform(0, 480, size=(n_out, 2))
    res = epnp.ransac_epnp(
        jax.random.PRNGKey(3),
        jnp.asarray(pts),
        jnp.asarray(uv2),
        jnp.ones(256, bool),
        jnp.full(256, 5.991 * 4.0),
        FX, FY, CX, CY,
        n_iters=128,
    )
    assert int(res["n_inliers"]) > 130
    R_err = np.asarray(res["R"]) @ T2[:3, :3].T
    ang = np.degrees(np.arccos(np.clip((np.trace(R_err) - 1) / 2, -1, 1)))
    assert ang < 1.0
    np.testing.assert_allclose(np.asarray(res["t"]), T2[:3, 3], atol=0.05)


def test_undistort_roundtrip(rng):
    # Distort synthetically then undo
    k1, k2, p1, p2, k3 = 0.1, -0.05, 0.001, 0.001, 0.0
    uv = np.stack([rng.uniform(100, 540, 50), rng.uniform(100, 380, 50)], axis=1)
    x = (uv[:, 0] - CX) / FX
    y = (uv[:, 1] - CY) / FY
    r2 = x * x + y * y
    rad = 1 + k1 * r2 + k2 * r2 * r2 + k3 * r2 ** 3
    xd = x * rad + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * rad + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    uv_dist = np.stack([xd * FX + CX, yd * FY + CY], axis=1)
    out = projection.undistort_points(jnp.asarray(uv_dist), FX, FY, CX, CY, k1, k2, p1, p2, k3, iters=10)
    np.testing.assert_allclose(np.asarray(out), uv, atol=0.05)


def test_frustum_check(rng):
    pts, T1, _ = make_scene(rng, n=100)
    normals = -pts / np.linalg.norm(pts, axis=1, keepdims=True)  # toward camera... viewing dir = point - origin
    normals = -normals
    ok, uv, z, dist, vc = projection.frustum_check(
        jnp.asarray(T1), jnp.asarray(pts), jnp.asarray(normals),
        jnp.full(100, 0.1), jnp.full(100, 100.0),
        FX, FY, CX, CY, 0.0, 640.0, 0.0, 480.0,
    )
    # All synthetic points project inside the image by construction of make_scene
    uv_np, z_np = project_np(T1, pts)
    inside = (uv_np[:, 0] >= 0) & (uv_np[:, 0] < 640) & (uv_np[:, 1] >= 0) & (uv_np[:, 1] < 480)
    np.testing.assert_array_equal(np.asarray(ok), inside)

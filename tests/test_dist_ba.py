"""Distributed BA == single-chip BA (the multi-host correctness gate)."""

import numpy as np
import jax
import jax.numpy as jnp

from my_orb_slam2_tpu.ops import ba, lie
from my_orb_slam2_tpu.parallel.dist_ba import (
    make_camera_sharded_ba,
    make_distributed_ba,
    pad_problem_for_mesh,
    partition_by_camera,
)
from tests.test_optim import make_ba_problem, FX, FY, CX, CY, BF


def test_distributed_matches_single_chip(rng):
    prob, cams_true, pts_true = make_ba_problem(rng, n_cams=6, n_pts=200)
    mesh = jax.make_mesh((8,), ("obs",))
    prob_p = pad_problem_for_mesh(prob, 8)
    dist = make_distributed_ba(mesh)
    out_d = dist(prob_p, FX, FY, CX, CY, BF, n_iters=8, cg_iters=32)
    out_s = ba.bundle_adjust(prob_p, FX, FY, CX, CY, BF, n_iters=8, cg_iters=32)
    # Same algorithm, same data; only reduction order differs.
    np.testing.assert_allclose(
        np.asarray(out_d.cam_Tcw), np.asarray(out_s.cam_Tcw), atol=5e-3
    )
    err_d = np.linalg.norm(np.asarray(out_d.pt_pos) - np.asarray(out_s.pt_pos), axis=1)
    assert np.median(err_d) < 5e-3

    # And it actually solved the problem.
    for c in range(2, cams_true.shape[0]):
        d = np.asarray(
            lie.se3_log(jnp.asarray(np.asarray(out_d.cam_Tcw[c]) @ np.linalg.inv(cams_true[c])))
        )
        assert np.linalg.norm(d) < 0.02, (c, d)


def test_camera_sharded_matches_single_chip(rng):
    """Keyframe-axis (map-sharded) distributed BA == single-chip BA: the
    camera blocks and the Schur CG state live sharded; only landmark blocks
    and CG scalars cross the mesh (SURVEY §2.4 map-sharded model
    parallelism)."""
    prob, cams_true, pts_true = make_ba_problem(rng, n_cams=16, n_pts=300)
    mesh = jax.make_mesh((8,), ("kf",))
    prob_p, Cd = partition_by_camera(prob, 8)
    assert Cd == 2
    dist = make_camera_sharded_ba(mesh)
    out_d = dist(prob_p, FX, FY, CX, CY, BF, n_iters=8, cg_iters=48)
    out_s = ba.bundle_adjust(prob_p, FX, FY, CX, CY, BF, n_iters=8, cg_iters=48)
    C = cams_true.shape[0]
    cam_d = np.asarray(out_d.cam_Tcw)  # materialize the sharded output
    pt_d = np.asarray(out_d.pt_pos)
    np.testing.assert_allclose(cam_d[:C], np.asarray(out_s.cam_Tcw[:C]), atol=5e-3)
    err_d = np.linalg.norm(pt_d - np.asarray(out_s.pt_pos), axis=1)
    assert np.median(err_d) < 5e-3
    # ... and actually solved it.
    for c in range(2, C):
        d = np.asarray(
            lie.se3_log(jnp.asarray(cam_d[c] @ np.linalg.inv(cams_true[c])))
        )
        assert np.linalg.norm(d) < 0.02, (c, d)


def test_distributed_pose_graph_matches_single(rng):
    """Edge-sharded pose graph == single-device pose graph."""
    import jax.numpy as jnp
    from my_orb_slam2_tpu.ops import pose_graph
    from my_orb_slam2_tpu.parallel.dist_pose_graph import (
        make_distributed_pose_graph, pad_edges_for_mesh,
    )

    KF = 16
    gt, est = [], []
    T = np.eye(4)
    step = np.asarray(lie.se3_exp(jnp.asarray([0.0, 0.0, 0.5, 0.0, 2 * np.pi / KF, 0.0])))
    for k in range(KF):
        gt.append(np.linalg.inv(T))
        T = T @ np.linalg.inv(step)
    gt = np.stack(gt)
    est = [gt[0]]
    for k in range(1, KF):
        rel = gt[k] @ np.linalg.inv(gt[k - 1])
        noise = np.asarray(lie.se3_exp(jnp.asarray(rng.normal(size=6) * 0.01)))
        est.append(rel @ noise @ est[k - 1])
    est = np.stack(est)
    ei = list(range(KF - 1)) + [KF - 1]
    ej = list(range(1, KF)) + [0]
    meas = [
        (est[b] @ np.linalg.inv(est[a])) if (b == a + 1) else (gt[b] @ np.linalg.inv(gt[a]))
        for a, b in zip(ei, ej)
    ]
    args = (
        jnp.asarray(est),
        jnp.ones(KF, bool),
        jnp.zeros(KF, bool).at[0].set(True),
        jnp.asarray(ei, jnp.int32),
        jnp.asarray(ej, jnp.int32),
        jnp.asarray(np.stack(meas)),
        jnp.ones(len(ei), bool),
    )
    single = pose_graph.optimize_pose_graph(*args, n_iters=15, fix_scale=True)
    mesh = jax.make_mesh((8,), ("edges",))
    pe = pad_edges_for_mesh(*args[3:], 8)
    dist = make_distributed_pose_graph(mesh)
    multi = dist(args[0], args[1], args[2], *pe, n_iters=15, fix_scale=True)
    np.testing.assert_allclose(np.asarray(single), np.asarray(multi), atol=2e-3)


def test_distributed_frontend_matches_single():
    """Batch-of-frames extraction sharded over the mesh must equal
    per-image single-device extraction (embarrassingly parallel dp axis)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from my_orb_slam2_tpu.ops.frontend import OrbExtractor
    from my_orb_slam2_tpu.parallel.dist_frontend import make_batch_extractor
    from my_orb_slam2_tpu.utils.config import OrbConfig

    H, W = 96, 128
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, size=(8, H, W)).astype(np.uint8)
    # blobs so FAST finds corners
    for b in range(8):
        for _ in range(30):
            y, x = rng.integers(10, H - 10), rng.integers(10, W - 10)
            imgs[b, y - 2 : y + 3, x - 2 : x + 3] = rng.integers(0, 255)

    cfg = OrbConfig(n_features=64, n_levels=3)
    ex = OrbExtractor(cfg, H, W)
    mesh = jax.make_mesh((8,), ("batch",))
    run = make_batch_extractor(mesh, ex)
    kps = run(jnp.asarray(imgs))
    uv = np.asarray(kps.uv)
    valid = np.asarray(kps.valid)
    desc = np.asarray(kps.desc)
    for b in range(8):
        ref, _ = ex(jnp.asarray(imgs[b], jnp.float32))
        np.testing.assert_allclose(uv[b], np.asarray(ref.uv), atol=1e-4)
        np.testing.assert_array_equal(valid[b], np.asarray(ref.valid))
        np.testing.assert_array_equal(desc[b], np.asarray(ref.desc))

"""Distributed BA == single-chip BA (the multi-host correctness gate)."""

import numpy as np
import jax
import jax.numpy as jnp

from my_orb_slam2_tpu.ops import ba, lie
from my_orb_slam2_tpu.parallel.dist_ba import make_distributed_ba, pad_problem_for_mesh
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

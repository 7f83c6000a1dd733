"""Fast micro-probe for the dense local-BA LM step: synthesizes a
capacity-shaped DenseBAProblem directly (no map build) and times chained
dispatches (RTT amortized over the chain), so kernel-level changes to
ops/ba.py can be measured in ~1 minute instead of a full capacity rebuild.

Run: python tools/probe_ba_micro.py [--iters-list 1,2,4,8]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FX = FY = 718.856
CX, CY, BF = 607.19, 185.21, 386.1448


def make_problem(C=32, P=4096, K=8, n_free=16, seed=0):
    import jax.numpy as jnp

    from my_orb_slam2_tpu.ops import ba, lie

    rng = np.random.default_rng(seed)
    pts = np.stack([
        rng.uniform(-20, 20, P), rng.uniform(-5, 5, P), rng.uniform(5, 80, P)
    ], 1).astype(np.float32)
    cams = []
    for c in range(C):
        xi = np.concatenate([[0.0, 0.0, 0.5 * c], rng.normal(size=3) * 0.01])
        cams.append(np.asarray(lie.se3_exp(jnp.asarray(xi)), np.float32))
    cams = np.stack(cams)
    e_cam = rng.integers(0, C, (P, K)).astype(np.int32)
    e_mask = rng.random((P, K)) < 0.5
    # project to build consistent uv
    T = cams[e_cam.reshape(-1)].reshape(P, K, 4, 4)
    pc = np.einsum("pkij,pj->pki", T[..., :3, :3], pts) + T[..., :3, 3]
    z = np.maximum(pc[..., 2], 0.5)
    u = FX * pc[..., 0] / z + CX + rng.normal(0, 0.5, (P, K))
    v = FY * pc[..., 1] / z + CY + rng.normal(0, 0.5, (P, K))
    ur = u - BF / z
    prob = ba.DenseBAProblem(
        cam_Tcw=jnp.asarray(cams),
        cam_fixed=jnp.asarray(np.arange(C) >= n_free),
        pt_pos=jnp.asarray(pts + rng.normal(0, 0.05, pts.shape)),
        pt_valid=jnp.ones(P, bool),
        e_cam=jnp.asarray(np.where(e_mask, e_cam, -1)),
        e_uv=jnp.asarray(np.stack([u, v], -1), jnp.float32),
        e_ur=jnp.asarray(ur, jnp.float32),
        e_inv_sigma2=jnp.ones((P, K), jnp.float32),
        e_mask=jnp.asarray(e_mask),
    )
    return prob


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters-list", default="1,3,7")
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args()
    import jax

    from my_orb_slam2_tpu.ops import ba

    prob = make_problem()

    for n in (int(x) for x in args.iters_list.split(",")):
        def run():
            out = ba.bundle_adjust_dense(prob, FX, FY, CX, CY, BF, n_iters=n, n_free=16)
            out.cam_Tcw.block_until_ready()
        run(); run()  # compile + warm
        t0 = time.perf_counter()
        for _ in range(args.reps):
            run()
        ms = (time.perf_counter() - t0) / args.reps * 1000
        print(f"ba_dense n_iters={n}: {ms:8.1f} ms  (runs {n + 1} lm_steps)",
              flush=True)
    def run_cls():
        m = ba.classify_outliers_dense(prob, FX, FY, CX, CY, BF)
        m.block_until_ready()
    run_cls(); run_cls()
    t0 = time.perf_counter()
    for _ in range(args.reps):
        run_cls()
    print(f"classify: {(time.perf_counter()-t0)/args.reps*1000:8.1f} ms")


if __name__ == "__main__":
    main()

"""LM-step cost experiments at capacity shapes: problem-size trims and
multi-step fusion, plus XLA cost analysis of the baseline step.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_lm_variants.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from tools.capacity_state import build_or_load
    from my_orb_slam2_tpu.models import local_mapping as lm
    from my_orb_slam2_tpu.ops import ba

    cfg, state, frames, info = build_or_load()
    cam = cfg.camera
    kf_id = jnp.int32(info["n_kf"] - 1)
    prob, aux = lm.extract_local_ba_dense(cfg, state, kf_id)
    jax.block_until_ready(prob.cam_Tcw)

    def timeit(fn, *args, reps=8, warm=3):
        out = None
        for _ in range(warm):
            out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps * 1000.0

    fxfyc = (cam.fx, cam.fy, cam.cx, cam.cy, cam.bf)

    def mk_step(n_free):
        def f(p):
            return ba.lm_step_dense(
                p, p.cam_Tcw, p.pt_pos, jnp.float32(3.4e38), jnp.float32(1e-4),
                *fxfyc, n_free=n_free,
            )
        return jax.jit(f)

    step = mk_step(16)
    print(f"step P=4096 K=16      {timeit(step, prob):7.2f} ms")

    # cost analysis
    lowered = jax.jit(
        lambda p: ba.lm_step_dense(
            p, p.cam_Tcw, p.pt_pos, jnp.float32(3.4e38), jnp.float32(1e-4),
            *fxfyc, n_free=16,
        )
    ).lower(prob)
    comp = lowered.compile()
    try:
        ca = comp.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        keys = [
            "flops", "bytes accessed", "bytes accessed output",
            "bytes accessed operand 0 {}",
        ]
        for k in sorted(ca):
            if "bytes" in k and ca[k] > 1e6 or k == "flops":
                print(f"  cost[{k}] = {ca[k]/1e6:.1f} M")
    except Exception as e:
        print("cost analysis failed:", e)

    # trimmed problem: slice P and K
    def trim(p, P2, K2):
        return ba.DenseBAProblem(
            cam_Tcw=p.cam_Tcw, cam_fixed=p.cam_fixed,
            pt_pos=p.pt_pos[:P2], pt_valid=p.pt_valid[:P2],
            e_cam=p.e_cam[:P2, :K2], e_uv=p.e_uv[:P2, :K2],
            e_ur=p.e_ur[:P2, :K2], e_inv_sigma2=p.e_inv_sigma2[:P2, :K2],
            e_mask=p.e_mask[:P2, :K2],
        )

    p3 = jax.tree.map(lambda x: x.copy(), trim(prob, 3072, 12))
    jax.block_until_ready(p3.cam_Tcw)
    print(f"step P=3072 K=12      {timeit(step, p3):7.2f} ms")
    p2 = jax.tree.map(lambda x: x.copy(), trim(prob, 2048, 12))
    print(f"step P=2048 K=12      {timeit(step, p2):7.2f} ms")

    # multi-step fused
    def mk_multi(n):
        def f(p):
            return ba.bundle_adjust_dense(
                p, *fxfyc, n_iters=n - 1, use_huber=True, n_free=16,
            )
        return jax.jit(f)

    for n in (2, 4):
        m = mk_multi(n)
        t = timeit(m, prob)
        print(f"fused x{n} steps       {t:7.2f} ms  ({t/n:.2f}/step)")


if __name__ == "__main__":
    main()

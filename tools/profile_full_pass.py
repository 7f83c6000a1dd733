"""Stage- and kernel-level profile of the mapper's full pass at KITTI
capacity, using the cached capacity state (tools/capacity_state.py).

Times each dispatched stage (fuse A/B/epilogue, extract, LM steps,
classify, writeback, cull) with a single block per stage chain, then dumps
the top device kernels of the slowest stage via jax.profiler.

Run: python tools/profile_full_pass.py [--profile-stage fuse_a]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile-stage", default="")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tools.capacity_state import build_or_load
    from my_orb_slam2_tpu.models import local_mapping as lm
    from my_orb_slam2_tpu.models import map_state as ms
    from my_orb_slam2_tpu.ops import ba

    cfg, state, frames, info = build_or_load()
    cam = cfg.camera
    kf_id = jnp.int32(info["n_kf"] - 1)

    def copy_state():
        return jax.tree.map(lambda x: x.copy(), state)

    def timeit(fn, reps=args.reps, warm=2):
        for _ in range(warm):
            fn()
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        return (time.perf_counter() - t0) / reps * 1000.0

    # RTT floor
    triv = jax.jit(lambda s: s.mp_n_obs + 1)
    floor = timeit(lambda: triv(state).block_until_ready())
    print(f"rtt_floor           {floor:8.1f}")

    stages = {}

    def t_copy():
        s2 = copy_state()
        s2.mp_valid.block_until_ready()
    stages["state_copy_baseline"] = t_copy

    def t_fuse_a():
        s2, rm, tgts, srcm = lm._fuse_dir_a(cfg, copy_state(), kf_id, 20)
        s2.mp_valid.block_until_ready()
    stages["fuse_a"] = t_fuse_a

    s_a, rm_a, tgts_a, srcm_a = lm._fuse_dir_a(cfg, copy_state(), kf_id, 20)
    jax.block_until_ready(s_a.mp_valid)

    def t_fuse_b():
        s2, rm, tmask = lm._fuse_dir_b(
            cfg, jax.tree.map(lambda x: x.copy(), s_a), kf_id, tgts_a, rm_a, 4096
        )
        s2.mp_valid.block_until_ready()
    stages["fuse_b"] = t_fuse_b

    s_b, rm_b, tmask_b = lm._fuse_dir_b(
        cfg, jax.tree.map(lambda x: x.copy(), s_a), kf_id, tgts_a, rm_a, 4096
    )
    jax.block_until_ready(s_b.mp_valid)

    def t_fuse_ep():
        s2 = lm._fuse_epilogue(
            cfg, jax.tree.map(lambda x: x.copy(), s_b), kf_id, rm_b, tgts_a,
            srcm_a, tmask_b, False, 4096,
        )
        s2.mp_valid.block_until_ready()
    stages["fuse_epilogue"] = t_fuse_ep

    s_f = lm._fuse_epilogue(
        cfg, jax.tree.map(lambda x: x.copy(), s_b), kf_id, rm_b, tgts_a,
        srcm_a, tmask_b, False, 4096,
    )
    jax.block_until_ready(s_f.mp_valid)

    def t_extract():
        p, a = lm.extract_local_ba_dense(cfg, s_f, kf_id)
        p.cam_Tcw.block_until_ready()
    stages["extract"] = t_extract

    prob, aux = lm.extract_local_ba_dense(cfg, s_f, kf_id)
    jax.block_until_ready(prob.cam_Tcw)
    n_free = prob.cam_Tcw.shape[0] // 2

    def t_lm10():
        p = prob
        cam_bak, pt_bak = p.cam_Tcw, p.pt_pos
        cost, lam = jnp.float32(3.4e38), jnp.float32(1e-4)
        for _ in range(10):
            p, cam_bak, pt_bak, cost, lam = ba.lm_step_dense(
                p, cam_bak, pt_bak, cost, lam,
                cam.fx, cam.fy, cam.cx, cam.cy, cam.bf, n_free=n_free,
            )
        cam_bak.block_until_ready()
    stages["lm_x10"] = t_lm10

    def t_classify():
        m = ba.classify_outliers_dense(prob, cam.fx, cam.fy, cam.cx, cam.cy, cam.bf)
        m.block_until_ready()
    stages["classify"] = t_classify

    final_mask = ba.classify_outliers_dense(
        prob, cam.fx, cam.fy, cam.cx, cam.cy, cam.bf
    )
    aux_w = dict(aux)

    def t_writeback():
        s2 = lm.writeback_local_ba_dense(
            cfg, jax.tree.map(lambda x: x.copy(), s_f), prob, aux_w, final_mask
        )
        s2.mp_valid.block_until_ready()
    stages["writeback"] = t_writeback

    def t_cull():
        s2, _ = lm.keyframe_culling(
            cfg, jax.tree.map(lambda x: x.copy(), s_f), kf_id
        )
        s2.mp_valid.block_until_ready()
    stages["cull"] = t_cull

    def t_light():
        s2, _n = lm.light_pass(cfg, copy_state(), kf_id, 10)
        s2.mp_valid.block_until_ready()
    stages["light_pass"] = t_light

    for name, fn in stages.items():
        print(f"{name:18s} {timeit(fn):8.1f}", flush=True)

    if args.profile_stage:
        fn = stages[args.profile_stage]
        fn()
        shutil.rmtree("/tmp/jx_fp", ignore_errors=True)
        with jax.profiler.trace("/tmp/jx_fp"):
            fn()
        f = glob.glob("/tmp/jx_fp/**/*.trace.json.gz", recursive=True)[0]
        d = json.load(gzip.open(f))
        tot = collections.Counter(); cnt = collections.Counter()
        for e in d.get("traceEvents", []):
            if e.get("ph") == "X":
                tot[e.get("name", "")] += e.get("dur", 0)
                cnt[e.get("name", "")] += 1
        print(f"--- top kernels in {args.profile_stage} ---")
        for name, us in tot.most_common(25):
            print(f"{us/1000:9.2f} ms  x{cnt[name]:4d}  {name[:90]}")


if __name__ == "__main__":
    main()

"""Device-kernel profile of ONE dense LM step at capacity shapes.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_lm_kernels.py
"""

import collections
import glob
import gzip
import json
import os
import shutil
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

    step = jax.jit(
        lambda p: ba.lm_step_dense(
            p, p.cam_Tcw, p.pt_pos, jnp.float32(3.4e38), jnp.float32(1e-4),
            cam.fx, cam.fy, cam.cx, cam.cy, cam.bf, n_free=16,
        )
    )
    for _ in range(3):
        out = step(prob)
    jax.block_until_ready(out[0].cam_Tcw)
    t0 = time.perf_counter()
    for _ in range(8):
        out = step(prob)
    jax.block_until_ready(out[0].cam_Tcw)
    print(f"lm_step: {(time.perf_counter() - t0) / 8 * 1000:.2f} ms")

    d = "/tmp/lm_trace"
    shutil.rmtree(d, ignore_errors=True)
    with jax.profiler.trace(d):
        for _ in range(4):
            out = step(prob)
        jax.block_until_ready(out[0].cam_Tcw)

    files = glob.glob(os.path.join(d, "**", "*.trace.json.gz"), recursive=True)
    agg = collections.Counter()
    cnt = collections.Counter()
    for fp in files:
        with gzip.open(fp, "rt") as f:
            tr = json.load(f)
        for ev in tr.get("traceEvents", []):
            if ev.get("ph") == "X" and "dur" in ev:
                name = ev.get("name", "?")
                agg[name] += ev["dur"] / 1000.0
                cnt[name] += 1
    for name, ms in agg.most_common(28):
        print(f"{ms:9.2f} ms x{cnt[name]:4d}  {name[:90]}")


if __name__ == "__main__":
    main()

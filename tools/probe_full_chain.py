"""TRUE device time of each full-pass stage at capacity: N chained enqueues
behind one sync (same methodology as probe_frame_budget, which bounds fps).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_full_chain.py
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

    def chain(fn, n=6, warm=2):
        out = None
        for _ in range(warm):
            out = fn()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
            del out
            out = None
        last = fn()
        jax.block_until_ready(last)
        return (time.perf_counter() - t0) / (n + 1) * 1000.0

    box = {"s": state}

    def run_fuse():
        st, tgts = lm.fuse_neighbors(
            cfg, box["s"], kf_id, n_targets=20, refresh_derived=False
        )
        box["s"] = st
        return tgts

    print(f"fuse(all 3 stages) {chain(run_fuse):7.1f} ms")
    state = box["s"]

    def run_extract():
        prob, aux = lm.extract_local_ba_dense(cfg, state, kf_id)
        return prob.e_mask

    print(f"extract            {chain(run_extract):7.1f} ms")

    prob0, aux = lm.extract_local_ba_dense(cfg, state, kf_id)
    jax.block_until_ready(prob0.e_mask)

    def run_ba():
        p, m = ba.local_ba_dense(
            prob0, cam.fx, cam.fy, cam.cx, cam.cy, cam.bf,
            iters1=cfg.mapping.local_ba_iters1,
            iters2=cfg.mapping.local_ba_iters2,
            n_free=prob0.cam_Tcw.shape[0] // 2,
        )
        return m

    print(f"ba (3+4 fused x2)  {chain(run_ba):7.1f} ms")

    prob1, final_mask = ba.local_ba_dense(
        prob0, cam.fx, cam.fy, cam.cx, cam.cy, cam.bf,
        iters1=cfg.mapping.local_ba_iters1,
        iters2=cfg.mapping.local_ba_iters2,
        n_free=prob0.cam_Tcw.shape[0] // 2,
    )
    jax.block_until_ready(final_mask)

    def run_writeback():
        st = lm.writeback_local_ba_dense(
            cfg, box["s"], prob1, aux, final_mask
        )
        box["s"] = st
        return st.n_kf

    box["s"] = state
    print(f"writeback          {chain(run_writeback):7.1f} ms")
    state = box["s"]

    def run_cull():
        st, culled = lm.keyframe_culling(cfg, box["s"], kf_id)
        box["s"] = st
        return culled

    box["s"] = state
    print(f"cull               {chain(run_cull):7.1f} ms")


if __name__ == "__main__":
    main()

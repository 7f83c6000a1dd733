"""Sub-stage timing of writeback_local_ba_dense + keyframe_culling at KITTI
capacity: isolates the descriptor refresh, geometry refresh, covis refresh,
obs compaction and cull redundancy to find the dominant fusion.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_writeback_parts.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from tools.capacity_state import build_or_load
    from my_orb_slam2_tpu.models import local_mapping as lm
    from my_orb_slam2_tpu.models import map_state as ms
    from my_orb_slam2_tpu.ops import ba

    cfg, state, frames, info = build_or_load()
    cam = cfg.camera
    kf_id = jnp.int32(info["n_kf"] - 1)
    MP = state.mp_pos.shape[0]

    prob, aux = lm.extract_local_ba_dense(cfg, state, kf_id)
    prob, final_mask = ba.local_ba_dense(
        prob, cam.fx, cam.fy, cam.cx, cam.cy, cam.bf,
        iters1=cfg.mapping.local_ba_iters1,
        iters2=cfg.mapping.local_ba_iters2,
        n_free=prob.cam_Tcw.shape[0] // 2,
    )
    jax.block_until_ready(final_mask)
    pt_ids = aux["pt_ids"]
    ok_pt = pt_ids < MP

    def timeit(fn, reps=6, warm=2):
        out = None
        for _ in range(warm):
            out = fn()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps * 1000.0

    # RTT floor
    triv = jax.jit(lambda s: s.mp_n_obs + 1)
    print(f"rtt_floor            {timeit(lambda: triv(state)):8.1f}")

    refresh_desc = jax.jit(lm._refresh_descriptors_dense)
    print(f"refresh_descriptors  {timeit(lambda: refresh_desc(state, pt_ids, ok_pt)):8.1f}")

    geom = jax.jit(
        lambda s: ms.update_point_geometry_ids(
            s, pt_ids, ok_pt, cfg.orb.scale_factor, cfg.orb.n_levels
        )
    )
    print(f"update_geometry      {timeit(lambda: geom(state)):8.1f}")

    refresh_rows = jnp.where(aux["cam_ok"], aux["cam_ids"], -1)
    covis = jax.jit(lambda s: ms.refresh_covisibility(s, refresh_rows))
    print(f"refresh_covis        {timeit(lambda: covis(state)):8.1f}")

    compact = jax.jit(
        lambda okf, osl: ms.obs_compact_rows(
            okf, osl, jnp.where(ok_pt, pt_ids, MP), ok_pt
        )
    )
    print(f"obs_compact_rows     {timeit(lambda: compact(state.mp_obs_kf, state.mp_obs_slot)):8.1f}")

    # descriptor-refresh internals: the (P, K) kf_desc gather vs the
    # (P, K, K) popcount-median
    ptc = jnp.clip(pt_ids, 0, MP - 1)
    KF, N = state.kf_mp.shape

    @jax.jit
    def desc_gather(s):
        e_kf = s.mp_obs_kf[ptc]
        e_slot = s.mp_obs_slot[ptc]
        return s.kf_desc[jnp.clip(e_kf, 0, KF - 1), jnp.clip(e_slot, 0, N - 1)]

    print(f"  desc gather only   {timeit(lambda: desc_gather(state)):8.1f}")

    desc = desc_gather(state)
    e_kf = state.mp_obs_kf[ptc]
    e_ok = ok_pt[:, None] & (e_kf >= 0)

    @jax.jit
    def desc_median(desc, e_ok):
        x = jnp.bitwise_xor(desc[:, :, None, :], desc[:, None, :, :])
        d = jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.float32)
        big = 1e9
        d = jnp.where(e_ok[:, None, :], d, big)
        cnt = jnp.sum(e_ok, axis=1)
        K = e_kf.shape[1]
        d_sorted = jnp.sort(d, axis=2)
        med_idx = jnp.clip((cnt - 1) // 2, 0, K - 1)
        med = jnp.take_along_axis(
            d_sorted, med_idx[:, None, None].repeat(K, 1), axis=2
        )[:, :, 0]
        med = jnp.where(e_ok, med, big)
        return jnp.argmin(med, axis=1)

    print(f"  popcount+median    {timeit(lambda: desc_median(desc, e_ok)):8.1f}")

    # cull redundancy internals: the (16, N, K) octave gather
    cand_ids = jnp.arange(16, dtype=jnp.int32)

    @jax.jit
    def cull_gather(s):
        rows = s.kf_mp[cand_ids]  # (16, N)
        pc = jnp.clip(rows, 0, MP - 1)
        orows_kf = s.mp_obs_kf[pc]  # (16, N, K)
        orows_slot = s.mp_obs_slot[pc]
        return s.kf_octave[
            jnp.clip(orows_kf, 0, KF - 1), jnp.clip(orows_slot, 0, N - 1)
        ]

    print(f"  cull oct gather    {timeit(lambda: cull_gather(state)):8.1f}")

    # one LM step alone
    step = jax.jit(
        lambda p: ba.lm_step_dense(
            p, p.cam_Tcw, p.pt_pos, jnp.float32(3.4e38), jnp.float32(1e-4),
            cam.fx, cam.fy, cam.cx, cam.cy, cam.bf, n_free=16,
        )
    )
    print(f"lm_step_dense        {timeit(lambda: step(prob)):8.1f}")


if __name__ == "__main__":
    main()

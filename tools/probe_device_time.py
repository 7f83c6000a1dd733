"""Measure true device time of hot-path programs by timing N chained
executions behind one sync (amortizes any per-launch RTT)."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def chain_time(fn, arg, n=10, warm=2, out=lambda r: r):
    """Median per-call ms across n back-to-back enqueues, one final block."""
    for _ in range(warm):
        r = fn(arg)
    out(r).block_until_ready()
    t0 = time.perf_counter()
    rs = [fn(arg) for _ in range(n)]
    for r in rs:
        out(r).block_until_ready()
    return (time.perf_counter() - t0) / n * 1000.0


def main():
    from my_orb_slam2_tpu.utils.config import (
        CameraConfig, CapacityConfig, OrbConfig, SlamConfig, Sensor, TrackingConfig,
    )
    from my_orb_slam2_tpu.models.frame import FrameFactory
    from my_orb_slam2_tpu.ops.frontend import fast_score_map, nms3x3

    H, W = 480, 640
    cfg = SlamConfig(
        sensor=Sensor.STEREO,
        camera=CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=40.0,
                            th_depth=40.0, width=W, height=H),
        orb=OrbConfig(n_features=1000),
        capacity=CapacityConfig(max_keyframes=64, max_map_points=16384),
        tracking=TrackingConfig(min_stereo_init_points=200),
    )
    factory = FrameFactory(cfg)
    ex = factory.extractor
    rng = np.random.default_rng(0)
    im = (rng.uniform(0, 255, (H, W))).astype(np.uint8)
    dL = jax.device_put(im); dR = jax.device_put(im)
    dL.block_until_ready(); dR.block_until_ready()

    t = chain_time(lambda a: ex._extract(a), dL, out=lambda r: r[0].desc)
    print(f"extract_one_dev_ms   {t:8.2f}")

    t = chain_time(lambda a: factory._stereo(a, dR), dL, out=lambda r: r.desc)
    print(f"build_stereo_dev_ms  {t:8.2f}")

    af = jax.jit(lambda a: ex.build_atlas(a.astype(jnp.float32)))
    t = chain_time(af, dL)
    print(f"atlas_dev_ms         {t:8.2f}")

    a0 = af(dL); a0.block_until_ready()
    ff = jax.jit(lambda a: nms3x3(fast_score_map(a, 7.0, 9)))
    t = chain_time(ff, a0)
    print(f"fast_nms_dev_ms      {t:8.2f}")

    def detect_all(score):
        outs = [ex._detect_level(score, spec) for spec in ex.levels]
        return jnp.concatenate([o[1] for o in outs])
    df = jax.jit(detect_all)
    s0 = ff(a0); s0.block_until_ready()
    t = chain_time(df, s0)
    print(f"detect_topk_dev_ms   {t:8.2f}")

    K = ex.capacity
    ax = jax.device_put(rng.integers(40, W - 40, K).astype(np.int32))
    ay = jax.device_put((rng.integers(40, H - 40, K) + 8).astype(np.int32))
    gf = jax.jit(lambda a: ex._gather_patches(a, ax, ay))
    t = chain_time(gf, a0)
    print(f"patch_gather_dev_ms  {t:8.2f}")

    p0 = gf(a0); p0.block_until_ready()
    of = jax.jit(ex._orientation_from_patches)
    t = chain_time(of, p0)
    print(f"orient_dev_ms        {t:8.2f}")

    an0 = of(p0); an0.block_until_ready()
    bf_ = jax.jit(lambda p: ex._descriptors_from_patches(p, an0))
    t = chain_time(bf_, p0)
    print(f"brief_dev_ms         {t:8.2f}")


if __name__ == "__main__":
    main()

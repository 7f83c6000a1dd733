"""True device time of extraction sub-stages (deep chains + fetch sync)."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def deep(fn, arg, out, n=20):
    r = fn(arg)
    float(out(r).astype(jnp.float32).sum())
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(arg)
    float(out(r).astype(jnp.float32).sum())
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
    im = rng.integers(0, 255, (H, W)).astype(np.uint8)
    dL = jax.device_put(im)

    af = jax.jit(lambda a: ex.build_atlas(a.astype(jnp.float32)))
    print(f"atlas_ms        {deep(af, dL, lambda r: r[::64, ::64]):7.2f}")
    a0 = af(dL)

    ff = jax.jit(lambda a: nms3x3(fast_score_map(a, 7.0, 9)))
    print(f"fast_nms_ms     {deep(ff, a0, lambda r: r[::64, ::64]):7.2f}")
    s0 = ff(a0)

    def detect_all(score):
        outs = [ex._detect_level(score, spec) for spec in ex.levels]
        return jnp.concatenate([o[1] for o in outs])
    df = jax.jit(detect_all)
    print(f"detect_topk_ms  {deep(df, s0, lambda r: r):7.2f}")

    K = ex.capacity
    ax = jax.device_put(rng.integers(40, W - 40, K).astype(np.int32))
    ay = jax.device_put((rng.integers(40, H - 40, K) + 8).astype(np.int32))
    gf = jax.jit(lambda a: ex._gather_patches(a, ax, ay))
    print(f"patch_gather_ms {deep(gf, a0, lambda r: r[:, ::97]):7.2f}")
    p0 = gf(a0)

    of = jax.jit(ex._orientation_from_patches)
    print(f"orient_ms       {deep(of, p0, lambda r: r):7.2f}")
    an0 = of(p0)

    bf_ = jax.jit(lambda p: ex._descriptors_from_patches(p, an0))
    print(f"brief_ms        {deep(bf_, p0, lambda r: r[:, 0]):7.2f}")

    # track_frame true time on a live map
    from my_orb_slam2_tpu.models.tracking import Tracker, TrackingState, track_frame
    from bench import render_stereo_pair
    from my_orb_slam2_tpu.ops import lie

    n_pts = 900
    world_pts = np.stack(
        [rng.uniform(-6, 6, n_pts), rng.uniform(-4, 4, n_pts), rng.uniform(3, 25, n_pts)], 1
    )
    intens = rng.uniform(70, 240, n_pts)
    Twc = np.eye(4)
    pairs = []
    for i in range(6):
        step = np.asarray(lie.se3_exp(jnp.asarray(np.array([0, 0, 0.03, 0, 0.002, 0.0]))))
        Twc = Twc @ step
        T = np.linalg.inv(Twc).astype(np.float32)
        pairs.append(tuple(np.clip(x, 0, 255).astype(np.uint8)
                           for x in render_stereo_pair(world_pts, intens, T, cfg.camera, H, W, rng)))
    tracker = Tracker(cfg, factory.capacity)
    for i, (l, r) in enumerate(pairs[:5]):
        fd = factory.build_stereo(l, r)
        tracker.track(fd, i / 30.0)
    assert tracker.state == TrackingState.OK
    fd = factory.build_stereo(*pairs[5])
    prev = np.eye(4, dtype=np.float32)  # no velocity: first dispatch after warmup

    def tf(_):
        m, cur_mp, packed, _T = track_frame(
            cfg, tracker.map, fd,
            tracker.last_frame.uv, tracker.last_mp, tracker.last_frame.valid,
            tracker.last_frame.octave,
            tracker.Tcw, prev, False, np.int32(tracker.ref_kf), np.int32(3),
        )
        return packed
    print(f"track_frame_ms  {deep(tf, 0, lambda r: r):7.2f}")

    # stereo match stage
    from my_orb_slam2_tpu.ops import stereo as stereo_ops
    from my_orb_slam2_tpu.ops.frontend import GAP
    dR = jax.device_put(im)
    kpsL, atlasL = ex._extract(dL)
    kpsR, atlasR = ex._extract(dR)
    smf = jax.jit(lambda al: stereo_ops.match_stereo(
        kpsL.uv, kpsL.uv_level, kpsL.octave, kpsL.valid, kpsR.uv, kpsR.octave,
        kpsR.valid, kpsL.desc, kpsR.desc, al, atlasR, ex.level_offsets,
        ex.level_w, ex.level_h, ex.scale_factors, 0.0, cfg.camera.fx,
        cfg.camera.bf, col_offset=GAP))
    print(f"stereo_match_ms {deep(smf, atlasL, lambda r: r[0]):7.2f}")


if __name__ == "__main__":
    main()

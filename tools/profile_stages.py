"""Per-stage TPU latency profile of the tracking hot path.

Times (steady state, block_until_ready):
  upload        host->device transfer of the uint8 stereo pair
  extract_one   OrbExtractor on one image
  build_stereo  full stereo frontend (2x extract + stereo match)
  track_frame   fused tracking dispatch
  readback      device->host fetch of the packed result
  sub-stages of extraction (atlas / fast+nms / detect / patches / desc)

Run on the real chip: PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_stages.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def timeit(fn, n=20, warmup=3):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1000.0


def main():
    import jax
    import jax.numpy as jnp

    from bench import render_stereo_pair
    from my_orb_slam2_tpu.utils.config import (
        CameraConfig, CapacityConfig, OrbConfig, SlamConfig, Sensor, TrackingConfig,
    )
    from my_orb_slam2_tpu.models.frame import FrameFactory
    from my_orb_slam2_tpu.models.tracking import Tracker, TrackingState, track_frame
    from my_orb_slam2_tpu.ops import lie

    H, W = 480, 640
    cfg = SlamConfig(
        sensor=Sensor.STEREO,
        camera=CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=40.0,
                            th_depth=40.0, width=W, height=H),
        orb=OrbConfig(n_features=1000),
        capacity=CapacityConfig(max_keyframes=64, max_map_points=16384),
        tracking=TrackingConfig(min_stereo_init_points=200),
    )
    cam = cfg.camera
    rng = np.random.default_rng(0)
    n_pts = 900
    world_pts = np.stack(
        [rng.uniform(-6, 6, n_pts), rng.uniform(-4, 4, n_pts), rng.uniform(3, 25, n_pts)], 1
    )
    intens = rng.uniform(70, 240, n_pts)
    Twc = np.eye(4)
    poses = []
    for i in range(8):
        step = np.asarray(lie.se3_exp(jnp.asarray(np.array([0.0, 0.0, 0.03, 0.0, 0.002, 0.0]))))
        Twc = Twc @ step
        poses.append(np.linalg.inv(Twc).astype(np.float32))
    pairs = [
        tuple(np.clip(im, 0, 255).astype(np.uint8)
              for im in render_stereo_pair(world_pts, intens, T, cam, H, W, rng))
        for T in poses
    ]

    factory = FrameFactory(cfg)
    ex = factory.extractor
    tracker = Tracker(cfg, factory.capacity)

    imL, imR = pairs[0]

    # 1. upload
    def upload():
        a = jax.device_put(imL)
        b = jax.device_put(imR)
        a.block_until_ready(); b.block_until_ready()
    print(f"upload_pair_ms      {timeit(upload):8.2f}")

    dL = jax.device_put(imL); dL.block_until_ready()
    dR = jax.device_put(imR); dR.block_until_ready()

    # 2. extraction, one image
    def ext1():
        kps, atlas = ex._extract(dL)
        kps.desc.block_until_ready()
    print(f"extract_one_ms      {timeit(ext1):8.2f}")

    # 3. full stereo frontend
    def bs():
        fd = factory._stereo(dL, dR)
        fd.desc.block_until_ready()
    print(f"build_stereo_ms     {timeit(bs):8.2f}")

    # extraction sub-stages (separately jitted; sum > fused time, but shows ratios)
    atlas_fn = jax.jit(ex.build_atlas)
    def st_atlas():
        atlas_fn(dL.astype(jnp.float32)).block_until_ready()
    a0 = atlas_fn(dL.astype(jnp.float32)); a0.block_until_ready()
    print(f"  atlas_ms          {timeit(st_atlas):8.2f}")

    from my_orb_slam2_tpu.ops.frontend import fast_score_map, nms3x3
    fast_fn = jax.jit(lambda a: nms3x3(fast_score_map(a, float(cfg.orb.min_th_fast), cfg.orb.fast_arc)))
    def st_fast():
        fast_fn(a0).block_until_ready()
    s0 = fast_fn(a0); s0.block_until_ready()
    print(f"  fast_nms_ms       {timeit(st_fast):8.2f}")

    def detect_all(score):
        outs = []
        for spec in ex.levels:
            outs.append(ex._detect_level(score, spec))
        return [jnp.concatenate([o[i] for o in outs]) if outs[0][i].ndim == 1
                else jnp.concatenate([o[i] for o in outs]) for i in range(3)]
    det_fn = jax.jit(detect_all)
    def st_det():
        r = det_fn(s0)
        r[0].block_until_ready()
    d0 = det_fn(s0)
    print(f"  detect_topk_ms    {timeit(st_det):8.2f}")

    # patch gather + orientation + descriptor on realistic coords
    K = ex.capacity
    octv = np.zeros(K, np.int32)
    ax = np.clip(rng.integers(30, W - 30, K), 0, None).astype(np.int32)
    ay = np.clip(rng.integers(30, H - 30, K), 0, None).astype(np.int32) + 8
    axd = jax.device_put(ax); ayd = jax.device_put(ay)
    gp_fn = jax.jit(lambda a, x, y: ex._gather_patches(a, x, y))
    p0 = gp_fn(a0, axd, ayd); p0.block_until_ready()
    def st_gather():
        gp_fn(a0, axd, ayd).block_until_ready()
    print(f"  patch_gather_ms   {timeit(st_gather):8.2f}")

    ang_fn = jax.jit(lambda p: ex._orientation_from_patches(p))
    an0 = ang_fn(p0); an0.block_until_ready()
    def st_ang():
        ang_fn(p0).block_until_ready()
    print(f"  orient_ms         {timeit(st_ang):8.2f}")

    desc_fn = jax.jit(lambda p, a: ex._descriptors_from_patches(p, a))
    def st_desc():
        desc_fn(p0, an0).block_until_ready()
    desc_fn(p0, an0).block_until_ready()
    print(f"  brief_ms          {timeit(st_desc):8.2f}")

    # stereo match alone
    from my_orb_slam2_tpu.ops import stereo as stereo_ops
    from my_orb_slam2_tpu.ops.frontend import GAP
    kpsL, atlasL = ex._extract(dL)
    kpsR, atlasR = ex._extract(dR)
    sm_fn = jax.jit(lambda kl, kr, al, ar: stereo_ops.match_stereo(
        kl.uv, kl.uv_level, kl.octave, kl.valid, kr.uv, kr.octave, kr.valid,
        kl.desc, kr.desc, al, ar, ex.level_offsets, ex.level_w, ex.level_h,
        ex.scale_factors, 0.0, cam.fx, cam.bf, col_offset=GAP))
    def st_sm():
        u, d = sm_fn(kpsL, kpsR, atlasL, atlasR)
        u.block_until_ready()
    sm_fn(kpsL, kpsR, atlasL, atlasR)[0].block_until_ready()
    print(f"  stereo_match_ms   {timeit(st_sm):8.2f}")

    # 4. tracking dispatch on a built map
    tracker.pipelined = False
    for i, (l, r) in enumerate(pairs[:4]):
        fd = factory.build_stereo(l, r)
        tracker.track(fd, i / 30.0)
    assert tracker.state == TrackingState.OK, tracker.state
    fd = factory.build_stereo(*pairs[4])
    min_obs = np.int32(3)
    prev = np.eye(4, dtype=np.float32)  # no velocity: first dispatch after warmup

    def tf():
        m, cur_mp, packed, _T = track_frame(
            cfg, tracker.map, fd,
            tracker.last_frame.uv, tracker.last_mp, tracker.last_frame.valid,
            tracker.last_frame.octave,
            tracker.Tcw, prev, False, np.int32(tracker.ref_kf), min_obs,
        )
        packed.block_until_ready()
    print(f"track_frame_ms      {timeit(tf):8.2f}")

    m, cur_mp, packed, _T = track_frame(
        cfg, tracker.map, fd,
        tracker.last_frame.uv, tracker.last_mp, tracker.last_frame.valid,
        tracker.last_frame.octave,
        tracker.Tcw, prev, False, np.int32(tracker.ref_kf), min_obs,
    )
    packed.block_until_ready()
    def rb():
        np.asarray(packed)
    print(f"readback_ms         {timeit(rb):8.2f}")

    # 5. end-to-end single-frame (sync) and pipelined loop
    def e2e():
        fd2 = factory._stereo(dL, dR)
        m, c, p, _T = track_frame(
            cfg, tracker.map, fd2,
            tracker.last_frame.uv, tracker.last_mp, tracker.last_frame.valid,
            tracker.last_frame.octave,
            tracker.Tcw, prev, False, np.int32(tracker.ref_kf), min_obs,
        )
        np.asarray(p)
    print(f"e2e_sync_ms         {timeit(e2e):8.2f}")


if __name__ == "__main__":
    main()

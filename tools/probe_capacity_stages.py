"""Per-stage timing at KITTI capacity (KF=1536, MP=262144, N=2048) on the
real chip: builds a live map with the capacity_drive world, then times each
jitted pipeline stage in isolation. This is the measurement tool behind the
capacity ladder in tools/capacity_drive.py.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_capacity_stages.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def timeit(fn, n=5, warmup=2):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n * 1000.0


def main():
    import os

    import jax
    import jax.numpy as jnp

    try:
        # The persistent compile cache intermittently WEDGES the axon
        # tunnel (process stuck at ~0% CPU before the first dispatch);
        # opt-in only.
        if not os.environ.get("SLAM_COMPILE_CACHE"):
            raise RuntimeError("cache disabled (opt-in via SLAM_COMPILE_CACHE=1)")
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from my_orb_slam2_tpu.utils.config import (
        CameraConfig, CapacityConfig, OrbConfig, SlamConfig, Sensor, TrackingConfig,
    )
    from my_orb_slam2_tpu.utils.synthetic import SyntheticWorld
    from my_orb_slam2_tpu.models.tracking import Tracker, track_frame
    from my_orb_slam2_tpu.models import local_mapping as lm
    from my_orb_slam2_tpu.models import map_state as ms
    from my_orb_slam2_tpu.ops import ba

    cfg = SlamConfig(
        sensor=Sensor.STEREO,
        camera=CameraConfig(
            fx=718.856, fy=718.856, cx=607.19, cy=185.21,
            bf=386.1448, th_depth=35.0, width=1241, height=376,
        ),
        orb=OrbConfig(n_features=2000),
        capacity=CapacityConfig(max_keyframes=1536, max_map_points=262144),
        tracking=TrackingConfig(min_stereo_init_points=300, max_frames_between_kf=10),
    )
    CAP = 2048
    world = SyntheticWorld(
        cfg, n_landmarks=120000, seed=0, extent=(25.0, 8.0, 1200.0),
        depth_range=(2.0, 1200.0),
    )
    poses = world.circular_trajectory(60, forward_per_frame=0.8, yaw_per_frame=0.001)
    mapper = lm.LocalMapper(cfg, run_ba=True, cull_keyframes=True, full_every=4)
    tracker = Tracker(cfg, CAP, local_mapper=mapper)
    frames = []
    for i, Tcw in enumerate(poses):
        frame, _ = world.observe(Tcw, CAP, seed=10_000 + i)
        frames.append(frame)
        t0 = time.perf_counter()
        tracker.track(frame, i / 10.0)
        if i < 25 or i % 20 == 0:
            print(f"  frame {i} {time.perf_counter()-t0:.1f}s "
                  f"(kfs={tracker.kf_counter})", flush=True)
    tracker.flush()
    state = tracker.map
    kf_id = jnp.int32(tracker.n_kf - 1)
    print(f"built map: kfs={tracker.n_kf} points={int(np.asarray(state.mp_valid).sum())}")

    frame = frames[-1]
    last = frames[-2]
    prev = np.eye(4, dtype=np.float32)

    # environmental floor: a trivial jit over the live state
    f_triv = jax.jit(lambda s: s.mp_n_obs + 1)
    print(f"trivial_fn_ms         {timeit(lambda: f_triv(state).block_until_ready()):8.2f}", flush=True)

    def t_track():
        m2, cur_mp, packed, _T = track_frame(
            cfg, state, frame, last.uv, tracker.last_mp, last.valid, last.octave,
            tracker.Tcw, prev, False, np.int32(tracker.ref_kf), np.int32(3),
        )
        packed.block_until_ready()
    print(f"track_frame_ms        {timeit(t_track):8.1f}", flush=True)

    kf_id = jnp.int32(tracker.n_kf - 1)

    # BA micro-variants (non-donating jits)
    cam = cfg.camera
    prob, aux = lm.extract_local_ba_dense(cfg, state, kf_id)
    def t_extract():
        p, a = lm.extract_local_ba_dense(cfg, state, kf_id)
        p.cam_Tcw.block_until_ready()
    print(f"extract_dense_ms      {timeit(t_extract):8.1f}", flush=True)
    for n in (1, 5):
        def t_ba_n(n=n):
            p2 = ba.bundle_adjust_dense(
                prob, cam.fx, cam.fy, cam.cx, cam.cy, cam.bf, n_iters=n
            )
            p2.cam_Tcw.block_until_ready()
        print(f"ba_dense_{n}_ms        {timeit(t_ba_n):8.1f}", flush=True)
    def t_cls():
        m2 = ba.classify_outliers_dense(prob, cam.fx, cam.fy, cam.cx, cam.cy, cam.bf)
        m2.block_until_ready()
    print(f"classify_dense_ms     {timeit(t_cls):8.1f}", flush=True)
    # fuse + culling in isolation (on state copies; fuse donates)
    def t_fuse():
        s2, _t = lm.fuse_neighbors(
            cfg, jax.tree.map(lambda x: x.copy(), state), kf_id,
            refresh_derived=False,
        )
        s2.mp_valid.block_until_ready()
    print(f"fuse_ms               {timeit(t_fuse):8.1f}", flush=True)
    cull_j = jax.jit(lm.keyframe_culling.__wrapped__, static_argnames=("cfg",))
    def t_cull():
        s2, _ = cull_j(cfg, state, kf_id)
        s2.mp_valid.block_until_ready()
    print(f"cull_ms               {timeit(t_cull):8.1f}", flush=True)

    # derived refreshes in isolation
    ids21 = jnp.asarray(np.arange(21, dtype=np.int32))
    refresh = jax.jit(ms.refresh_covisibility)
    def t_rc():
        s = refresh(state, ids21)
        s.covis.block_until_ready()
    print(f"refresh_covis21_ms    {timeit(t_rc):8.1f}", flush=True)

    upg = jax.jit(ms.update_point_geometry_ids, static_argnames=("scale_factor", "n_levels"))
    ids4k = jnp.asarray(np.arange(4096, dtype=np.int32))
    def t_geo():
        s = upg(state, ids4k, ids4k >= 0, 1.2, 8)
        s.mp_normal.block_until_ready()
    print(f"geometry_4k_ms        {timeit(t_geo):8.1f}", flush=True)

    # Production fused passes, timed LAST by chaining donated STATE COPIES
    # (the same executables the drive uses -- no extra compiles).
    s_chain = [jax.tree.map(lambda x: x.copy(), state)]

    def t_light():
        s2, _n = lm.light_pass(cfg, s_chain[0], kf_id, 10)
        s2.mp_valid.block_until_ready()
        s_chain[0] = s2
    print(f"LIGHT_PASS_ms         {timeit(t_light):8.1f}", flush=True)

    def t_full():
        s2, _c = lm.full_pass(cfg, s_chain[0], kf_id, run_ba=True, cull=True)
        s2.mp_valid.block_until_ready()
        s_chain[0] = s2
    print(f"FULL_PASS_ms          {timeit(t_full):8.1f}", flush=True)


if __name__ == "__main__":
    main()

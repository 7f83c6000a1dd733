"""Benchmark: steady-state tracking throughput on the real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The headline metric mirrors the reference's own self-timing (per-frame
tracking time, reference Examples/Monocular/mono_tum.cc:97-120; real-time
claim ~30 fps on an i7, BASELINE.md): median end-to-end tracking
frames/second, including the ORB front-end (pyramid + FAST + BRIEF + stereo
matching) and the pose pipeline (motion-model search + IRLS-LM pose
optimization + local-map tracking) on a synthetic stereo sequence.
vs_baseline is fps / 30.
"""

import json
import sys
import time

import numpy as np


def render_stereo_pair(world_pts, intensities, Tcw, cam, H, W, rng):
    """Render left/right images of a blob world (host-side, numpy)."""
    imgs = []
    for dx in (0.0, cam.baseline):
        T = Tcw.copy()
        # right camera: shift origin along +x in camera frame
        T = np.array(T)
        T[0, 3] -= dx * 0  # translation applied below in camera frame
        pc = world_pts @ Tcw[:3, :3].T + Tcw[:3, 3]
        pc[:, 0] -= dx
        z = pc[:, 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            u = cam.fx * pc[:, 0] / z + cam.cx
            v = cam.fy * pc[:, 1] / z + cam.cy
        img = 28.0 + 18.0 * rng.standard_normal((H, W)).astype(np.float32) * 0  # flat base
        yy, xx = np.mgrid[0:H, 0:W]
        img = img + 16.0 * np.sin(xx * 0.11) * np.cos(yy * 0.07)
        ok = (z > 0.5) & (u > 12) & (u < W - 12) & (v > 12) & (v < H - 12)
        for i in np.nonzero(ok)[0]:
            ui, vi = int(u[i]), int(v[i])
            s = 2 + i % 4
            img[vi - s : vi + s + 1, ui - s : ui + s + 1] = intensities[i]
        imgs.append(img.astype(np.float32))
    return imgs[0], imgs[1]


def main():
    import os

    import jax

    # Persistent compilation cache: bench wall time is dominated by XLA
    # compiles on a fresh process; cache them across runs.
    try:
        # The persistent compile cache intermittently WEDGES the axon
        # tunnel (process stuck at ~0% CPU before the first dispatch);
        # opt-in only.
        if not os.environ.get("SLAM_COMPILE_CACHE"):
            raise RuntimeError("cache disabled (opt-in via SLAM_COMPILE_CACHE=1)")
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    import jax.numpy as jnp

    from my_orb_slam2_tpu.utils.config import (
        CameraConfig,
        CapacityConfig,
        OrbConfig,
        SlamConfig,
        Sensor,
        TrackingConfig,
    )
    from my_orb_slam2_tpu.models.frame import FrameFactory
    from my_orb_slam2_tpu.models.tracking import Tracker, TrackingState
    from my_orb_slam2_tpu.ops import lie

    H, W = 480, 640
    cfg = SlamConfig(
        sensor=Sensor.STEREO,
        camera=CameraConfig(
            fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=40.0, th_depth=40.0,
            width=W, height=H,
        ),
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
    intensities = rng.uniform(70, 240, n_pts)

    n_frames = 100
    poses = []
    Twc = np.eye(4)
    for i in range(n_frames):
        step = np.asarray(
            lie.se3_exp(jnp.asarray(np.array([0.0, 0.0, 0.03, 0.0, 0.002, 0.0])))
        )
        Twc = Twc @ step
        poses.append(np.linalg.inv(Twc).astype(np.float32))

    pairs = [
        tuple(
            np.clip(im, 0, 255).astype(np.uint8)
            for im in render_stereo_pair(world_pts, intensities, T, cam, H, W, rng)
        )
        for T in poses
    ]

    factory = FrameFactory(cfg)
    tracker = Tracker(cfg, factory.capacity)
    tracker.pipelined = True  # hide the per-frame readback RTT
    # Depth 6: a readback issued at frame i resolves at i+6, so the tunnel
    # RTT (~25-30ms) amortizes below the per-frame device compute, making
    # the loop device-bound (measured sweep: 5 -> 30.2 fps, 6 -> best,
    # 8 -> KF-capacity saturation side effects).
    tracker.pipeline_depth = 6

    # Pipelined loop: dispatch the next frame's front-end before consuming
    # the current frame's tracking result — the async-dispatch analog of
    # the reference's thread decoupling. Warmup frames excluded from timing.
    # Sustained throughput: wall time over the steady-state window INCLUDING
    # the final pipeline flush, so queued-but-unfinished device work cannot
    # inflate the number.
    warmup = 8
    ok_frames = 0
    t_start = None
    est_poses = []
    next_frame = factory.build_stereo(*pairs[0])
    for i in range(n_frames):
        if i == warmup:
            tracker.flush()  # drain compile-skewed work before the clock
            t_start = time.perf_counter()
        frame = next_frame
        # Enqueue tracking first (the device executes in dispatch order),
        # then the next frame's front-end fills the pipeline behind it.
        info = tracker.track(frame, i / 30.0)
        if i + 1 < n_frames:
            next_frame = factory.build_stereo(*pairs[i + 1])
        if info["state"] == TrackingState.OK:
            ok_frames += 1
    tracker.flush()
    elapsed = time.perf_counter() - t_start
    timed = n_frames - warmup
    med = elapsed / timed
    fps = timed / elapsed

    # Accuracy on the same run: trajectory vs the ground-truth render poses
    # (BASELINE targets are ATE-gated; a throughput number divorced from
    # accuracy is not a SLAM benchmark).
    from my_orb_slam2_tpu.utils.synthetic import ate_rmse

    traj = {fid: T for fid, _, T, lost in tracker.trajectory_poses() if not lost}
    est, gt = [], []
    for i, T_gt in enumerate(poses):
        if i in traj:
            est.append(traj[i])
            gt.append(T_gt)
    ate = ate_rmse(np.stack(est), np.stack(gt)) if len(est) > 10 else float("nan")

    # Device-time split (front-end vs tracking), RTT-amortized: N dispatches
    # are queued back-to-back and blocked ONCE, so the ~25-30 ms tunnel
    # round-trip contributes <=1.5 ms per sample instead of being counted
    # in full (the round-2 split subtracted a blocking measurement from a
    # pipelined one and clamped to 0.0 — arithmetically meaningless).
    def chain_ms(dispatch, n=20, w=2):
        for _ in range(w):
            jax.block_until_ready(dispatch())
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = dispatch()
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n * 1000.0

    fe_ms = chain_ms(lambda: factory.build_stereo(*pairs[-1]).uv)

    from my_orb_slam2_tpu.models.tracking import track_frame

    tr = tracker
    fr = tr.last_frame
    track_ms = chain_ms(
        lambda: track_frame(
            cfg, tr.map, fr, fr.uv, tr.last_mp, fr.valid, fr.octave,
            jnp.asarray(tr.Tcw), jnp.asarray(tr.Tcw), False,
            np.int32(tr.ref_kf), np.int32(3),
        )[2]
    )

    # Accuracy is GATED, not just reported: a throughput number with a
    # drifting trajectory is not a SLAM benchmark.
    assert ate < 0.15, f"ate_rmse_m regressed: {ate}"

    result = {
        "metric": "tracking_fps_single_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
        "ate_rmse_m": round(ate, 4),
        "frontend_ms": round(fe_ms, 2),
        "track_ms": round(track_ms, 2),
        "cap_overflow": int(np.asarray(tracker.map.cap_overflow)),
        "obs_overflow": int(np.asarray(tracker.map.obs_overflow)),
    }
    print(json.dumps(result))
    print(
        f"# median_frame_ms={med*1000:.1f} ok_frames={ok_frames}/{n_frames} "
        f"kfs={tracker.kf_counter} frontend_ms={fe_ms:.1f}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()

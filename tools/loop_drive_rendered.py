"""Long-haul loop-closure drive on RENDERED stereo imagery: the camera
drives a closed circuit of textured blob "buildings", through the real
front end (pyramid FAST + BRIEF -> vocabulary words), so place recognition
runs on the same descriptor distribution the vocabulary was trained on.

(The synthetic-FrameData variant in tools/loop_drive.py feeds random
per-landmark descriptors; those descend the rendered-trained tree
uniformly, BoW similarity between unrelated places becomes noise, and at
thousands of frames the accumulated false positives close wrong loops —
measured: 18 false closures corrupting the map. Image-path validation is
the reference's own method: full sequences, README.md:97-167.)

Run: python tools/loop_drive_rendered.py [--frames 1400] [--no-loop]
     [--json LOOP_r04.json]
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def main():
    from render_world import BlobWorld, TEX
    from my_orb_slam2_tpu.models.system import SlamSystem
    from my_orb_slam2_tpu.models.tracking import TrackingState
    from my_orb_slam2_tpu.utils.config import (
        CameraConfig, CapacityConfig, OrbConfig, SlamConfig, Sensor,
        TrackingConfig,
    )
    from my_orb_slam2_tpu.utils.synthetic import ate_rmse

    n_frames = (
        int(sys.argv[sys.argv.index("--frames") + 1])
        if "--frames" in sys.argv else 1400
    )
    use_loop = "--no-loop" not in sys.argv
    out_json = (
        sys.argv[sys.argv.index("--json") + 1] if "--json" in sys.argv else ""
    )

    H, W = 480, 640
    fx = 0.8 * W
    baseline = 0.5  # KITTI-like: close-point range = ThDepth*b = 20 m
    cfg = SlamConfig(
        sensor=Sensor.STEREO,
        camera=CameraConfig(
            fx=fx, fy=fx, cx=W / 2.0, cy=H / 2.0, bf=fx * baseline,
            th_depth=40.0, width=W, height=H,
        ),
        orb=OrbConfig(n_features=1000),
        # max_obs_per_point=64: a closed circuit re-observes the same walls
        # from ~500 live keyframes, so points legitimately collect far more
        # observers than the straight-corridor capacity drive's 32 (the
        # reference's observation lists are unbounded,
        # include/MapPoint.h:45-82). Provisioning K to the sequence shape
        # cut obs_overflow 20k -> (see LOOP_r05.json) with ATE unchanged.
        # obs_budget=112 (n_obs units; stereo observations count 2, so
        # ~56 observers): keyframe insertion stops adding observations to
        # saturated points, mirroring the fuse-side K-4 budget — the last
        # overflow source on a revisiting circuit. Declined adds are
        # counted as shed work.
        capacity=CapacityConfig(max_keyframes=1536, max_map_points=131072,
                                max_obs_per_point=64, obs_budget=112),
        tracking=TrackingConfig(min_stereo_init_points=200,
                                max_frames_between_kf=10),
    )

    # Circuit: one lap + overlap. step/yaw give radius R = step/yaw.
    overlap = max(n_frames // 9, 80)
    step = 0.15
    yaw = 2.0 * np.pi / (n_frames - overlap)
    R = step / yaw

    # Ring of textured blobs: an inner and an outer "wall" around the road.
    rng = np.random.default_rng(7)
    n_blobs = 8000
    theta = rng.uniform(0, 2 * np.pi, n_blobs)
    side = rng.random(n_blobs) < 0.62  # 62% outer wall
    r = np.where(side, R + rng.uniform(3.0, 18.0, n_blobs),
                 R - rng.uniform(3.0, 12.0, n_blobs))
    # Road circle center: camera starts at origin heading +z and turns with
    # +yaw around y, which curves the path toward +x (verified against the
    # generated centers — the earlier -R guess put the ring tangent to the
    # actual path and blob visibility collapsed to zero on half the lap):
    # center at (+R, 0, 0).
    cx_w, cz_w = R, 0.0
    pts = np.stack(
        [cx_w + r * np.cos(theta), rng.uniform(-4.0, 4.0, n_blobs),
         cz_w + r * np.sin(theta)], axis=1,
    )
    tex = rng.uniform(20, 255, (n_blobs, TEX, TEX)).astype(np.float32)
    for _ in range(3):
        tex = (tex + np.roll(tex, 1, 1) + np.roll(tex, 1, 2)
               + np.roll(tex, -1, 1) + np.roll(tex, -1, 2)) / 5.0
    tex = 20 + (tex - tex.min(axis=(1, 2), keepdims=True)) * (
        235.0 / np.maximum(np.ptp(tex, axis=(1, 2)).reshape(-1, 1, 1), 1e-3)
    )
    sizes = rng.integers(6, 14, n_blobs)
    bg = rng.uniform(25, 70, (32, 32)).astype(np.float32)
    for _ in range(2):
        bg = (bg + np.roll(bg, 1, 0) + np.roll(bg, 1, 1)
              + np.roll(bg, -1, 0) + np.roll(bg, -1, 1)) / 5.0
    world = BlobWorld(pts, tex, sizes, 7, bg)

    # Poses along the circle (same generator as the synthetic drives).
    from my_orb_slam2_tpu.utils.synthetic import SyntheticWorld

    helper = SyntheticWorld(cfg, n_landmarks=8, seed=0)
    poses = helper.circular_trajectory(
        n_frames, forward_per_frame=step, yaw_per_frame=yaw
    )

    from render_world import render_stereo

    class _Cam:
        pass

    rc = _Cam()
    rc.fx = rc.fy = fx
    rc.cx, rc.cy = W / 2.0, H / 2.0
    rc.baseline = baseline

    print(f"circuit: R={R:.0f} m, length={step * (n_frames - overlap):.0f} m,"
          f" {n_frames} frames, loop={'on' if use_loop else 'off'}", flush=True)

    # pipeline_depth=3: keyframe bursts starve the motion model on the
    # lagged map at depth >= 3 (inliers decay ~50->25 over consecutive
    # insertions — measured in round 4, which pinned this drive to depth 1).
    # The stale-dispatch retry (tracking.py _dispatch_retry: re-track the
    # same frame once against the CURRENT map before declaring LOST) plus
    # the adaptive temporal-VO anchors now absorb those bursts, so the
    # drive runs with real pipelining like the capacity drive (depth 5).
    depth = (
        int(sys.argv[sys.argv.index("--depth") + 1])
        if "--depth" in sys.argv else 3
    )
    system = SlamSystem(cfg, pipeline_depth=depth, enable_loop_closing=use_loop)
    system.local_mapper.full_every = 4

    # Pre-render the whole circuit before the timed loop (the blob
    # renderer costs ~0.2 s/frame of host CPU at this density — the
    # on-disk-dataset analog of this cost is covered by the native
    # prefetcher path, and this drive measures the SLAM pipeline).
    t0_all = time.time()
    frames_img = []
    for i, Tcw in enumerate(poses):
        frames_img.append(render_stereo(world, rc, H, W, Tcw))
        if i % 200 == 0:
            print(f"  render {i} ({time.time() - t0_all:.0f}s)", flush=True)
    render_s = time.time() - t0_all

    lost = 0
    t_start = None
    warm = 0
    frame_t = []
    for i, (left, right) in enumerate(frames_img):
        if t_start is None and i >= 20 and system.local_mapper._ba_runs >= 1:
            system.tracker.flush()
            warm = i
            t_start = time.perf_counter()
        t_f = time.perf_counter()
        info = system.track_stereo(left, right, i / 10.0)
        if t_start is not None:
            frame_t.append(time.perf_counter() - t_f)
        lost += info["state"] != TrackingState.OK and i > 0
        if i % 200 == 0:
            print(f"  frame {i} ({time.time() - t0_all:.0f}s)", flush=True)
    system.shutdown()
    elapsed = max(time.perf_counter() - t_start, 1e-6)
    fps = (n_frames - warm) / elapsed
    # Lazy jit compiles fire the first time each program shape is reached
    # (loop detection, Sim3 solve, loop correction, GBA chunks, ... — each
    # a multi-second XLA compile through the tunnel) and land on single
    # frames; the reference has no compile analog, so sustained throughput
    # is reported separately from those one-time stalls. steady_fps is
    # 1/median frame time; compile_stall_s is the total time spent in
    # frames >= 4x the median (all one-time costs — a warm process or a
    # persistent compile cache pays none of them).
    ft = np.asarray(frame_t)
    med = float(np.median(ft)) if len(ft) else 1e-9
    stall = ft >= max(4.0 * med, 0.2)
    steady_fps = 1.0 / max(med, 1e-9)
    compile_stall_s = float(ft[stall].sum())
    fps_ex_stall = (len(ft) - int(stall.sum())) / max(
        float(ft[~stall].sum()), 1e-9
    )

    m = system.tracker.map
    traj = system.tracker.trajectory_poses()
    est_all = [(fid, T) for fid, _, T, l in traj if not l]
    est = np.stack([T for _, T in est_all])
    gt = np.stack([poses[fid] for fid, _ in est_all])
    ate = ate_rmse(est, gt)
    loops = system.loop_closer.loops_closed if use_loop else 0
    gbas = system.loop_closer.gbas_completed if use_loop else 0
    path = step * n_frames
    res = {
        "frames": n_frames,
        "path_m": round(path, 1),
        "fps": round(fps, 2),
        "steady_fps": round(steady_fps, 2),
        "fps_ex_compile_stalls": round(fps_ex_stall, 2),
        "compile_stall_s": round(compile_stall_s, 1),
        "n_stall_frames": int(stall.sum()),
        "pipeline_depth": depth,
        "render_s_per_frame": round(render_s / n_frames, 3),
        "ate_m": round(float(ate), 4),
        "ate_pct_path": round(100.0 * float(ate) / path, 4),
        "lost": int(lost),
        "loops_closed": int(loops),
        "gbas_completed": int(gbas),
        "kfs_inserted": int(np.asarray(m.n_kf)),
        "kfs_live": int(np.asarray(m.kf_valid).sum()),
        "points": int(np.asarray(m.mp_valid).sum()),
        "cap_overflow": int(np.asarray(m.cap_overflow)),
        "obs_overflow": int(np.asarray(m.obs_overflow)),
        "shed_work": int(np.asarray(m.shed_work)),
        "kf_capacity_refusals": system.tracker.kf_capacity_refusals,
        "loop_enabled": use_loop,
    }
    print(json.dumps(res), flush=True)
    if out_json:
        with open(out_json, "w") as f:
            json.dump(res, f, indent=1)
    assert lost == 0, f"tracking lost {lost} frames on the circuit"
    if use_loop:
        assert loops >= 1, "loop closer never fired on a closed circuit"


if __name__ == "__main__":
    main()

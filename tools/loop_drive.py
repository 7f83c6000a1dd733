"""Long-haul loop-closure drive: thousands of frames around a closed
circuit, requiring the loop closer to FIRE and cut the accumulated drift
(the reference's whole validation method is exactly this — full KITTI
sequences with loop closures, reference README.md:97-167,
src/LoopClosing.cc:489-696).

World: a ring of landmarks around a circular road (radius = forward/yaw
per frame); the camera drives the circuit once plus an overlap segment, so
the tail revisits the start with accumulated drift. With --no-loop the
loop closer is disabled, giving the raw-odometry baseline the closure must
beat.

Run (real chip):
  python tools/loop_drive.py [--frames 2100] [--no-loop] [--json out.json]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def ring_world(cfg, n_landmarks, R, seed):
    """Landmarks in an annulus around the circular road (center fitted by
    the caller's trajectory): buildings/structure along a loop street."""
    from my_orb_slam2_tpu.utils.synthetic import SyntheticWorld

    world = SyntheticWorld(cfg, n_landmarks=n_landmarks, seed=seed)
    rng = np.random.default_rng(seed + 1)
    theta = rng.uniform(0, 2 * np.pi, n_landmarks)
    # Radial offset relative to the road circle: mostly outside the road
    # (buildings), some inner structure.
    r = R + rng.uniform(-25.0, 45.0, n_landmarks)
    y = rng.uniform(-8.0, 8.0, n_landmarks)
    world.landmarks = np.stack(
        [r * np.cos(theta), y, r * np.sin(theta)], axis=1
    ).astype(np.float64)
    # Scale anchor: typical viewing distance from the road, not from the
    # world origin (the ring's center is ~R away from every camera).
    view_dist = rng.uniform(8.0, 60.0, n_landmarks)
    world.z_ref = view_dist * (1.2 ** world.base_octave)
    return world


def main():
    import jax.numpy as jnp

    from my_orb_slam2_tpu.utils.config import (
        CameraConfig, CapacityConfig, OrbConfig, SlamConfig, Sensor,
        TrackingConfig,
    )
    from my_orb_slam2_tpu.utils.synthetic import ate_rmse
    from my_orb_slam2_tpu.models.system import SlamSystem
    from my_orb_slam2_tpu.models.tracking import TrackingState

    n_frames = (
        int(sys.argv[sys.argv.index("--frames") + 1])
        if "--frames" in sys.argv else 2100
    )
    use_loop = "--no-loop" not in sys.argv
    out_json = (
        sys.argv[sys.argv.index("--json") + 1] if "--json" in sys.argv else ""
    )

    cfg = SlamConfig(
        sensor=Sensor.STEREO,
        camera=CameraConfig(
            fx=718.856, fy=718.856, cx=607.19, cy=185.21,  # KITTI intrinsics
            bf=386.1448, th_depth=35.0, width=1241, height=376,
        ),
        orb=OrbConfig(n_features=2000),
        capacity=CapacityConfig(max_keyframes=2048, max_map_points=262144),
        tracking=TrackingConfig(min_stereo_init_points=300, max_frames_between_kf=10),
    )
    CAP = 2048
    # One full circuit in (n_frames - overlap) frames, then the overlap
    # revisits the start. forward=0.4 m/frame -> ~750 m circuit.
    overlap = max(n_frames // 12, 60)
    fwd = 0.4
    yaw = 2.0 * np.pi / (n_frames - overlap)
    R = fwd / yaw
    world = ring_world(cfg, n_landmarks=120000, R=0.0, seed=0)

    # Trajectory first (to fit the road circle), then place the ring.
    probe = world.circular_trajectory(n_frames, forward_per_frame=fwd, yaw_per_frame=yaw)
    centers = np.stack([np.linalg.inv(T)[:3, 3] for T in probe])
    c_xz = centers[:, [0, 2]].mean(axis=0)
    rng = np.random.default_rng(1)
    n_lm = world.landmarks.shape[0]
    theta = rng.uniform(0, 2 * np.pi, n_lm)
    r = R + rng.uniform(-25.0, 45.0, n_lm)
    world.landmarks = np.stack(
        [c_xz[0] + r * np.cos(theta), rng.uniform(-8.0, 8.0, n_lm),
         c_xz[1] + r * np.sin(theta)], axis=1,
    )
    poses = probe

    print(f"circuit: R={R:.0f} m, length={fwd * (n_frames - overlap):.0f} m, "
          f"{n_frames} frames, loop={'on' if use_loop else 'off'}",
          flush=True)

    system = SlamSystem(
        cfg, use_images=False, capacity=CAP, pipeline_depth=5,
        enable_loop_closing=use_loop,
    )
    system.local_mapper.full_every = 4

    lost = 0
    t_start = None
    warm = 0
    t0_all = time.time()
    for i, Tcw in enumerate(poses):
        frame, _ = world.observe(Tcw, CAP, seed=10_000 + i)
        if t_start is None and i >= 20 and system.local_mapper._ba_runs >= 1:
            system.tracker.flush()
            warm = i
            t_start = time.perf_counter()
        info = system.track_frame_data(frame, i / 10.0)
        lost += info["state"] != TrackingState.OK and i > 0
        if i % 500 == 0:
            print(f"  frame {i} ({time.time() - t0_all:.0f}s)", flush=True)
    system.shutdown()
    elapsed = max(time.perf_counter() - t_start, 1e-6)
    fps = (n_frames - warm) / elapsed

    m = system.tracker.map
    traj = system.tracker.trajectory_poses()
    est = np.stack([T for _, _, T, l in traj if not l])
    ate = ate_rmse(est, poses[: len(est)])
    # Closing error: estimated vs ground-truth distance between the last
    # frame and the matching start-revisit frame (drift at the seam).
    C_est = np.stack([np.linalg.inv(T)[:3, 3] for T in est])
    C_gt = centers
    seam = np.linalg.norm(
        (C_est[-1] - C_est[overlap // 2]) - (C_gt[-1] - C_gt[overlap // 2])
    )
    loops = system.loop_closer.loops_closed if use_loop else 0
    gbas = system.loop_closer.gbas_completed if use_loop else 0
    path = fwd * n_frames
    res = {
        "frames": n_frames,
        "path_m": path,
        "fps": round(fps, 2),
        "ate_m": round(float(ate), 4),
        "ate_pct_path": round(100.0 * float(ate) / path, 4),
        "seam_error_m": round(float(seam), 3),
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
    assert lost == 0, "tracking lost on the circuit"
    if use_loop:
        assert loops >= 1, "loop closer never fired on a closed circuit"


if __name__ == "__main__":
    main()

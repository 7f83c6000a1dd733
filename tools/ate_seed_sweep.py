"""Multi-seed ATE/fps sweep of the full-system capacity drive: one process,
several worlds — the compile cache is shared so each extra seed costs only
its run time. Single-seed ATE at this scale varies ~2x run-to-run (the
pipeline is chaotic in its point set), so policy choices are made on the
seed-averaged numbers, not a lucky draw.

Run: python tools/ate_seed_sweep.py [--seeds 3] [--frames 100]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def run_one(seed: int, n_frames: int):
    from my_orb_slam2_tpu.utils.config import (
        CameraConfig, CapacityConfig, OrbConfig, SlamConfig, Sensor,
        TrackingConfig,
    )
    from my_orb_slam2_tpu.utils.synthetic import SyntheticWorld, ate_rmse
    from my_orb_slam2_tpu.models.system import SlamSystem
    from my_orb_slam2_tpu.models.tracking import TrackingState

    import dataclasses
    import os

    cfg = SlamConfig(
        sensor=Sensor.STEREO,
        camera=CameraConfig(
            fx=718.856, fy=718.856, cx=607.19, cy=185.21,
            bf=386.1448, th_depth=35.0, width=1241, height=376,
        ),
        orb=OrbConfig(n_features=2000),
        capacity=CapacityConfig(
            max_keyframes=1536, max_map_points=262144,
            max_obs_per_point=int(os.environ.get("SLAM_OBS_K", "32")),
            obs_budget=int(os.environ.get("SLAM_OBS_BUDGET", "32")),
        ),
        tracking=TrackingConfig(min_stereo_init_points=300, max_frames_between_kf=10),
    )
    # Perf-ablation knobs (fps/ATE tradeoffs measured on the same harness).
    i1 = int(os.environ.get("SLAM_BA_ITERS1", "0"))
    i2 = int(os.environ.get("SLAM_BA_ITERS2", "0"))
    if i1 or i2:
        cfg = dataclasses.replace(cfg, mapping=dataclasses.replace(
            cfg.mapping,
            local_ba_iters1=i1 or cfg.mapping.local_ba_iters1,
            local_ba_iters2=i2 or cfg.mapping.local_ba_iters2,
        ))
    CAP = 2048
    world = SyntheticWorld(
        cfg, n_landmarks=120000, seed=seed, extent=(25.0, 8.0, 1200.0),
        depth_range=(2.0, 1200.0),
    )
    poses = world.circular_trajectory(n_frames, forward_per_frame=0.8, yaw_per_frame=0.001)
    frames = [world.observe(T, CAP, seed=10_000 + 97 * seed + i)[0]
              for i, T in enumerate(poses)]
    system = SlamSystem(cfg, use_images=False, capacity=CAP, pipeline_depth=5)
    system.local_mapper.full_every = int(os.environ.get("SLAM_FULL_EVERY", "4"))
    mapper = system.local_mapper
    t_start, warm = None, 0
    lost = 0
    for i, frame in enumerate(frames):
        if t_start is None and i >= 20 and getattr(mapper, "_ba_runs", 1) >= 1:
            system.tracker.flush()
            warm = i
            t_start = time.perf_counter()
        info = system.track_frame_data(frame, i / 10.0)
        lost += info["state"] != TrackingState.OK and i > 0
    system.tracker.flush()
    el = max(time.perf_counter() - (t_start or time.perf_counter()), 1e-6)
    fps = (n_frames - warm) / el
    m = system.tracker.map
    traj = system.tracker.trajectory_poses()
    est = np.stack([T for _, _, T, l in traj if not l])
    ate = ate_rmse(est, poses[: len(est)])
    return dict(
        seed=seed, fps=fps, ate=ate, lost=int(lost),
        cap_overflow=int(np.asarray(m.cap_overflow)),
        obs_overflow=int(np.asarray(m.obs_overflow)),
        shed_work=int(np.asarray(m.shed_work)),
        points=int(np.asarray(m.mp_valid).sum()),
        kfs=int(np.asarray(m.n_kf)),
    )


def main():
    import json

    n_seeds = (
        int(sys.argv[sys.argv.index("--seeds") + 1]) if "--seeds" in sys.argv else 3
    )
    n_frames = (
        int(sys.argv[sys.argv.index("--frames") + 1]) if "--frames" in sys.argv else 100
    )
    out_json = (
        sys.argv[sys.argv.index("--json") + 1] if "--json" in sys.argv else ""
    )
    rows = []
    for s in range(n_seeds):
        r = run_one(s, n_frames)
        rows.append(r)
        print(f"seed={r['seed']} fps={r['fps']:.1f} ate={r['ate']:.3f} "
              f"lost={r['lost']} cap_of={r['cap_overflow']} "
              f"obs_of={r['obs_overflow']} shed={r['shed_work']} "
              f"pts={r['points']} kfs={r['kfs']}",
              flush=True)
    ates = [r["ate"] for r in rows]
    fpss = [r["fps"] for r in rows]
    summary = {
        "frames": n_frames,
        "seeds": n_seeds,
        "ate_mean": round(float(np.mean(ates)), 4),
        "ate_min": round(float(np.min(ates)), 4),
        "ate_max": round(float(np.max(ates)), 4),
        "fps_mean": round(float(np.mean(fpss)), 2),
        "fps_min": round(float(np.min(fpss)), 2),
        "lost_total": int(sum(r["lost"] for r in rows)),
        "cap_overflow_total": int(sum(r["cap_overflow"] for r in rows)),
        "obs_overflow_total": int(sum(r["obs_overflow"] for r in rows)),
        "per_seed": [
            {k: (round(float(v), 4) if isinstance(v, float) else v)
             for k, v in r.items()} for r in rows
        ],
    }
    print(f"ATE mean={summary['ate_mean']:.3f} max={summary['ate_max']:.3f} "
          f"fps_mean={summary['fps_mean']:.1f}")
    if out_json:
        json.dump(summary, open(out_json, "w"), indent=1)
    # Seed-MEAN gates (single-seed ATE varies ~2x at this scale — see
    # module docstring; policy and regression decisions use the mean).
    assert summary["lost_total"] == 0, summary
    assert summary["ate_mean"] < 0.4, summary
    assert summary["cap_overflow_total"] == 0, summary


if __name__ == "__main__":
    main()

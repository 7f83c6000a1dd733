"""Monocular loop-closure drive on RENDERED imagery: a closed circuit
tracked monocularly (free scale), requiring the free-scale Sim3 loop path
(fix_scale=False, loop_closing.py / ops/horn.py / ops/sim3_opt.py — the
reason Sim3 exists, reference src/LoopClosing.cc:281-477 with
mbFixScale = sensor != MONOCULAR, src/System.cc:94) to fire and cut
scale-aligned ATE. Mono accumulates SCALE drift a rigid loop correction
cannot absorb, so this validates the 7-DoF machinery end to end.

Runs the circuit twice (loop closing off, then on) and reports both
scale-aligned ATEs; the artifact gate is loops_closed >= 1 and
ATE(loop on) < ATE(loop off).

Run: python tools/mono_loop_drive.py [--frames 1200] [--json MONO_LOOP_r05.json]
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def build_world(n_frames, cfg):
    from render_world import BlobWorld, TEX
    from my_orb_slam2_tpu.utils.synthetic import SyntheticWorld

    overlap = max(n_frames // 9, 80)
    step = 0.15
    yaw = 2.0 * np.pi / (n_frames - overlap)
    R = step / yaw
    rng = np.random.default_rng(11)
    n_blobs = 8000
    theta = rng.uniform(0, 2 * np.pi, n_blobs)
    side = rng.random(n_blobs) < 0.62
    r = np.where(side, R + rng.uniform(3.0, 18.0, n_blobs),
                 R - rng.uniform(3.0, 12.0, n_blobs))
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
    helper = SyntheticWorld(cfg, n_landmarks=8, seed=0)
    poses = helper.circular_trajectory(
        n_frames, forward_per_frame=step, yaw_per_frame=yaw
    )
    return world, poses, step, R


def run_once(frames_img, poses, cfg, use_loop):
    from my_orb_slam2_tpu.models.system import SlamSystem
    from my_orb_slam2_tpu.models.tracking import TrackingState
    from my_orb_slam2_tpu.utils.synthetic import ate_rmse

    system = SlamSystem(cfg, pipeline_depth=3, enable_loop_closing=use_loop)
    system.local_mapper.full_every = 4
    lost = 0
    t0 = time.perf_counter()
    for i, img in enumerate(frames_img):
        info = system.track_mono(img, i / 10.0)
        lost += info["state"] != TrackingState.OK and i > 20
    system.shutdown()
    fps = len(frames_img) / (time.perf_counter() - t0)
    traj = system.tracker.trajectory_poses()
    est_all = [(fid, T) for fid, _, T, l in traj if not l]
    est = np.stack([T for _, T in est_all])
    gt = np.stack([poses[fid] for fid, _ in est_all])
    # Scale-aligned (Sim3) ATE: the monocular evaluation convention.
    ate = ate_rmse(est, gt, align_scale=True)
    loops = system.loop_closer.loops_closed if use_loop else 0
    m = system.tracker.map
    return {
        "fps": round(fps, 2),
        "ate_scale_aligned_m": round(float(ate), 4),
        "lost": int(lost),
        "tracked_frames": len(est_all),
        "loops_closed": int(loops),
        "kfs_live": int(np.asarray(m.kf_valid).sum()),
        "points": int(np.asarray(m.mp_valid).sum()),
        "obs_overflow": int(np.asarray(m.obs_overflow)),
    }


def main():
    from my_orb_slam2_tpu.utils.config import (
        CameraConfig, CapacityConfig, OrbConfig, SlamConfig, Sensor,
        TrackingConfig,
    )
    from render_world import render_view

    n_frames = (
        int(sys.argv[sys.argv.index("--frames") + 1])
        if "--frames" in sys.argv else 1200
    )
    out_json = (
        sys.argv[sys.argv.index("--json") + 1] if "--json" in sys.argv else ""
    )
    H, W = 480, 640
    fx = 0.8 * W
    cfg = SlamConfig(
        sensor=Sensor.MONOCULAR,
        camera=CameraConfig(
            fx=fx, fy=fx, cx=W / 2.0, cy=H / 2.0, bf=0.0,
            th_depth=40.0, width=W, height=H,
        ),
        orb=OrbConfig(n_features=1000),
        capacity=CapacityConfig(max_keyframes=1024, max_map_points=131072),
        tracking=TrackingConfig(max_frames_between_kf=10),
    )
    world, poses, step, R = build_world(n_frames, cfg)
    print(f"mono circuit: R={R:.0f} m, {n_frames} frames", flush=True)

    class _Cam:
        pass

    rc = _Cam()
    rc.fx = rc.fy = fx
    rc.cx, rc.cy = W / 2.0, H / 2.0
    rc.baseline = 0.5

    t0 = time.time()
    frames_img = []
    for i, Tcw in enumerate(poses):
        frames_img.append(render_view(world, rc, H, W, Tcw))
        if i % 300 == 0:
            print(f"  render {i} ({time.time() - t0:.0f}s)", flush=True)

    off = run_once(frames_img, poses, cfg, use_loop=False)
    print("loop OFF:", json.dumps(off), flush=True)
    on = run_once(frames_img, poses, cfg, use_loop=True)
    print("loop ON: ", json.dumps(on), flush=True)

    res = {
        "frames": n_frames,
        "path_m": round(step * n_frames, 1),
        "sensor": "MONOCULAR",
        "sim3_fix_scale": False,
        "loop_off": off,
        "loop_on": on,
        "ate_improvement_pct": round(
            100.0 * (1 - on["ate_scale_aligned_m"] /
                     max(off["ate_scale_aligned_m"], 1e-9)), 1
        ),
    }
    print(json.dumps(res), flush=True)
    if out_json:
        json.dump(res, open(out_json, "w"), indent=1)
    assert on["loops_closed"] >= 1, "free-scale Sim3 loop never fired"
    assert on["ate_scale_aligned_m"] < off["ate_scale_aligned_m"], res


if __name__ == "__main__":
    main()

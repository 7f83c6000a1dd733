"""Augmented-reality demo: track a synthetic scene with a dominant ground
plane, detect the plane from the currently tracked map points, and overlay a
virtual cube + plane grid on the annotated frame.

The headless equivalent of the reference's ROS AR node
(Examples/ROS/ORB_SLAM2/AR/ros_mono_ar.cc + ViewerAR.cc: plane detection
from tracked points + GL cube insertion); output goes to PNG files instead
of a GL window.

Usage: PYTHONPATH=. python examples/ar_demo.py [--frames N] [--out DIR]
"""
import os
import sys

import numpy as np

sys.path.insert(0, ".")

from my_orb_slam2_tpu.utils.config import (
    SlamConfig, CameraConfig, CapacityConfig, Sensor, TrackingConfig,
)
from my_orb_slam2_tpu.utils.synthetic import SyntheticWorld
from my_orb_slam2_tpu.utils import ar, viz
from my_orb_slam2_tpu.models.tracking import Tracker, TrackingState
from my_orb_slam2_tpu.models.local_mapping import LocalMapper

n_frames = int(sys.argv[sys.argv.index("--frames") + 1]) if "--frames" in sys.argv else 24
out_dir = sys.argv[sys.argv.index("--out") + 1] if "--out" in sys.argv else "/tmp/ar_demo"
os.makedirs(out_dir, exist_ok=True)

cfg = SlamConfig(
    sensor=Sensor.STEREO,
    camera=CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=40.0, th_depth=40.0),
    capacity=CapacityConfig(max_keyframes=64, max_map_points=16384),
    tracking=TrackingConfig(min_stereo_init_points=150),
)
CAP = 512
world = SyntheticWorld(cfg, n_landmarks=6000, seed=3)
# Put 60% of the landmarks on a ground plane (y = +1.5, camera looks at it
# from above-left) so there is a dominant plane to detect, like a desk in
# the reference's live AR demo.
rng = np.random.default_rng(3)
n_plane = int(0.6 * len(world.landmarks))
world.landmarks[:n_plane, 1] = 1.5 + rng.normal(0, 0.01, n_plane)

poses = world.circular_trajectory(n_frames, forward_per_frame=0.1, yaw_per_frame=0.003)
# Pitch the camera ~17 deg down toward the ground plane (the reference's AR
# demo points a handheld camera at a desk); pre-multiplying keeps the
# trajectory while tilting the view.
_pitch = np.eye(4, dtype=np.float32)
_c, _s = np.cos(0.3), np.sin(0.3)
_pitch[1, 1], _pitch[1, 2], _pitch[2, 1], _pitch[2, 2] = _c, -_s, _s, _c
poses = np.asarray([_pitch @ T for T in poses])
tracker = Tracker(cfg, CAP, local_mapper=LocalMapper(cfg, run_ba=True))

detected = 0
for i, Tcw in enumerate(poses):
    frame, _ = world.observe(Tcw, CAP, seed=4000 + i)
    info = tracker.track(frame, i / 30.0)
    if info["state"] != TrackingState.OK and i > 0:
        print(f"frame {i}: TRACKING LOST ({info})")
        sys.exit(1)
    if i < 2:
        continue  # let the map settle before fitting
    # Currently tracked map points (the reference fits over
    # mCurrentFrame.mvpMapPoints inliers, ViewerAR::DetectPlane).
    cur_mp = np.asarray(tracker.last_mp)
    tracked = cur_mp[cur_mp >= 0]
    pts_w = np.asarray(tracker.map.mp_pos)[tracked]
    cam_c = np.linalg.inv(info["Tcw"])[:3, 3]
    plane = ar.detect_plane(pts_w, cam_c, seed=i)
    # Render: annotated frame (synthetic: flat gray canvas) + AR overlay.
    img = np.full((cfg.camera.height, cfg.camera.width), 40, np.uint8)
    canvas = viz.draw_frame(
        img, np.asarray(frame.uv), cur_mp >= 0, np.asarray(frame.valid),
    )
    if plane is not None:
        detected += 1
        Tpw = ar.anchor_on_plane(plane, info["Tcw"], dist=4.0)
        ar.draw_plane_grid(
            canvas, info["Tcw"], Tpw, half_extent=1.0, n_lines=9,
            fx=cfg.camera.fx, fy=cfg.camera.fy, cx=cfg.camera.cx, cy=cfg.camera.cy,
        )
        ar.draw_cube(
            canvas, info["Tcw"], Tpw, size=0.3,
            fx=cfg.camera.fx, fy=cfg.camera.fy, cx=cfg.camera.cx, cy=cfg.camera.cy,
        )
    viz.save_png(os.path.join(out_dir, f"ar_{i:04d}.png"), canvas)

print(f"frames={n_frames} planes_detected={detected} out={out_dir}")
assert detected >= (n_frames - 2) // 2, "plane detection too unreliable"
print("AR DEMO OK")

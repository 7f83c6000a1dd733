"""End-to-end drive of the public library surface on a synthetic world:
stereo initialization -> per-frame tracking -> keyframe creation.
Usage: PYTHONPATH=. python examples/synthetic_drive.py [--frames N]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from my_orb_slam2_tpu.utils.config import (
    SlamConfig, CameraConfig, CapacityConfig, Sensor, TrackingConfig,
)
from my_orb_slam2_tpu.utils.synthetic import SyntheticWorld, ate_rmse
from my_orb_slam2_tpu.models.tracking import Tracker, TrackingState
from my_orb_slam2_tpu.models.local_mapping import LocalMapper

n_frames = int(sys.argv[sys.argv.index("--frames") + 1]) if "--frames" in sys.argv else 40

cfg = SlamConfig(
    sensor=Sensor.STEREO,
    camera=CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=40.0, th_depth=40.0),
    capacity=CapacityConfig(max_keyframes=128, max_map_points=16384),
    tracking=TrackingConfig(min_stereo_init_points=150),
)
CAP = 512
world = SyntheticWorld(cfg, n_landmarks=6000, seed=0)
poses = world.circular_trajectory(n_frames, forward_per_frame=0.12, yaw_per_frame=0.012)
mapper = LocalMapper(cfg, run_ba=True, cull_keyframes=True)
tracker = Tracker(cfg, CAP, local_mapper=mapper)
est = []
t0 = time.time()
for i, Tcw in enumerate(poses):
    frame, _ = world.observe(Tcw, CAP, seed=1000 + i, stereo_fraction=0.6)
    info = tracker.track(frame, i / 30.0)
    est.append(info["Tcw"])
    if info["state"] != TrackingState.OK and i > 0:
        print(f"frame {i}: TRACKING LOST ({info})")
        sys.exit(1)
elapsed = time.time() - t0
ate = ate_rmse(np.stack(est), poses)
n_kf = tracker.kf_counter
print(f"frames={n_frames} kfs={n_kf} mapper={mapper.stats} ate_rmse={ate:.4f}m "
      f"wall={elapsed:.1f}s ({n_frames/elapsed:.1f} fps incl. compile)")
assert ate < 0.10, f"ATE too large: {ate}"
print("DRIVE OK")

# --- monocular pipeline drive ----------------------------------------------
from my_orb_slam2_tpu.ops import lie as _lie
import jax.numpy as _jnp

cfg_m = SlamConfig(
    sensor=Sensor.MONOCULAR,
    camera=CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=0.0),
    capacity=CapacityConfig(max_keyframes=64, max_map_points=8192),
)
world_m = SyntheticWorld(cfg_m, n_landmarks=6000, seed=1)
poses_m = []
_Twc = np.eye(4)
for i in range(24):
    poses_m.append(np.linalg.inv(_Twc).astype(np.float32))
    _Twc = _Twc @ np.asarray(_lie.se3_exp(_jnp.asarray([0.07, 0.0, 0.02, 0.0, 0.004, 0.0])))
from my_orb_slam2_tpu.models.local_mapping import LocalMapper as _LM
tracker_m = Tracker(cfg_m, CAP, local_mapper=_LM(cfg_m, cull_keyframes=False))
states_m = []
for i, Tcw in enumerate(poses_m):
    frame, _ = world_m.observe(Tcw, CAP, seed=5000 + i, stereo=False)
    info = tracker_m.track(frame, i / 30.0)
    states_m.append(info["state"])
ok_from = states_m.index(TrackingState.OK) if TrackingState.OK in states_m else -1
assert ok_from >= 0, "mono never initialized"
assert all(s == TrackingState.OK for s in states_m[ok_from:]), states_m
print(f"mono: initialized at frame {ok_from}, tracked {len(states_m)-ok_from} frames OK")
print("MONO DRIVE OK")

"""Build (or load from cache) a KITTI-capacity MapState for probes.

Building the live map takes ~10 minutes of tracking+compiles; for TIMING
probes the exact map content barely matters, so the built state is cached
to /tmp and reused (delete /tmp/slam_capacity_state.npz to force a
rebuild after structural MapState changes).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE = "/tmp/slam_capacity_state.npz"


def kitti_cfg():
    from my_orb_slam2_tpu.utils.config import (
        CameraConfig, CapacityConfig, OrbConfig, SlamConfig, Sensor,
        TrackingConfig,
    )

    return SlamConfig(
        sensor=Sensor.STEREO,
        camera=CameraConfig(
            fx=718.856, fy=718.856, cx=607.19, cy=185.21,
            bf=386.1448, th_depth=35.0, width=1241, height=376,
        ),
        orb=OrbConfig(n_features=2000),
        capacity=CapacityConfig(max_keyframes=1536, max_map_points=262144),
        tracking=TrackingConfig(min_stereo_init_points=300,
                                max_frames_between_kf=10),
    )


def build_or_load(n_frames: int = 60, cap: int = 2048, use_cache: bool = True):
    """Returns (cfg, state, frames[-2:], tracker_stub_info dict)."""
    import jax.numpy as jnp

    from my_orb_slam2_tpu.models import map_state as ms
    from my_orb_slam2_tpu.models.tracking import Tracker
    from my_orb_slam2_tpu.models.local_mapping import LocalMapper
    from my_orb_slam2_tpu.utils.synthetic import SyntheticWorld

    cfg = kitti_cfg()
    world = SyntheticWorld(
        cfg, n_landmarks=120000, seed=0, extent=(25.0, 8.0, 1200.0),
        depth_range=(2.0, 1200.0),
    )
    poses = world.circular_trajectory(
        n_frames, forward_per_frame=0.8, yaw_per_frame=0.001
    )
    frames = [world.observe(T, cap, seed=10_000 + i)[0]
              for i, T in enumerate(poses)]

    fields = ms.MapState._fields
    if use_cache and os.path.exists(CACHE):
        data = np.load(CACHE)
        if set(data.files) >= {f"m_{f}" for f in fields}:
            state = ms.MapState(**{f: jnp.asarray(data[f"m_{f}"]) for f in fields})
            info = {"n_kf": int(data["n_kf"]), "ref_kf": int(data["ref_kf"]),
                    "last_mp": jnp.asarray(data["last_mp"]),
                    "Tcw": data["Tcw"]}
            return cfg, state, frames, info

    mapper = LocalMapper(cfg, run_ba=True, cull_keyframes=True, full_every=4)
    tracker = Tracker(cfg, cap, local_mapper=mapper)
    t0 = time.time()
    for i, frame in enumerate(frames):
        tracker.track(frame, i / 10.0)
    tracker.flush()
    print(f"built capacity map in {time.time()-t0:.0f}s "
          f"(kfs={tracker.n_kf})", file=sys.stderr)
    state = tracker.map
    arrays = {f"m_{f}": np.asarray(getattr(state, f)) for f in fields}
    np.savez_compressed(
        CACHE, **arrays, n_kf=tracker.n_kf, ref_kf=tracker.ref_kf,
        last_mp=np.asarray(tracker.last_mp), Tcw=tracker.Tcw,
    )
    info = {"n_kf": tracker.n_kf, "ref_kf": tracker.ref_kf,
            "last_mp": tracker.last_mp, "Tcw": tracker.Tcw}
    return cfg, state, frames, info

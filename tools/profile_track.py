"""Kernel-level profile of the per-frame tracking dispatch at KITTI
capacity: builds a small live map, runs track_frame under jax.profiler,
and prints the top device ops (the measurement behind splitting decisions —
see full_pass docstring on program-size pessimization).

Run: python tools/profile_track.py
"""

import collections
import glob
import gzip
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from my_orb_slam2_tpu.utils.config import (
        CameraConfig, CapacityConfig, OrbConfig, SlamConfig, Sensor,
        TrackingConfig,
    )
    from my_orb_slam2_tpu.utils.synthetic import SyntheticWorld
    from my_orb_slam2_tpu.models.tracking import Tracker, track_frame

    cfg = SlamConfig(
        sensor=Sensor.STEREO,
        camera=CameraConfig(
            fx=718.856, fy=718.856, cx=607.19, cy=185.21,
            bf=386.1448, th_depth=35.0, width=1241, height=376,
        ),
        orb=OrbConfig(n_features=2000),
        capacity=CapacityConfig(max_keyframes=1536, max_map_points=262144),
        tracking=TrackingConfig(min_stereo_init_points=300),
    )
    CAP = 2048
    world = SyntheticWorld(cfg, n_landmarks=60000, seed=0,
                           extent=(25.0, 8.0, 600.0), depth_range=(2.0, 600.0))
    poses = world.circular_trajectory(8, forward_per_frame=0.8, yaw_per_frame=0.001)
    tracker = Tracker(cfg, CAP)
    frames = []
    for i, Tcw in enumerate(poses):
        frame, _ = world.observe(Tcw, CAP, seed=10_000 + i)
        frames.append(frame)
        tracker.track(frame, i / 10.0)
    state = tracker.map
    frame, last = frames[-1], frames[-2]
    prev = np.eye(4, dtype=np.float32)

    def run():
        m2, cur_mp, packed, _T = track_frame(
            cfg, state, frame, last.uv, tracker.last_mp, last.valid,
            last.octave, tracker.Tcw, prev, False,
            np.int32(tracker.ref_kf), np.int32(3),
        )
        packed.block_until_ready()

    run(); run()
    t0 = time.perf_counter()
    for _ in range(5):
        run()
    print(f"track_frame wall (incl RTT): {(time.perf_counter()-t0)/5*1000:.1f} ms")

    shutil.rmtree("/tmp/jx_track", ignore_errors=True)
    with jax.profiler.trace("/tmp/jx_track"):
        run()
    f = glob.glob("/tmp/jx_track/**/*.trace.json.gz", recursive=True)[0]
    d = json.load(gzip.open(f))
    tot = collections.Counter(); cnt = collections.Counter()
    for e in d.get("traceEvents", []):
        if e.get("ph") == "X":
            tot[e.get("name", "")] += e.get("dur", 0)
            cnt[e.get("name", "")] += 1
    for name, us in tot.most_common(30):
        print(f"{us/1000:9.2f} ms  x{cnt[name]:4d}  {name[:90]}")


if __name__ == "__main__":
    main()

"""Live stereo-stream SLAM driver: frames arrive over a Unix socket on the
producer's clock and CANNOT be paused — the live-input analog of the
reference's ROS stereo node (Examples/ROS/ORB_SLAM2/src/ros_stereo.cc:1-172;
ROS itself is not in this environment, so the transport is a socket with
the same "queue depth 1, keep newest" contract).

Two roles in one file:

  # terminal 1 — consumer (the SLAM system; creates the socket)
  python examples/run_stream.py serve /tmp/slam.sock settings.yaml \
      [--duration 30] [--traj out.txt]

  # terminal 2 — producer (synthetic world camera at a fixed rate)
  python examples/run_stream.py camera /tmp/slam.sock --hz 30 --frames 300

The consumer reports per-frame deadline accounting: a deadline miss is a
processed frame whose wall time exceeded the stream period (the system
fell behind the camera and frames were skipped to catch up).
"""

import argparse
import os
import socket
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def serve(args):
    from my_orb_slam2_tpu.models.system import SlamSystem
    from my_orb_slam2_tpu.utils.config import Sensor, load_yaml_settings
    from my_orb_slam2_tpu.utils.stream import StreamConsumer

    cfg = load_yaml_settings(args.settings, Sensor.STEREO)
    period = 1.0 / cfg.camera.fps if cfg.camera.fps > 0 else 1.0 / 30.0

    from my_orb_slam2_tpu.utils.stream import serve_socket

    srv = serve_socket(args.sock)
    print(f"listening on {args.sock}", flush=True)
    conn, _ = srv.accept()
    consumer = StreamConsumer(conn)
    system = SlamSystem(cfg, pipeline_depth=args.pipeline)

    n_done = 0
    misses = 0
    t_end = time.monotonic() + args.duration
    t_prev = None
    while time.monotonic() < t_end:
        f = consumer.wait(timeout=1.0)
        if f is None:
            if consumer.eof:
                break
            continue
        ts, left, right = f
        t0 = time.monotonic()
        system.track_stereo(left, right, ts)
        n_done += 1
        if t_prev is not None and (t0 - t_prev) > 0 and n_done > 5:
            # Deadline = stream period; the first frames carry compile time.
            if (time.monotonic() - t0) > period:
                misses += 1
        t_prev = t0
    system.shutdown()
    print(
        f"stream done: processed={n_done} received={consumer.received} "
        f"skipped_stale={consumer.skipped} deadline_misses={misses}",
        flush=True,
    )
    if args.traj:
        system.save_trajectory_tum(args.traj)
        print(f"trajectory -> {args.traj}")
    consumer.close()
    srv.close()


def camera(args):
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    from render_world import make_world, pose_for_view, render_stereo
    from tools.make_dataset import _Cam
    from my_orb_slam2_tpu.utils.stream import StreamProducer

    H, W = args.height, args.width
    cam = _Cam(H, W, baseline=0.12)
    world = make_world(seed=args.seed, n_pts=700)
    from my_orb_slam2_tpu.utils.stream import connect_socket

    prod = StreamProducer(connect_socket(args.sock))
    period = 1.0 / args.hz
    t0 = time.monotonic()
    late = 0
    for i in range(args.frames):
        target = t0 + i * period
        now = time.monotonic()
        if now < target:
            time.sleep(target - now)
        else:
            late += now - target > period  # camera clock slipped a frame
        Tcw = pose_for_view(i, step=0.12, phase=world.seed * 0.777)
        left, right = render_stereo(world, cam, H, W, Tcw)
        prod.send(time.monotonic() - t0, left, right)
    prod.close()
    print(f"camera done: sent={prod.sent} dropped={prod.dropped} late={late}",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="role", required=True)
    s = sub.add_parser("serve")
    s.add_argument("sock")
    s.add_argument("settings")
    s.add_argument("--duration", type=float, default=30.0)
    s.add_argument("--pipeline", type=int, default=3)
    s.add_argument("--traj", default="")
    s.set_defaults(fn=serve)
    c = sub.add_parser("camera")
    c.add_argument("sock")
    c.add_argument("--hz", type=float, default=30.0)
    c.add_argument("--frames", type=int, default=300)
    c.add_argument("--height", type=int, default=240)
    c.add_argument("--width", type=int, default=320)
    c.add_argument("--seed", type=int, default=0)
    c.set_defaults(fn=camera)
    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()

"""Live stereo-stream contract tests (reference analog: the ROS nodes,
Examples/ROS/ORB_SLAM2/src/ros_stereo.cc — frames arrive on the producer's
clock; the consumer cannot pause it and keeps only the newest frame).

The transport machinery is tested in-process at 30 Hz; the full
system-under-stream path runs the real SlamSystem against a threaded
producer that never blocks (drops at the sender when the consumer lags).
"""

import os
import sys
import threading
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from my_orb_slam2_tpu.utils.stream import (  # noqa: E402
    StreamConsumer, StreamProducer, stream_pair,
)


def test_stream_roundtrip_and_framing(rng):
    a, b = stream_pair()
    prod, cons = StreamProducer(a), StreamConsumer(b)
    imgs = [(rng.integers(0, 255, (48, 64)).astype(np.uint8),
             rng.integers(0, 255, (48, 64)).astype(np.uint8)) for _ in range(5)]
    for i, (l, r) in enumerate(imgs):
        assert prod.send(float(i), l, r)
    # Consumer drains everything; newest wins, stale counted.
    ts, left, right = cons.wait(1.0)
    assert ts == 4.0
    assert np.array_equal(left, imgs[4][0])
    assert np.array_equal(right, imgs[4][1])
    assert cons.skipped == 4
    assert cons.received == 5
    prod.close()
    cons.close()


def test_producer_never_blocks_when_consumer_stalls(rng):
    """The live contract: a stalled consumer must not stall the producer —
    frames drop at the sender instead (camera semantics)."""
    a, b = stream_pair()
    # Small buffers so the kernel queue fills fast.
    prod, cons = StreamProducer(a, sndbuf=1 << 14), StreamConsumer(b, rcvbuf=1 << 14)
    l = rng.integers(0, 255, (120, 160)).astype(np.uint8)
    t0 = time.monotonic()
    for i in range(60):
        prod.send(float(i), l, l)
    elapsed = time.monotonic() - t0
    assert prod.dropped > 0, "expected sender-side drops with a stalled consumer"
    assert prod.sent + prod.dropped == 60
    # 60 sends with a dead consumer must not take anywhere near 60 frame
    # periods — the producer never blocked on the stall.
    assert elapsed < 1.0, elapsed
    # The frames that were accepted are intact (framing never tears).
    got = 0
    while True:
        f = cons.poll()
        got = cons.received
        if f is None and cons.eof:
            break
        if f is None:
            break
    assert got == prod.sent
    prod.close()
    cons.close()


@pytest.mark.slow
def test_slam_under_live_stream():
    """Full SlamSystem consuming a 30 Hz threaded producer of rendered
    stereo frames: the system tracks while frames drop around it, the
    producer's clock never stalls, and the accounting adds up."""
    from render_world import make_world, pose_for_view, render_stereo
    from tools.make_dataset import _Cam, _write_settings
    from my_orb_slam2_tpu.models.system import SlamSystem
    from my_orb_slam2_tpu.utils.config import Sensor, load_yaml_settings
    import tempfile

    H, W = 240, 320
    cam = _Cam(H, W, baseline=0.12)
    world = make_world(seed=3, n_pts=700)
    n_frames, hz = 300, 30.0

    with tempfile.TemporaryDirectory() as td:
        settings = os.path.join(td, "settings.yaml")
        _write_settings(settings, cam, H, W, "stereo", n_features=500)
        cfg = load_yaml_settings(settings, Sensor.STEREO)

        # Compile OUTSIDE the timed stream (the reference warms nothing,
        # but its first frame doesn't carry a 30 s XLA compile either).
        system = SlamSystem(cfg, pipeline_depth=2)
        wl, wr = render_stereo(world, cam, H, W, pose_for_view(0, step=0.10,
                               phase=world.seed * 0.777))
        system.track_stereo(wl, wr, 0.0)
        system.tracker.flush()

        a, b = stream_pair()
        prod, cons = StreamProducer(a), StreamConsumer(b)
        frame_times = []

        def producer():
            period = 1.0 / hz
            t0 = time.monotonic()
            for i in range(n_frames):
                tgt = t0 + i * period
                now = time.monotonic()
                if now < tgt:
                    time.sleep(tgt - now)
                left, right = render_stereo(
                    world, cam, H, W,
                    pose_for_view(i, step=0.10, phase=world.seed * 0.777))
                t_send0 = time.monotonic()
                prod.send(float(i) / hz, left, right)
                frame_times.append(time.monotonic() - t_send0)
            prod.close()

        th = threading.Thread(target=producer)
        th.start()
        processed = 0
        states = []
        while True:
            f = cons.wait(timeout=2.0)
            if f is None:
                if cons.eof:
                    break
                continue
            ts, left, right = f
            info = system.track_stereo(left, right, ts)
            states.append(info["state"])
            processed += 1
        th.join()
        system.shutdown()

        # Producer contract: no send ever blocked for a frame period.
        assert max(frame_times) < 1.0 / hz + 0.05, max(frame_times)
        assert prod.sent + prod.dropped == n_frames
        # Consumer accounting: everything delivered was either processed or
        # counted as skipped-stale.
        assert cons.received == processed + cons.skipped
        assert processed >= 2
        # The system actually tracked under drop pressure (the stream skips
        # frames, so tracking must survive larger inter-frame motion).
        assert 1 in states, "system never reached OK under the live stream"
        prod.close()
        cons.close()

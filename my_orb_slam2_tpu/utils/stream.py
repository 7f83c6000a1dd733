"""Live stereo-stream transport: the TPU-native analog of the reference's
ROS nodes (Examples/ROS/ORB_SLAM2/src/ros_stereo.cc:1-172).

The reference's live contract is "frames arrive on their own clock and the
consumer cannot pause the producer". Here that contract runs over a Unix
SOCK_SEQPACKET socket — one datagram per frame, with connection semantics
but ATOMIC message delivery: a send either ships the whole frame or fails
with EAGAIN (the frame is dropped at the producer, like a camera whose
client stopped reading; framing can never tear mid-frame).

    message: magic b'SLM1' | f64 timestamp | i32 height | i32 width
             | H*W u8 left image | H*W u8 right image

- `StreamProducer.send()` never blocks; drops are counted in `dropped`.
- `StreamConsumer.poll()` drains everything buffered and returns only the
  NEWEST frame (+ how many stale frames were skipped) — the standard
  real-time policy (the reference's ROS queues are depth-1 for the same
  reason).

No external dependencies; works process-to-process (unix path) or
in-process (socketpair) for tests.
"""

from __future__ import annotations

import socket
import struct
from typing import Optional, Tuple

import numpy as np

MAGIC = b"SLM1"
_HDR = struct.Struct("<4sdii")  # magic, timestamp, h, w
MAX_FRAME = _HDR.size + 2 * 1024 * 2048  # 1024x2048 stereo pair ceiling


class StreamProducer:
    """Pushes stereo pairs into the socket on its own clock; never blocks."""

    def __init__(self, sock: socket.socket, sndbuf: int = 4 << 20):
        self.sock = sock
        try:
            sock.setsockopt(socket.SOL_SOCKET, socket.SO_SNDBUF, sndbuf)
        except OSError:
            pass
        self.sock.setblocking(False)
        self.sent = 0
        self.dropped = 0

    def send(self, ts: float, left: np.ndarray, right: np.ndarray) -> bool:
        h, w = left.shape
        data = (
            _HDR.pack(MAGIC, ts, h, w)
            + np.ascontiguousarray(left, np.uint8).tobytes()
            + np.ascontiguousarray(right, np.uint8).tobytes()
        )
        try:
            self.sock.send(data)  # SEQPACKET: all-or-nothing
        except (BlockingIOError, InterruptedError, OSError):
            self.dropped += 1
            return False
        self.sent += 1
        return True

    def close(self):
        try:
            self.sock.shutdown(socket.SHUT_WR)
        except OSError:
            pass
        self.sock.close()


class StreamConsumer:
    """Drains the socket; returns the newest buffered frame per poll."""

    def __init__(self, sock: socket.socket, rcvbuf: int = 4 << 20):
        self.sock = sock
        try:
            sock.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, rcvbuf)
        except OSError:
            pass
        self.sock.setblocking(False)
        self.skipped = 0
        self.received = 0
        self.eof = False

    def _recv_frame(self):
        try:
            msg = self.sock.recv(MAX_FRAME)
        except (BlockingIOError, InterruptedError):
            return None
        if not msg:
            self.eof = True
            return None
        magic, ts, h, w = _HDR.unpack_from(msg, 0)
        if magic != MAGIC or len(msg) != _HDR.size + 2 * h * w:
            raise ValueError("stream framing lost")
        left = np.frombuffer(msg, np.uint8, h * w, _HDR.size).reshape(h, w).copy()
        right = (
            np.frombuffer(msg, np.uint8, h * w, _HDR.size + h * w)
            .reshape(h, w).copy()
        )
        self.received += 1
        return ts, left, right

    def poll(self) -> Optional[Tuple[float, np.ndarray, np.ndarray]]:
        """Newest complete frame, skipping stale ones; None if none ready."""
        newest = None
        while True:
            f = self._recv_frame()
            if f is None:
                break
            if newest is not None:
                self.skipped += 1
            newest = f
        return newest

    def wait(self, timeout: float) -> Optional[Tuple[float, np.ndarray, np.ndarray]]:
        """poll(), blocking up to `timeout` seconds for a frame."""
        import time

        deadline = time.monotonic() + timeout
        while True:
            f = self.poll()
            if f is not None or self.eof or time.monotonic() >= deadline:
                return f
            time.sleep(0.001)

    def close(self):
        self.sock.close()


def stream_pair() -> Tuple[socket.socket, socket.socket]:
    """(producer_sock, consumer_sock) — an in-process stream for tests."""
    return socket.socketpair(socket.AF_UNIX, socket.SOCK_SEQPACKET)


def serve_socket(path: str) -> socket.socket:
    """Create + listen on a unix SEQPACKET socket path (consumer side)."""
    import os

    try:
        os.unlink(path)
    except OSError:
        pass
    srv = socket.socket(socket.AF_UNIX, socket.SOCK_SEQPACKET)
    srv.bind(path)
    srv.listen(1)
    return srv


def connect_socket(path: str) -> socket.socket:
    """Connect to a serving consumer (producer side)."""
    s = socket.socket(socket.AF_UNIX, socket.SOCK_SEQPACKET)
    s.connect(path)
    return s

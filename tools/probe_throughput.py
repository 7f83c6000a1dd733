"""Sustained tunnel/device throughput probes (fetch-synced, honest).

Each probe enqueues N ops and then fetches a scalar reduction of the last
result via np.asarray (a true sync), giving per-op wall cost at depth.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def main():
    rng = np.random.default_rng(0)

    @jax.jit
    def checksum(a):
        return a.astype(jnp.float32).sum()

    # --- sustained upload bandwidth (300KB u8 images) ---------------------
    ims = [rng.integers(0, 255, (480, 640)).astype(np.uint8) for _ in range(8)]
    # warm
    d = jax.device_put(ims[0]); float(checksum(d))
    for N in (16, 48):
        t0 = time.perf_counter()
        last = None
        for i in range(N):
            last = jax.device_put(ims[i % 8])
        float(checksum(last))
        dt = time.perf_counter() - t0
        mb = N * ims[0].nbytes / 1e6
        print(f"upload_{N}x300KB: {dt*1000:7.1f} ms total, {mb/dt:6.1f} MB/s, {dt/N*1000:6.2f} ms/img")

    # --- sustained fetch bandwidth ----------------------------------------
    big = jax.device_put(rng.standard_normal((512, 512)).astype(np.float32))
    float(checksum(big))
    t0 = time.perf_counter()
    for _ in range(8):
        np.asarray(big)
    dt = time.perf_counter() - t0
    print(f"fetch_8x1MB: {dt*1000:7.1f} ms total, {8*big.nbytes/1e6/dt:6.1f} MB/s")

    sml = jax.device_put(np.zeros(40, np.float32))
    float(checksum(sml))
    t0 = time.perf_counter()
    for _ in range(16):
        np.asarray(sml)
    dt = time.perf_counter() - t0
    print(f"fetch_16x160B: {dt/16*1000:7.2f} ms each (pure RTT)")

    # --- true device throughput of big matmul (N deep, fetch-synced) ------
    x = jax.device_put(rng.standard_normal((2896, 2896)).astype(np.float32))
    float(checksum(x))

    @jax.jit
    def mm(a):
        return a @ a * 1e-6

    y = mm(x); float(checksum(y))
    N = 30
    t0 = time.perf_counter()
    y = x
    for _ in range(N):
        y = mm(y)
    float(checksum(y))
    dt = time.perf_counter() - t0
    gflop = 2 * 2896**3 / 1e9
    print(f"matmul48G_deep{N}: {dt/N*1000:7.2f} ms/op, {gflop/(dt/N)/1000:6.1f} TFLOPS")

    # --- extraction true throughput ----------------------------------------
    from my_orb_slam2_tpu.utils.config import (
        CameraConfig, CapacityConfig, OrbConfig, SlamConfig, Sensor, TrackingConfig,
    )
    from my_orb_slam2_tpu.models.frame import FrameFactory

    H, W = 480, 640
    cfg = SlamConfig(
        sensor=Sensor.STEREO,
        camera=CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=40.0,
                            th_depth=40.0, width=W, height=H),
        orb=OrbConfig(n_features=1000),
        capacity=CapacityConfig(max_keyframes=64, max_map_points=16384),
        tracking=TrackingConfig(min_stereo_init_points=200),
    )
    factory = FrameFactory(cfg)
    ex = factory.extractor
    dL = jax.device_put(ims[0])
    kps, _ = ex._extract(dL)
    float(checksum(kps.desc))
    N = 20
    t0 = time.perf_counter()
    for _ in range(N):
        kps, _ = ex._extract(dL)
    float(checksum(kps.desc))
    dt = time.perf_counter() - t0
    print(f"extract_deep{N}: {dt/N*1000:7.2f} ms/op (device-resident input)")

    # extraction including fresh upload each time (the real frame path)
    N = 20
    t0 = time.perf_counter()
    for i in range(N):
        d = jax.device_put(ims[i % 8])
        kps, _ = ex._extract(d)
    float(checksum(kps.desc))
    dt = time.perf_counter() - t0
    print(f"upload+extract_deep{N}: {dt/N*1000:7.2f} ms/op")

    # full stereo frontend
    dR = jax.device_put(ims[1])
    fd = factory._stereo(dL, dR)
    float(checksum(fd.desc))
    N = 20
    t0 = time.perf_counter()
    for _ in range(N):
        fd = factory._stereo(dL, dR)
    float(checksum(fd.desc))
    dt = time.perf_counter() - t0
    print(f"build_stereo_deep{N}: {dt/N*1000:7.2f} ms/op (device-resident)")


if __name__ == "__main__":
    main()

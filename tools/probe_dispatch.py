"""Probe axon tunnel dispatch semantics: is enqueue async? what's the RTT?

Times:
  enqueue_only      jitted call returning device arrays, no block
  sync_after_1      block_until_ready after 1 enqueue
  sync_after_4      block_until_ready after 4 chained enqueues (queue depth)
  bg_thread_fetch   np.asarray on a background thread while host continues
"""

import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def main():
    x = jax.device_put(np.random.default_rng(0).standard_normal((512, 512)).astype(np.float32))
    x.block_until_ready()

    @jax.jit
    def step(a):
        return a @ a * 0.001 + a

    # warmup/compile
    y = step(x); y.block_until_ready()

    # enqueue-only latency
    ts = []
    for _ in range(30):
        t0 = time.perf_counter()
        y = step(x)
        ts.append(time.perf_counter() - t0)
    y.block_until_ready()
    print(f"enqueue_only_ms   {np.median(ts)*1000:8.3f}")

    # single dispatch + sync
    ts = []
    for _ in range(20):
        t0 = time.perf_counter()
        y = step(x)
        y.block_until_ready()
        ts.append(time.perf_counter() - t0)
    print(f"sync_after_1_ms   {np.median(ts)*1000:8.3f}")

    # 4 chained dispatches + one sync: if RTT dominates, this ~= sync_after_1
    ts = []
    for _ in range(20):
        t0 = time.perf_counter()
        y = step(x)
        for _ in range(3):
            y = step(y)
        y.block_until_ready()
        ts.append(time.perf_counter() - t0)
    print(f"sync_after_4_ms   {np.median(ts)*1000:8.3f}")

    # background-thread fetch: does a worker thread hide the RTT?
    pool = ThreadPoolExecutor(1)
    ts = []
    for _ in range(20):
        y = step(x)
        fut = pool.submit(np.asarray, y)
        t0 = time.perf_counter()
        # host "does other work" for ~5ms
        time.sleep(0.005)
        _ = fut.result()
        ts.append(time.perf_counter() - t0)
    print(f"bg_fetch_wall_ms  {np.median(ts)*1000:8.3f}  (5ms of host work included)")

    # device_put async?
    im = np.zeros((480, 640), np.uint8)
    ts = []
    for _ in range(20):
        t0 = time.perf_counter()
        d = jax.device_put(im)
        ts.append(time.perf_counter() - t0)
    d.block_until_ready()
    print(f"device_put_enq_ms {np.median(ts)*1000:8.3f}")

    ts = []
    for _ in range(20):
        t0 = time.perf_counter()
        d = jax.device_put(im)
        d.block_until_ready()
        ts.append(time.perf_counter() - t0)
    print(f"device_put_syn_ms {np.median(ts)*1000:8.3f}")

    # copy_to_host_async support
    y = step(x); y.block_until_ready()
    try:
        y.copy_to_host_async()
        t0 = time.perf_counter()
        np.asarray(y)
        print(f"fetch_after_async_ms {(time.perf_counter()-t0)*1000:8.3f}")
    except Exception as e:
        print("copy_to_host_async failed:", e)
    z = step(x); z.block_until_ready()
    t0 = time.perf_counter()
    np.asarray(z)
    print(f"fetch_cold_ms     {(time.perf_counter()-t0)*1000:8.3f}")


if __name__ == "__main__":
    main()

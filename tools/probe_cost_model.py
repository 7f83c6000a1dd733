"""Isolate the axon per-execute cost driver: input size? output size?
kernel count? repeated-identical-call caching?"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def sync_time(fn, args_list, n=12, warm=2):
    for i in range(warm):
        r = fn(*args_list[i % len(args_list)])
        jax.tree_util.tree_leaves(r)[0].block_until_ready()
    ts = []
    for i in range(n):
        a = args_list[i % len(args_list)]
        t0 = time.perf_counter()
        r = fn(*a)
        jax.tree_util.tree_leaves(r)[0].block_until_ready()
        ts.append(time.perf_counter() - t0)
    return np.median(ts) * 1000.0


def main():
    rng = np.random.default_rng(0)

    @jax.jit
    def tiny(a):
        return a @ a * 0.001 + a

    x512 = jax.device_put(rng.standard_normal((512, 512)).astype(np.float32))
    x512b = jax.device_put(rng.standard_normal((512, 512)).astype(np.float32))
    x512.block_until_ready(); x512b.block_until_ready()
    print(f"tiny_same_arg_ms      {sync_time(tiny, [(x512,)]):8.3f}")
    print(f"tiny_alt_args_ms      {sync_time(tiny, [(x512,), (x512b,)]):8.3f}")

    # input-size scaling, single kernel
    for mb, shape in [(8, (1448, 1448)), (32, (2896, 2896))]:
        xs = jax.device_put(rng.standard_normal(shape).astype(np.float32))
        xs.block_until_ready()
        print(f"matmul_{mb}MB_ms        {sync_time(tiny, [(xs,)]):8.3f}")

    # output-size scaling: small in, big out
    @jax.jit
    def bigout(a):
        return jnp.broadcast_to(a.sum(), (2048, 2048)) + 0.0

    print(f"bigout_16MB_ms        {sync_time(bigout, [(x512,)]):8.3f}")

    # kernel-count scaling: 60 sequential cheap kernels on small data
    @jax.jit
    def manyops(a):
        b = a
        for i in range(60):
            b = jnp.roll(b, 1, axis=0) * 1.0001 + 0.001 * i
        return b

    print(f"manyops60_512_ms      {sync_time(manyops, [(x512,)]):8.3f}")

    # gather-heavy: vmapped dynamic_slice like patch gather
    atlas = jax.device_put(rng.standard_normal((1848, 656)).astype(np.float32))
    atlas.block_until_ready()
    ax = jax.device_put(rng.integers(50, 600, 1024).astype(np.int32))
    ay = jax.device_put(rng.integers(50, 1800, 1024).astype(np.int32))

    @jax.jit
    def gath(a, xx, yy):
        def one(y, x):
            return jax.lax.dynamic_slice(a, (y, x), (44, 44))
        return jax.vmap(one)(yy, xx).sum(axis=(1, 2))

    print(f"gather1024x44_ms      {sync_time(gath, [(atlas, ax, ay)]):8.3f}")

    # top_k on ~100k elements
    big = jax.device_put(rng.standard_normal((3072, 900)).astype(np.float32))
    big.block_until_ready()

    @jax.jit
    def topk(a):
        v, i = jax.lax.top_k(a.reshape(-1), 256)
        return v

    print(f"topk_2.7M_ms          {sync_time(topk, [(big,)]):8.3f}")

    # uint8 -> float + elementwise over image
    im = jax.device_put(rng.integers(0, 255, (480, 640)).astype(np.uint8))
    im.block_until_ready()

    @jax.jit
    def imf(a):
        f = a.astype(jnp.float32)
        return f * 2.0 + 1.0

    print(f"u8_image_cast_ms      {sync_time(imf, [(im,)]):8.3f}")


if __name__ == "__main__":
    main()

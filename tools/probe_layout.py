"""Layout probe: cost of elementwise/einsum ops on (P, K)-trailing vs
flattened layouts at the dense-BA shapes (P=4096, K=16, Cf=16).

Quantifies the (8, 128) tile padding penalty that shapes the dense LM
step's real cost on the target chip.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_layout.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    P, K, Cf = 4096, 16, 16
    key = jax.random.PRNGKey(0)

    def timeit(fn, *args, reps=8, warm=2):
        out = None
        for _ in range(warm):
            out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps * 1000.0

    # elementwise chain x20 on the same data in three layouts
    def chain(x):
        for _ in range(20):
            x = x * 1.0001 + 0.1
        return x

    a_pk = jax.random.normal(key, (P, K))
    a_kp = a_pk.T.copy()
    a_flat = a_pk.reshape(-1)
    f = jax.jit(chain)
    print(f"elemwise x20 (P,K)   {timeit(f, a_pk):7.2f} ms")
    print(f"elemwise x20 (K,P)   {timeit(f, a_kp):7.2f} ms")
    print(f"elemwise x20 (P*K,)  {timeit(f, a_flat):7.2f} ms")

    # Gram einsum in the current trailing-small layout vs flattened-lane
    J1 = jax.random.normal(key, (P, K, 3, 6))
    J2 = jax.random.normal(key, (P, K, 3, 6))
    g1 = jax.jit(lambda a, b: jnp.einsum("pkij,pkil->pkjl", a, b))
    print(f"gram (P,K,3,6)->(P,K,6,6) {timeit(g1, J1, J2):7.2f} ms")

    J1f = jax.random.normal(key, (18, P * K))
    g2 = jax.jit(
        lambda a, b: jnp.stack(
            [
                sum(a[3 * j + i] * b[3 * l + i] for i in range(3))
                for j in range(6)
                for l in range(6)
            ]
        )
    )
    print(f"gram (18,P*K)->(36,P*K)   {timeit(g2, J1f, J1f):7.2f} ms")

    # camera reduction: one-hot contraction vs segment layout
    oh = jax.nn.one_hot(
        jax.random.randint(key, (P, K), 0, Cf), Cf, dtype=jnp.float32
    )
    Ue = jax.random.normal(key, (P, K, 6, 6))
    r1 = jax.jit(lambda o, u: jnp.einsum("pkc,pkjl->cjl", o, u))
    print(f"cam-reduce (P,K,6,6)      {timeit(r1, oh, Ue):7.2f} ms")

    ohf = oh.reshape(P * K, Cf)
    Uef = jax.random.normal(key, (36, P * K))
    r2 = jax.jit(lambda o, u: (u @ o).reshape(6, 6, Cf))
    print(f"cam-reduce (36,P*K)@(PK,C){timeit(r2, ohf, Uef):7.2f} ms")

    # small cholesky
    S = jax.random.normal(key, (96, 96))
    S = S @ S.T + 96 * jnp.eye(96)
    ch = jax.jit(
        lambda s, b: jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(s), b)
    )
    b = jnp.ones((96,))
    print(f"cho_solve 96x96           {timeit(ch, S, b):7.2f} ms")


if __name__ == "__main__":
    main()

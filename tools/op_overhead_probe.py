#!/usr/bin/env python3
"""Microbenchmark: per-op overhead inside one XLA program on this backend.

Times jitted chains of K dependent small ops (elementwise on a tiny
array, dynamic-update-slice on a mid-size array, and the pack smoother's
Pallas sweep kernel) to calibrate the op budget of the fused production
step: step_time ~= n_ops * per_op_overhead in the latency-bound regime.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def timeit(fn, reps=5):
    import jax
    jax.block_until_ready(fn())
    ts = []
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(fn())
        ts.append(time.time() - t0)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp
    print("backend:", jax.default_backend())

    results = {}

    # 1. chain of K dependent elementwise ops on a small block array
    for n, tag in ((2048, "small"), ):
        x = jnp.ones((n, 10, 10), jnp.float32)
        for K in (10, 100, 400):
            def chain(x=x, K=K):
                @jax.jit
                def f(x):
                    for i in range(K):
                        x = x * 1.000001 + 1e-7
                        # defeat fusion: force a gather between ops
                        x = x[jnp.arange(x.shape[0])]
                    return x
                return f
            f = chain()
            t = timeit(lambda: f(x))
            results[f"chain_{tag}_K{K}_ms"] = round(t * 1e3, 2)

    # 2. chain of K dynamic-update-slice ops on a multi-MB state array
    st = jnp.ones((20, 32768, 100), jnp.float32)  # ~260 MB f32
    for K in (5, 20):
        @jax.jit
        def g(st, K=K):
            for i in range(K):
                st = st.at[3, 5:2000].add(1.0)
            return st
        t = timeit(lambda: g(st))
        results[f"state_dus_K{K}_ms"] = round(t * 1e3, 2)

    # 3. scatter into the state (masked .at[ids].set pattern)
    ids = jnp.arange(2048)

    for K in (5, 20):
        @jax.jit
        def h(st, K=K):
            for i in range(K):
                st = st.at[3, ids].set(st[4, ids])
            return st
        t = timeit(lambda: h(st))
        results[f"state_scatter_K{K}_ms"] = round(t * 1e3, 2)

    for k, v in results.items():
        print(k, v)


if __name__ == "__main__":
    main()

"""Does this chip's XLA accelerate int8 MXU math? (microbenchmark)

Times bf16 vs int8(+int32 accum) matmul at flagship-ish shapes, and a
ResNet-ish conv, to decide whether an int8 post-training-quantized serving
path for the frozen towers is worth building (v5e MXU lists 2x int8
throughput vs bf16).

Usage: python benchmarks/bench_int8_micro.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 50


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def chained(run_n, *state):
    import jax
    t0 = time.time()
    float(run_n(*state, 1))
    cs = time.time() - t0

    def timed(k):
        t0 = time.time()
        float(run_n(*state, k))
        return time.time() - t0

    timed(1)
    t1 = min(timed(1) for _ in range(3))
    tN = min(timed(1 + ITERS) for _ in range(2))
    return (tN - t1) / ITERS, cs


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    float(jnp.ones(()).sum())
    log(f"tunnel warmup: {time.time() - t0:.1f}s")
    rng = np.random.default_rng(0)
    results = {}

    # ---- matmul: [4096, 2048] x [2048, 2048] ----
    M, K, N = 4096, 2048, 2048
    a16 = jnp.asarray(rng.normal(size=(M, K)) * 0.1, jnp.bfloat16)
    b16 = jnp.asarray(rng.normal(size=(K, N)) * 0.1, jnp.bfloat16)
    a8 = jnp.asarray(rng.integers(-127, 127, size=(M, K)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 127, size=(K, N)), jnp.int8)

    # real data dependency per iteration (a[0,0] <- f(acc)) so XLA cannot
    # hoist the matmul out of the loop
    @jax.jit
    def mm16(a, b, n):
        def body(_, acc):
            aa = a.at[0, 0].set(acc.astype(a.dtype) * 1e-20)
            c = jnp.dot(aa, b, preferred_element_type=jnp.float32)
            # consume the WHOLE product: a c[0,0]-only consumer lets XLA
            # slice the matmul down to one dot product (measured "1718
            # TFLOP/s")
            return acc + jnp.sum(c) * 1e-9
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    @jax.jit
    def mm8(a, b, n):
        def body(_, acc):
            aa = a.at[0, 0].set((acc % 100).astype(jnp.int8))
            c = jax.lax.dot_general(
                aa, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return acc + jnp.sum(c)
        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    gflop = 2 * M * K * N / 1e9
    dt, cs = chained(mm16, a16, b16)
    results["mm_bf16_us"] = round(dt * 1e6, 1)
    log(f"matmul bf16  {dt*1e6:8.1f} us  ({gflop/dt/1e3:6.1f} TFLOP/s; "
        f"compile {cs:.0f}s)")
    dt, cs = chained(mm8, a8, b8)
    results["mm_int8_us"] = round(dt * 1e6, 1)
    log(f"matmul int8  {dt*1e6:8.1f} us  ({gflop/dt/1e3:6.1f} TOP/s; "
        f"compile {cs:.0f}s)")

    # ---- conv: [64, 64, 64, 256] x 3x3x256x256 (resnet stage-2-ish) ----
    x16 = jnp.asarray(rng.normal(size=(64, 64, 64, 256)) * 0.1, jnp.bfloat16)
    w16 = jnp.asarray(rng.normal(size=(3, 3, 256, 256)) * 0.1, jnp.bfloat16)
    x8 = jnp.asarray(rng.integers(-127, 127, size=(64, 64, 64, 256)), jnp.int8)
    w8 = jnp.asarray(rng.integers(-127, 127, size=(3, 3, 256, 256)), jnp.int8)
    dn = jax.lax.conv_dimension_numbers(x16.shape, w16.shape,
                                        ("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def cv16(x, w, n):
        def body(_, acc):
            xx = x.at[0, 0, 0, 0].set(acc.astype(x.dtype) * 1e-20)
            y = jax.lax.conv_general_dilated(
                xx, w, (1, 1), "SAME",
                dimension_numbers=dn, preferred_element_type=jnp.float32)
            return acc + jnp.sum(y) * 1e-9
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    @jax.jit
    def cv8(x, w, n):
        def body(_, acc):
            xx = x.at[0, 0, 0, 0].set((acc % 100).astype(jnp.int8))
            y = jax.lax.conv_general_dilated(
                xx, w, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            return acc + jnp.sum(y)
        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    cflop = 2 * 64 * 64 * 64 * 256 * 256 * 9 / 1e9
    dt, cs = chained(cv16, x16, w16)
    results["conv_bf16_us"] = round(dt * 1e6, 1)
    log(f"conv  bf16  {dt*1e6:8.1f} us  ({cflop/dt/1e3:6.1f} TFLOP/s; "
        f"compile {cs:.0f}s)")
    try:
        dt, cs = chained(cv8, x8, w8)
        results["conv_int8_us"] = round(dt * 1e6, 1)
        log(f"conv  int8  {dt*1e6:8.1f} us  ({cflop/dt/1e3:6.1f} TOP/s; "
            f"compile {cs:.0f}s)")
    except Exception as e:  # int8 convs may be unsupported
        results["conv_int8_us"] = None
        log(f"conv  int8  FAILED: {type(e).__name__}: {e}")

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()

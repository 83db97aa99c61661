"""ViT-geometry attention-block variants (B=64, S=197, 12 heads, d=768).

Isolates the per-layer attention block (QKV proj -> attention -> out proj,
residual) to pick the layout for models/vit.py. MLP excluded. 12 chained
"layers" reusing one weight set, fori_loop timing, one fetch.

Variants:
  v0_current     separate QKV Dense + [B,H,S,D] transposes (r1 layout)
  v1_no_transpose separate QKV, heads stay in [B,S,H,D], einsum does the rest
  v2_fused_qkv   one [768->2304] matmul + no-transpose einsums
  v3_bf16_softmax v2 with bf16 score softmax (numerics change - measure only)
  v4_jax_dpa     jax.nn.dot_product_attention

Usage: python benchmarks/bench_vit_attn_variants.py [batch [seq]]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 30
LAYERS = 12


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    float(jnp.ones(()).sum())
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 197
    D, H = 768, 12
    hd = D // H
    dt_ = jnp.bfloat16

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(B, S, D)) * 0.02, dt_)
    wq, wk, wv, wo = (jnp.asarray(rng.normal(size=(D, D)) * 0.02, dt_)
                      for _ in range(4))
    bq, bk, bv, bo = (jnp.asarray(rng.normal(size=(D,)) * 0.02, dt_)
                      for _ in range(4))
    wqkv = jnp.concatenate([wq, wk, wv], axis=1)
    bqkv = jnp.concatenate([bq, bk, bv])
    scale = 1.0 / np.sqrt(hd)

    def v0(x):
        def h(w, b):
            return (x @ w + b).reshape(B, S, H, hd).transpose(0, 2, 1, 3)
        q, k, v = h(wq, bq), h(wk, bk), h(wv, bv)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * scale
        a = jax.nn.softmax(s, axis=-1).astype(dt_)
        c = jnp.einsum("bhqk,bhkd->bhqd", a, v,
                       preferred_element_type=jnp.float32).astype(dt_)
        c = c.transpose(0, 2, 1, 3).reshape(B, S, D)
        return x + (c @ wo + bo)

    def v1(x):
        def h(w, b):
            return (x @ w + b).reshape(B, S, H, hd)
        q, k, v = h(wq, bq), h(wk, bk), h(wv, bv)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * scale
        a = jax.nn.softmax(s, axis=-1).astype(dt_)
        c = jnp.einsum("bhqk,bkhd->bqhd", a, v,
                       preferred_element_type=jnp.float32).astype(dt_)
        return x + (c.reshape(B, S, D) @ wo + bo)

    def v2(x):
        qkv = (x @ wqkv + bqkv).reshape(B, S, 3, H, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * scale
        a = jax.nn.softmax(s, axis=-1).astype(dt_)
        c = jnp.einsum("bhqk,bkhd->bqhd", a, v,
                       preferred_element_type=jnp.float32).astype(dt_)
        return x + (c.reshape(B, S, D) @ wo + bo)

    def v3(x):
        qkv = (x @ wqkv + bqkv).reshape(B, S, 3, H, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * dt_(scale)
        a = jax.nn.softmax(s, axis=-1)
        c = jnp.einsum("bhqk,bkhd->bqhd", a, v)
        return x + (c.reshape(B, S, D) @ wo + bo)

    def v4(x):
        def h(w, b):
            return (x @ w + b).reshape(B, S, H, hd)
        q, k, v = h(wq, bq), h(wk, bk), h(wv, bv)
        c = jax.nn.dot_product_attention(q, k, v)
        return x + (c.reshape(B, S, D) @ wo + bo)

    results = {}
    ref_out = None
    for name, fn in (("v0_current", v0), ("v1_no_transpose", v1),
                     ("v2_fused_qkv", v2), ("v3_bf16_softmax", v3),
                     ("v4_jax_dpa", v4)):
        @jax.jit
        def run_n(x, n, fn=fn):
            def body(i, carry):
                x, acc = carry
                y = fn(x + (acc * 1e-8).astype(dt_))
                for _ in range(LAYERS - 1):
                    y = fn(y)
                return y, acc + y.astype(jnp.float32).mean()
            _, acc = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))
            return acc

        t0 = time.time()
        float(run_n(x0, 1))
        cs = time.time() - t0

        def timed(n):
            t0 = time.time()
            float(run_n(x0, n))
            return time.time() - t0

        timed(1)
        t1 = min(timed(1) for _ in range(3))
        tN = min(timed(1 + ITERS) for _ in range(2))
        per_layer_us = (tN - t1) / ITERS / LAYERS * 1e6
        results[name] = round(per_layer_us, 1)
        log(f"{name:16s} {per_layer_us:8.1f} us/attention-block "
            f"(compile {cs:.0f}s)")
        out = fn(x0)
        if ref_out is None:
            ref_out = out
        else:
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                        - ref_out.astype(jnp.float32))))
            log(f"{'':16s} max|diff vs v0| = {err:.3e}")
            results[name + "_maxdiff"] = err

    results.update({"batch": B, "seq": S})
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()

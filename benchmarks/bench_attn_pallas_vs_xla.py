"""Pallas fused attention vs XLA einsum path across batch sizes.

ViT-base attention core (H=12, S=197, D=64, bf16). Round 1 measured the
head-batched Pallas kernel TIED with XLA at B=64 (benchmarks/pallas_sga.md)
— but profile_vit_family.py shows the tower's per-image cost RISES from
B=64 to B=128 (365 -> 402 us/img), pointing at the materialized
[B, 12, 197, 197] fp32 score tensor (238 MB at B=128) leaving XLA's fusion
window. This sweep checks whether the VMEM-resident kernel wins at the
larger serving batches.

Usage: python benchmarks/bench_attn_pallas_vs_xla.py [batch ...]
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

    from t5_resnet_vqa_tpu.ops.pallas.attention import fused_attention

    float(jnp.ones(()).sum())
    batches = [int(a) for a in sys.argv[1:]] or [64, 128, 256]
    H, S, D = 12, 197, 64
    dt_ = jnp.bfloat16
    scale = 1.0 / np.sqrt(D)
    results = {}

    for B in batches:
        rng = np.random.default_rng(0)
        q0, k0, v0 = (jnp.asarray(rng.normal(size=(B, H, S, D)) * 0.1, dt_)
                      for _ in range(3))

        def xla_attn(q, k, v):
            s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                           preferred_element_type=jnp.float32) * scale
            a = jax.nn.softmax(s, axis=-1).astype(dt_)
            return jnp.einsum("bhqk,bhkd->bhqd", a, v,
                              preferred_element_type=jnp.float32).astype(dt_)

        def pallas_attn(q, k, v):
            out = fused_attention(q, k, v)
            assert out is not None, "not on TPU"
            return out.astype(dt_)

        for name, fn in (("xla", xla_attn), ("pallas", pallas_attn)):
            @jax.jit
            def run_n(q, k, v, n, fn=fn):
                def body(_, carry):
                    q, acc = carry
                    o = q
                    for _ in range(LAYERS):
                        o = fn(o, k, v)
                    acc = acc + o.astype(jnp.float32).mean()
                    return q + (acc * 1e-8).astype(dt_), acc
                _, acc = jax.lax.fori_loop(0, n, body, (q, jnp.float32(0)))
                return acc

            t0 = time.time()
            float(run_n(q0, k0, v0, 1))
            cs = time.time() - t0

            def timed(n):
                t0 = time.time()
                float(run_n(q0, k0, v0, n))
                return time.time() - t0

            timed(1)
            t1 = min(timed(1) for _ in range(3))
            tN = min(timed(1 + ITERS) for _ in range(2))
            us = (tN - t1) / ITERS / LAYERS * 1e6
            results[f"{name}_b{B}_us"] = round(us, 1)
            log(f"B={B:4d} {name:7s} {us:8.1f} us/attention (compile {cs:.0f}s)")

        err = float(jnp.max(jnp.abs(
            xla_attn(q0, k0, v0).astype(jnp.float32)
            - pallas_attn(q0, k0, v0).astype(jnp.float32))))
        results[f"maxdiff_b{B}"] = err
        log(f"       maxdiff {err:.3e}")

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()

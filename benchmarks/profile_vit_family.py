"""Segment profile + batch sweep for the ViT VQA family (1 TPU chip).

Decomposes the VitVQAModel forward (frozen ViT-base tower -> T5-base
encoder -> fuse -> T5 decoder -> classifier) into:
  tower      ViTModel forward alone (197 tokens, 12 layers)
  full_fwd   whole model, deterministic
and sweeps batch sizes to find the utilization knee (VERDICT weak #5: r1
measured only B=64). fori_loop chaining, single fetch (see bench.py).

Usage: python benchmarks/profile_vit_family.py [batch ...]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 20


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def chained_ms(run_n, *state):
    t0 = time.time()
    float(run_n(*state, 1))
    cs = time.time() - t0

    def timed(n):
        t0 = time.time()
        float(run_n(*state, n))
        return time.time() - t0

    timed(1)
    t1 = min(timed(1) for _ in range(3))
    tN = min(timed(1 + ITERS) for _ in range(2))
    return (tN - t1) / ITERS * 1e3, cs


def main():
    import jax
    import jax.numpy as jnp

    from t5_resnet_vqa_tpu.models.vit import ViTModel
    from t5_resnet_vqa_tpu.models.vit_vqa import VitVQAModel

    float(jnp.ones(()).sum())
    batches = [int(a) for a in sys.argv[1:]] or [64, 128, 256]
    rng = np.random.default_rng(0)
    results = {}

    for B in batches:
        batch = dict(
            question_input_ids=jnp.asarray(
                rng.integers(2, 32100, size=(B, 16)), jnp.int32),
            question_attention_masks=jnp.ones((B, 16), jnp.int32),
            decoder_question_input_ids=jnp.asarray(
                rng.integers(2, 32100, size=(B, 20)), jnp.int32),
            decoder_question_attention_masks=jnp.ones((B, 20), jnp.int32),
            pixel_values=jnp.asarray(
                rng.random((B, 224, 224, 3)), jnp.float32),
            annotation_ids=jnp.asarray(
                rng.integers(0, 170, size=(B,)), jnp.int32),
        )
        model = VitVQAModel(answer_spaces=170, dtype=jnp.bfloat16)
        params = model.init(jax.random.PRNGKey(0), **batch)["params"]

        tower = ViTModel(model.vit_config, dtype=jnp.bfloat16)
        tower_params = params["vision_model"]

        @jax.jit
        def run_tower(p, px, n):
            def body(_, carry):
                px, acc = carry
                _, pooled = tower.apply({"params": p}, px)
                px = px + (1e-30 * jnp.sum(pooled)).astype(px.dtype)
                return px, acc + jnp.sum(pooled).astype(jnp.float32)
            _, acc = jax.lax.fori_loop(0, n, body, (px, jnp.float32(0)))
            return acc

        @jax.jit
        def run_full(p, b, n):
            def body(_, carry):
                px, acc = carry
                lp, _ = model.apply({"params": p},
                                    **dict(b, pixel_values=px),
                                    deterministic=True)
                px = px + (1e-30 * jnp.sum(lp)).astype(px.dtype)
                return px, acc + jnp.sum(lp)
            _, acc = jax.lax.fori_loop(0, n, body,
                                       (b["pixel_values"], jnp.float32(0)))
            return acc

        dt_t, cs = chained_ms(run_tower, tower_params, batch["pixel_values"])
        log(f"B={B}: tower     {dt_t:7.2f} ms  ({B / dt_t * 1e3:6.0f} img/s; "
            f"compile {cs:.0f}s)")
        dt_f, cs = chained_ms(run_full, params, batch)
        log(f"B={B}: full_fwd  {dt_f:7.2f} ms  ({B / dt_f * 1e3:6.0f} "
            f"pairs/s; compile {cs:.0f}s)")
        results[f"b{B}"] = {"tower_ms": round(dt_t, 2),
                            "full_ms": round(dt_f, 2),
                            "pairs_per_s": round(B / dt_f * 1e3, 1)}

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()

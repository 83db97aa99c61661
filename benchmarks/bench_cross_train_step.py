"""CrossAttention (ViT x RoBERTa) family full train step — the fourth row
of the per-family training matrix (VERDICT r3 missing #4).

CrossAttentionVitVQAModel production step: interleaved frozen-ViT /
trainable-RoBERTa layers over concatenated image+text tokens, grouped
AdamW(amsgrad) + clip with the frozen ViT modules excluded from the
optimizer. No cached variant: the frozen ViT layers are interleaved with
trainable ones (each consumes the other's running hidden state), so there
is no frozen prefix to precompute — the feature cache correctly refuses
this family. Same anti-hoisting fori_loop discipline as bench.py.

Usage: python benchmarks/bench_cross_train_step.py [batch ...]
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


def bench_batch(B):
    import jax
    import jax.numpy as jnp
    import optax

    from t5_resnet_vqa_tpu.core.config import Config
    from t5_resnet_vqa_tpu.models.cross_attention_vqa import (
        CrossAttentionVitVQAModel)
    from t5_resnet_vqa_tpu.train.optimizer import build_optimizer

    rng = np.random.default_rng(0)
    batch = dict(
        question_input_ids=jnp.asarray(
            rng.integers(2, 50000, size=(B, 16)), jnp.int32),
        pixel_values=jnp.asarray(rng.random((B, 224, 224, 3)), jnp.float32),
        annotation_ids=jnp.asarray(rng.integers(0, 170, size=(B,)), jnp.int32),
    )
    model = CrossAttentionVitVQAModel(answer_spaces=170, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]
    cfg = Config()
    tx, _, _ = build_optimizer(cfg.optimizer, cfg.lr_scheduler,
                               num_training_steps=10_000,
                               gradient_clipping=1.0,
                               frozen_modules=model.frozen_modules())
    opt_state = jax.jit(tx.init)(params)
    if jax.devices()[0].platform == "tpu":
        base_rng = jax.random.key(42, impl="rbg")
    else:
        base_rng = jax.random.PRNGKey(42)

    @jax.jit
    def run_n(p, s, b, n):
        def body(i, carry):
            p, s, acc = carry
            bb = dict(b, pixel_values=b["pixel_values"]
                      + (acc * 1e-20).astype(b["pixel_values"].dtype))
            def loss_fn(pp):
                _, loss = model.apply(
                    {"params": pp}, **bb, deterministic=False,
                    rngs={"dropout": jax.random.fold_in(base_rng, i)})
                return loss
            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, s = tx.update(grads, s, p)
            return optax.apply_updates(p, updates), s, acc + loss
        p, s, acc = jax.lax.fori_loop(0, n, body, (p, s, jnp.float32(0)))
        return acc

    t0 = time.time()
    _ = float(run_n(params, opt_state, batch, 1))
    log(f"B={B}: compile+first-run {time.time() - t0:.1f}s")

    def timed(n):
        t0 = time.time()
        _ = float(run_n(params, opt_state, batch, n))
        return time.time() - t0

    timed(1)
    t1 = min(timed(1) for _ in range(3))
    tN = min(timed(1 + ITERS) for _ in range(2))
    dt = (tN - t1) / ITERS
    log(f"B={B}: {dt * 1e3:.2f} ms/step = {B / dt:.0f} pairs/s")
    return dt


def main():
    import jax
    t0 = time.time()
    _ = float(jax.numpy.ones(()).sum())
    log(f"tunnel warmup: {time.time() - t0:.1f}s "
        f"(device: {jax.devices()[0].platform})")
    batches = [int(a) for a in sys.argv[1:]] or [64, 128]
    for b in batches:
        dt = bench_batch(b)
        print(json.dumps({
            "metric": "cross_attention_train_step", "batch": b,
            "ms_per_step": round(dt * 1e3, 2),
            "pairs_per_sec": round(b / dt, 1)}), flush=True)


if __name__ == "__main__":
    main()

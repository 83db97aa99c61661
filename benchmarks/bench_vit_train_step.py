"""ViT-family full train step: in-graph tower vs frozen-feature cache.

VitVQAModel production step (frozen ViT-base -> T5-base enc+dec -> fuse ->
classifier; grouped-AdamW(amsgrad) + clip, frozen modules excluded, rbg
dropout). The frozen tower is 87% of the family's forward
(profile_vit_family.py), so the cache (TrainerConfig.cache_frozen_features)
should dominate here. Same anti-hoisting discipline as
bench_train_step.py (vision inputs perturbed per iteration).

Usage: python benchmarks/bench_vit_train_step.py [batch ...] [qN] [dN]
(qN/dN override the question/decoder token lengths — measures the
adaptive_question_len trim, e.g. `64 q10 d12`)
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


def bench_batch(B, qlen=16, dlen=20):
    import jax
    import jax.numpy as jnp
    import optax

    from t5_resnet_vqa_tpu.core.config import Config
    from t5_resnet_vqa_tpu.models.vit_vqa import VitVQAModel
    from t5_resnet_vqa_tpu.train.optimizer import build_optimizer

    rng = np.random.default_rng(0)
    batch = dict(
        question_input_ids=jnp.asarray(
            rng.integers(2, 32100, size=(B, qlen)), jnp.int32),
        question_attention_masks=jnp.ones((B, qlen), jnp.int32),
        decoder_question_input_ids=jnp.asarray(
            rng.integers(2, 32100, size=(B, dlen)), jnp.int32),
        decoder_question_attention_masks=jnp.ones((B, dlen), jnp.int32),
        pixel_values=jnp.asarray(rng.random((B, 224, 224, 3)), jnp.float32),
        annotation_ids=jnp.asarray(rng.integers(0, 170, size=(B,)), jnp.int32),
    )
    model = VitVQAModel(answer_spaces=170, dtype=jnp.bfloat16)
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
            bb = dict(b)
            for k in ("pixel_values", "vision_features"):
                if k in bb:
                    bb[k] = bb[k] + (acc * 1e-20).astype(bb[k].dtype)
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

    def measure(b, tag):
        t0 = time.time()
        _ = float(run_n(params, opt_state, b, 1))
        log(f"B={B}: {tag} compile+first-run {time.time() - t0:.1f}s")

        def timed(n):
            t0 = time.time()
            _ = float(run_n(params, opt_state, b, n))
            return time.time() - t0

        timed(1)
        t1 = min(timed(1) for _ in range(3))
        tN = min(timed(1 + ITERS) for _ in range(2))
        dt = (tN - t1) / ITERS
        log(f"B={B}: {tag} {dt * 1e3:.2f} ms/step = {B / dt:.0f} pairs/s")
        return dt

    dt = measure(batch, "images")
    feats = jax.jit(model.compute_vision_features)(
        params, batch["pixel_values"])
    cached = {k: v for k, v in batch.items() if k != "pixel_values"}
    cached["vision_features"] = feats
    dt_c = measure(cached, "cached")
    return dt, dt_c


def main():
    import jax
    t0 = time.time()
    _ = float(jax.numpy.ones(()).sum())
    log(f"tunnel warmup: {time.time() - t0:.1f}s")
    qlen, dlen = 16, 20
    batches = []
    for a in sys.argv[1:]:
        if a.startswith("q"):
            qlen = int(a[1:])
        elif a.startswith("d"):
            dlen = int(a[1:])
        else:
            batches.append(int(a))
    batches = batches or [64, 128]
    for b in batches:
        dt, dt_c = bench_batch(b, qlen, dlen)
        print(json.dumps({
            "metric": "vit_train_step", "batch": b,
            "qlen": qlen, "dlen": dlen,
            "ms_per_step": round(dt * 1e3, 2),
            "pairs_per_sec": round(b / dt, 1),
            "cached_ms_per_step": round(dt_c * 1e3, 2),
            "cached_pairs_per_sec": round(b / dt_c, 1)}), flush=True)


if __name__ == "__main__":
    main()

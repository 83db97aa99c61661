"""FasterRCNN-FPN family full train step: in-graph tower vs feature cache.

FasterRcnnVQAModel production step (frozen ResNet50+FPN 'pool' ->
T5-base + 3xSGA; grouped-AdamW(amsgrad) + clip, frozen modules excluded,
rbg dropout). The cacheable feature is tiny ([4, 4, 256] = 8 KB bf16 per
image), so the cache's win here is almost exactly the tower+FPN forward.
Same harness discipline as bench_train_step.py.

Usage: python benchmarks/bench_frcnn_train_step.py [batch ...]
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
    from t5_resnet_vqa_tpu.models.faster_rcnn_vqa import FasterRcnnVQAModel
    from t5_resnet_vqa_tpu.train.optimizer import build_optimizer

    rng = np.random.default_rng(0)
    batch = dict(
        question_input_ids=jnp.asarray(
            rng.integers(2, 32100, size=(B, 16)), jnp.int32),
        question_attention_masks=jnp.ones((B, 16), jnp.int32),
        image_tensors=jnp.asarray(rng.random((B, 256, 256, 3)), jnp.float32),
        annotation_ids=jnp.asarray(rng.integers(0, 170, size=(B,)), jnp.int32),
    )
    model = FasterRcnnVQAModel(answer_spaces=170, dtype=jnp.bfloat16)
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
            for k in ("image_tensors", "vision_features"):
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
        params, batch["image_tensors"])
    cached = {k: v for k, v in batch.items() if k != "image_tensors"}
    cached["vision_features"] = feats
    dt_c = measure(cached, "cached")
    return dt, dt_c


def main():
    import jax
    t0 = time.time()
    _ = float(jax.numpy.ones(()).sum())
    log(f"tunnel warmup: {time.time() - t0:.1f}s")
    batches = [int(a) for a in sys.argv[1:]] or [128]
    for b in batches:
        dt, dt_c = bench_batch(b)
        print(json.dumps({
            "metric": "frcnn_train_step", "batch": b,
            "ms_per_step": round(dt * 1e3, 2),
            "pairs_per_sec": round(b / dt, 1),
            "cached_ms_per_step": round(dt_c * 1e3, 2),
            "cached_pairs_per_sec": round(b / dt_c, 1)}), flush=True)


if __name__ == "__main__":
    main()

"""Flagship training-step throughput on one TPU chip.

Measures the FULL production train step (fwd + bwd + grouped-AdamW update +
global-norm clip 1.0, exactly the program `train/trainer.py:_build_steps`
jit-compiles) for ResNet50 + T5-base + 3xSGA (`ResnetVQAModel`), the
BASELINE.json north-star config. The reference publishes no throughput
numbers (SURVEY.md §6); its train batch is 4 on one GPU.

Timing through the async axon tunnel (see bench.py): N parameter-carrying
steps inside ONE jitted `lax.fori_loop` — each iteration consumes the
previous iteration's params, so the chain cannot be overlapped — one scalar
fetch, per-step = (t(1+N) - t(1)) / N.

Usage:  python benchmarks/bench_train_step.py [batch ...]
Writes one human table to stderr and one JSON line per batch to stdout.
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


def make_batch(batch_size, rng):
    import jax.numpy as jnp
    return dict(
        question_input_ids=jnp.asarray(
            rng.integers(2, 32100, size=(batch_size, 16)), jnp.int32),
        question_attention_masks=jnp.ones((batch_size, 16), jnp.int32),
        image_tensors=jnp.asarray(
            rng.random((batch_size, 256, 256, 3)), jnp.float32),
        annotation_ids=jnp.asarray(
            rng.integers(0, 170, size=(batch_size,)), jnp.int32),
    )


def bench_batch(batch_size):
    import jax
    import jax.numpy as jnp
    import optax

    from t5_resnet_vqa_tpu.core.config import Config
    from t5_resnet_vqa_tpu.models.resnet_vqa import ResnetVQAModel
    from t5_resnet_vqa_tpu.train.optimizer import build_optimizer

    model = ResnetVQAModel(answer_spaces=170, vision_model_name="resnet50",
                           dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    batch = make_batch(batch_size, rng)
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]
    cfg = Config()
    # production optimizer: the trainer excludes stop_gradient'd modules from
    # the update entirely (trainer.py passes model.frozen_modules()); r1's
    # bench omitted this and paid AMSGrad moments + decay on the frozen
    # ResNet50's 25M params every step.
    tx, _, _ = build_optimizer(cfg.optimizer, cfg.lr_scheduler,
                               num_training_steps=10_000,
                               gradient_clipping=1.0,
                               frozen_modules=model.frozen_modules())
    opt_state = jax.jit(tx.init)(params)
    # production dropout-RNG path (TrainerConfig.fast_dropout_rng): TPU
    # hardware RNG for mask bits — threefry mask generation alone measured
    # ~8 ms/step at B=128 (benchmarks/bench_bwd_variants.py)
    if jax.devices()[0].platform == "tpu":
        base_rng = jax.random.key(42, impl="rbg")
    else:
        base_rng = jax.random.PRNGKey(42)

    # NOTE: the vision input must vary per iteration — with the frozen tower
    # excluded from the optimizer its params are loop-invariant, and XLA
    # hoists the whole tower out of the fori_loop on a constant image batch
    # (measured: hoisted "images" step == cached step). The 1e-20 perturb
    # defeats the hoist without changing the math measurably.
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
        log(f"B={batch_size}: {tag} compile+first-run {time.time() - t0:.1f}s")

        def timed(n):
            t0 = time.time()
            _ = float(run_n(params, opt_state, b, n))
            return time.time() - t0

        timed(1)
        t1 = min(timed(1) for _ in range(3))
        tN = min(timed(1 + ITERS) for _ in range(2))
        dt = (tN - t1) / ITERS
        log(f"B={batch_size}: {tag} {dt * 1e3:.2f} ms/step = "
            f"{batch_size / dt:.0f} pairs/s")
        return dt

    dt = measure(batch, "images")
    # frozen-feature cache path (TrainerConfig.cache_frozen_features):
    # the tower drops out of the step; vision_features arrive pre-gathered
    feats = jax.jit(model.compute_vision_features)(
        params, batch["image_tensors"])
    cached_batch = {k: v for k, v in batch.items() if k != "image_tensors"}
    cached_batch["vision_features"] = feats
    dt_c = measure(cached_batch, "cached")
    return dt, batch_size / dt, dt_c, batch_size / dt_c


def main():
    import jax
    # burn the one-time tunnel warmup before timing anything
    t0 = time.time()
    _ = float(jax.numpy.ones(()).sum())
    log(f"tunnel warmup: {time.time() - t0:.1f}s "
        f"(device: {jax.devices()[0].platform})")
    batches = [int(a) for a in sys.argv[1:]] or [32, 64, 128]
    for b in batches:
        dt, pairs, dt_c, pairs_c = bench_batch(b)
        print(json.dumps({"metric": "train_step_pairs_per_sec",
                          "batch": b, "ms_per_step": round(dt * 1e3, 2),
                          "value": round(pairs, 1), "unit": "pairs/s",
                          "cached_ms_per_step": round(dt_c * 1e3, 2),
                          "cached_pairs_per_sec": round(pairs_c, 1)}),
              flush=True)


if __name__ == "__main__":
    main()

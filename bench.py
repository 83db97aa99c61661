"""Benchmark: VQA pairs/sec/chip, ResNet50 + T5-base + 3xSGA forward.

North-star metric from BASELINE.json: flagship ResnetVQAModel forward
throughput on one TPU chip vs the PyTorch-CPU reference-equivalent pipeline
(the reference publishes no throughput numbers — SURVEY §6 — so the baseline
is measured here: the same math wired out of HF torch ResNet/T5 plus the
reference's own SGA modules, eval mode, fp32, reference batch size 4).

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": "pairs/s", "vs_baseline": R}
Diagnostics go to stderr. The line also carries the cached TRAIN-step
throughput (``train_cached_*`` keys, VERDICT r3 #4) so the round JSONs
track training as well as the forward headline; that segment is fail-soft —
any error there drops the keys and never disturbs the headline metric.
"""

import json
import sys
import time

BATCH_TPU = 128   # measured sweet spot (bench_forward_bsweep.py r4: 8672/7705/7131 pairs/s at 128/256/512)
TPU_WARMUP = 5
TPU_ITERS = 50
BATCH_TORCH = 4          # the reference's train batch size
TORCH_ITERS = 5

# The torch-CPU denominator pinned from idle-host measurements: rounds 1-3
# measured 5.52 / 5.24 / 5.79 pairs/s (691-764 ms/batch); round 4's live
# measurement read 1.52 pairs/s because the host was contended (the soak +
# watcher were running), which made vs_baseline jump 3.8x with an unchanged
# numerator (VERDICT r4 weak #1). vs_baseline now divides by this constant
# so the ratio moves ONLY when the TPU number does; the live measurement is
# still taken (min over iterations, which resists transient load) and
# reported as a diagnostic with a contention flag.
PINNED_CPU_BASELINE = 5.5


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_tpu() -> float:
    """On-device timing: N data-dependent forward steps inside one jitted
    fori_loop, one scalar fetch at the end. (Per-dispatch wall timing is
    meaningless through the async axon tunnel — dispatches return before
    execution — so the loop forces N sequential executions and the fetch is
    the only sync point. Per-step cost = (t(N) - t(1)) / (N - 1).)"""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from t5_resnet_vqa_tpu.models.resnet_vqa import ResnetVQAModel

    model = ResnetVQAModel(answer_spaces=170, vision_model_name="resnet50",
                           dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    batch = dict(
        question_input_ids=jnp.asarray(
            rng.integers(2, 32100, size=(BATCH_TPU, 16)), jnp.int32),
        question_attention_masks=jnp.ones((BATCH_TPU, 16), jnp.int32),
        image_tensors=jnp.asarray(
            rng.random((BATCH_TPU, 256, 256, 3)), jnp.float32),
    )
    params = model.init(jax.random.PRNGKey(0), **batch,
                        annotation_ids=None)["params"]

    def forward(p, b):
        log_probs, _ = model.apply({"params": p}, **b, deterministic=True)
        return log_probs

    @jax.jit
    def run_n(p, b, n):
        def body(_, carry):
            images, acc = carry
            lp = forward(p, dict(b, image_tensors=images))
            # data dependence between iterations (1e-30 * sum can't be
            # algebraically folded away) so the loop can't be parallelized
            images = images + (1e-30 * jnp.sum(lp)).astype(images.dtype)
            return images, acc + jnp.sum(lp)
        images, acc = jax.lax.fori_loop(
            0, n, body, (b["image_tensors"], jnp.float32(0)))
        return acc

    # The axon tunnel pays a large one-time warmup on the FIRST host fetch
    # in a process; do it on a trivial program so the model compile below
    # is measured honestly.
    t0 = time.time()
    _ = float(jnp.ones(()).sum())
    log(f"tunnel warmup: {time.time() - t0:.1f}s")

    t0 = time.time()
    _ = float(run_n(params, batch, 1))
    log(f"tpu compile+first-run: {time.time() - t0:.1f}s "
        f"(device: {jax.devices()[0].platform})")

    def timed(n):
        t0 = time.time()
        _ = float(run_n(params, batch, n))
        return time.time() - t0

    timed(1)                       # warm the fetch path
    t1 = min(timed(1) for _ in range(3))
    tN = min(timed(1 + TPU_ITERS) for _ in range(3))
    dt = (tN - t1) / TPU_ITERS
    pairs_per_sec = BATCH_TPU / dt
    log(f"tpu: t(1)={t1 * 1e3:.1f}ms t({1 + TPU_ITERS})={tN * 1e3:.1f}ms -> "
        f"{dt * 1e3:.3f} ms/batch({BATCH_TPU}) = {pairs_per_sec:.1f} pairs/s")
    return pairs_per_sec


def bench_train_cached(batch_size: int = 256) -> float:
    """Cached-feature TRAIN step pairs/s (diagnostic, VERDICT r3 #4).

    The production trainable step under the frozen-feature cache
    (TrainerConfig.cache_frozen_features): fwd + bwd + grouped-AdamW +
    clip with the frozen ResNet50 excluded and its features precomputed —
    exactly benchmarks/bench_train_step.py's "cached" variant, at the
    B=256 sweet spot it measured (39.3 ms/step on chip, round 3)."""
    import jax
    import jax.numpy as jnp
    import optax
    import numpy as np

    from t5_resnet_vqa_tpu.core.config import Config
    from t5_resnet_vqa_tpu.models.resnet_vqa import ResnetVQAModel
    from t5_resnet_vqa_tpu.train.optimizer import build_optimizer

    model = ResnetVQAModel(answer_spaces=170, vision_model_name="resnet50",
                           dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    batch = dict(
        question_input_ids=jnp.asarray(
            rng.integers(2, 32100, size=(batch_size, 16)), jnp.int32),
        question_attention_masks=jnp.ones((batch_size, 16), jnp.int32),
        image_tensors=jnp.asarray(
            rng.random((batch_size, 256, 256, 3)), jnp.float32),
        annotation_ids=jnp.asarray(
            rng.integers(0, 170, size=(batch_size,)), jnp.int32),
    )
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]
    cfg = Config()
    tx, _, _ = build_optimizer(cfg.optimizer, cfg.lr_scheduler,
                               num_training_steps=10_000,
                               gradient_clipping=1.0,
                               frozen_modules=model.frozen_modules())
    opt_state = jax.jit(tx.init)(params)
    feats = jax.jit(model.compute_vision_features)(
        params, batch.pop("image_tensors"))
    batch["vision_features"] = feats
    if jax.devices()[0].platform == "tpu":
        base_rng = jax.random.key(42, impl="rbg")
    else:
        base_rng = jax.random.PRNGKey(42)

    @jax.jit
    def run_n(p, s, b, n):
        def body(i, carry):
            p, s, acc = carry
            # perturb the loop-invariant input so XLA cannot hoist work
            # out of the fori_loop (see bench_train_step.py NOTE)
            bb = dict(b, vision_features=b["vision_features"]
                      + (acc * 1e-20).astype(b["vision_features"].dtype))
            def loss_fn(pp):
                _, loss = model.apply(
                    {"params": pp}, **bb, deterministic=False,
                    rngs={"dropout": jax.random.fold_in(base_rng, i)})
                return loss
            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, s = tx.update(grads, s, p)
            return optax.apply_updates(p, updates), s, acc + loss
        p, s, acc = jax.lax.fori_loop(0, n, body,
                                      (p, s, jnp.float32(0)))
        return acc

    iters = 20
    t0 = time.time()
    _ = float(run_n(params, opt_state, batch, 1))
    log(f"train-cached compile+first-run: {time.time() - t0:.1f}s")

    def timed(n):
        t0 = time.time()
        _ = float(run_n(params, opt_state, batch, n))
        return time.time() - t0

    timed(1)
    t1 = min(timed(1) for _ in range(3))
    tN = min(timed(1 + iters) for _ in range(2))
    dt = (tN - t1) / iters
    pairs_per_sec = batch_size / dt
    log(f"train-cached: {dt * 1e3:.2f} ms/step(B={batch_size}) = "
        f"{pairs_per_sec:.1f} pairs/s")
    return pairs_per_sec


def bench_torch_cpu() -> float:
    import numpy as np
    import torch
    import transformers

    sys.path.insert(0, "/root/reference")
    from model.multi_head_vision_text_attn import (
        SGA, ImageConfiguration, TextConfiguration)

    rn = transformers.ResNetModel(transformers.ResNetConfig(
        num_channels=3, embedding_size=64,
        hidden_sizes=[256, 512, 1024, 2048], depths=[3, 4, 6, 3],
        layer_type="bottleneck", hidden_act="relu")).eval()
    t5 = transformers.T5EncoderModel(transformers.T5Config(
        d_model=768, d_kv=64, d_ff=3072, num_layers=12, num_heads=12,
        feed_forward_proj="relu", tie_word_embeddings=False)).eval()
    proj = torch.nn.ConvTranspose2d(2048, 768, 3, 1, 1).eval()
    sgas = [SGA(ImageConfiguration(), TextConfiguration()).eval()
            for _ in range(3)]
    pool = torch.nn.Linear(768, 1).eval()
    cls = torch.nn.Linear(768, 170).eval()

    B = BATCH_TORCH
    imgs = torch.randn(B, 3, 256, 256)
    ids = torch.randint(2, 32100, (B, 16))
    mask = torch.ones(B, 16, dtype=torch.long)

    def fwd():
        with torch.no_grad():
            feats = rn(imgs).last_hidden_state
            vis = proj(feats)
            text = t5(input_ids=ids, attention_mask=mask).last_hidden_state
            flat = vis.view(B, 768, -1).permute(0, 2, 1)
            fused = None
            for sga in sgas:
                fused = sga(text, flat)
                flat = fused
            att = torch.softmax(pool(fused), dim=1).transpose(1, 2)
            p = torch.bmm(att, fused).squeeze(1)
            return torch.nn.functional.log_softmax(cls(p), dim=-1)

    fwd()  # warmup
    # min over per-iteration times: a contended host inflates the mean but
    # the fastest iteration stays close to the idle-host truth
    times = []
    for _ in range(TORCH_ITERS):
        t0 = time.time()
        fwd()
        times.append(time.time() - t0)
    dt = min(times)
    pairs_per_sec = B / dt
    log(f"torch-cpu: min {dt * 1e3:.1f} ms/batch({B}) over {TORCH_ITERS} "
        f"iters (mean {sum(times) / len(times) * 1e3:.1f}) = "
        f"{pairs_per_sec:.2f} pairs/s")
    return pairs_per_sec


def main():
    tpu = bench_tpu()
    train_batch = 256
    try:
        train = bench_train_cached(train_batch)
    except Exception as e:  # fail-soft: never risk the headline metric
        log(f"train-cached diagnostic failed (skipping): {e!r}")
        train = None
    try:
        measured = bench_torch_cpu()
    except Exception as e:   # fail-soft: the denominator is pinned anyway
        log(f"torch-cpu live measurement failed (skipping): {e!r}")
        measured = None
    out = {
        "metric": "vqa_pairs_per_sec_per_chip_resnet50_t5base_fwd",
        "value": round(tpu, 1),
        "unit": "pairs/s",
        # round-comparable: fixed idle-host denominator (see
        # PINNED_CPU_BASELINE) — moves only when the TPU numerator does
        "vs_baseline": round(tpu / PINNED_CPU_BASELINE, 1),
        "cpu_baseline_pinned": PINNED_CPU_BASELINE,
    }
    if measured is not None:
        out["cpu_baseline_measured"] = round(measured, 2)
        # sanity: a live number far under the pinned one means the host was
        # contended during measurement, not that torch got slower
        contended = measured < 0.5 * PINNED_CPU_BASELINE
        if contended:
            out["cpu_baseline_contended"] = True
            log(f"WARNING: live CPU baseline {measured:.2f} pairs/s is "
                f"<50% of the pinned {PINNED_CPU_BASELINE} — host "
                f"contention; vs_baseline uses the pinned constant")
    if train is not None:
        out["train_cached_pairs_per_sec"] = round(train, 1)
        out["train_cached_batch"] = train_batch
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Forward throughput for the remaining model families, one TPU chip.

Completes the per-family perf matrix (bench.py: ResnetVQA flagship;
bench_vit_forward.py: VitVQA):

  * FasterRcnnVQAModel — ResNet50 body + FPN 'pool' level + T5-base + 3xSGA
    (the reference's faster-rcnn variant, faster_rcnn_vqa_model.py)
  * CrossAttentionVitVQAModel — ViT-base x RoBERTa-base interleaved layers
    (vit_vqa_model.py:24-125; dead code in the reference, live here)

Same timing discipline as bench.py (fori_loop chaining, single fetch).
Usage: python benchmarks/bench_all_families.py [batch]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 30


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _time_forward(model, params, batch, img_key):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run_n(p, b, n):
        def body(_, carry):
            img, acc = carry
            lp, _ = model.apply({"params": p}, **dict(b, **{img_key: img}),
                                deterministic=True)
            img = img + (1e-30 * jnp.sum(lp)).astype(img.dtype)
            return img, acc + jnp.sum(lp)
        _, acc = jax.lax.fori_loop(0, n, body,
                                   (batch[img_key], jnp.float32(0)))
        return acc

    t0 = time.time()
    _ = float(run_n(params, batch, 1))
    log(f"  compile+first-run {time.time() - t0:.1f}s")

    def timed(n):
        t0 = time.time()
        _ = float(run_n(params, batch, n))
        return time.time() - t0

    timed(1)
    t1 = min(timed(1) for _ in range(3))
    tN = min(timed(1 + ITERS) for _ in range(2))
    return (tN - t1) / ITERS


def bench_faster_rcnn(B):
    import jax
    import jax.numpy as jnp
    from t5_resnet_vqa_tpu.models.faster_rcnn_vqa import FasterRcnnVQAModel

    model = FasterRcnnVQAModel(answer_spaces=170, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    batch = dict(
        question_input_ids=jnp.asarray(
            rng.integers(2, 32100, (B, 16)), jnp.int32),
        question_attention_masks=jnp.ones((B, 16), jnp.int32),
        image_tensors=jnp.asarray(rng.random((B, 256, 256, 3)), jnp.float32),
    )
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]
    return _time_forward(model, params, batch, "image_tensors")


def bench_cross_attention(B):
    import jax
    import jax.numpy as jnp
    from t5_resnet_vqa_tpu.models.cross_attention_vqa import (
        CrossAttentionVitVQAModel)

    model = CrossAttentionVitVQAModel(answer_spaces=170, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    batch = dict(
        question_input_ids=jnp.asarray(
            rng.integers(2, 50000, (B, 16)), jnp.int32),
        pixel_values=jnp.asarray(
            rng.standard_normal((B, 224, 224, 3)), jnp.float32),
    )
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]
    return _time_forward(model, params, batch, "pixel_values")


def main():
    import jax
    t0 = time.time()
    _ = float(jax.numpy.ones(()).sum())
    log(f"tunnel warmup: {time.time() - t0:.1f}s "
        f"(device: {jax.devices()[0].platform})")
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    for name, fn in (("faster_rcnn_fpn_t5_fwd", bench_faster_rcnn),
                     ("cross_attention_vit_roberta_fwd",
                      bench_cross_attention)):
        log(f"{name} (B={B}):")
        dt = fn(B)
        pairs = B / dt
        log(f"  {dt * 1e3:.2f} ms/fwd = {pairs:.0f} pairs/s")
        print(json.dumps({"metric": name, "batch": B,
                          "ms_per_fwd": round(dt * 1e3, 2),
                          "value": round(pairs, 1), "unit": "pairs/s"}),
              flush=True)


if __name__ == "__main__":
    main()

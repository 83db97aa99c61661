"""ViT-base + T5-base encoder-decoder (VitVQAModel) forward throughput,
one TPU chip.

The reference's best-WUPS variant (0.4191, README.md:72-74). Same on-device
timing discipline as bench.py: N data-dependent forwards in one jitted
`fori_loop`, one scalar fetch, per-step = (t(1+N) - t(1)) / N.

Usage: python benchmarks/bench_vit_forward.py [batch ...]
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


def bench_batch(batch_size):
    import jax
    import jax.numpy as jnp

    from t5_resnet_vqa_tpu.models.vit_vqa import VitVQAModel

    model = VitVQAModel(answer_spaces=170, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    batch = dict(
        question_input_ids=jnp.asarray(
            rng.integers(2, 32100, size=(batch_size, 16)), jnp.int32),
        question_attention_masks=jnp.ones((batch_size, 16), jnp.int32),
        decoder_question_input_ids=jnp.asarray(
            rng.integers(2, 32100, size=(batch_size, 20)), jnp.int32),
        decoder_question_attention_masks=jnp.ones((batch_size, 20), jnp.int32),
        pixel_values=jnp.asarray(
            rng.standard_normal((batch_size, 224, 224, 3)), jnp.float32),
    )
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]

    @jax.jit
    def run_n(p, b, n):
        def body(_, carry):
            px, acc = carry
            lp, _ = model.apply({"params": p}, **dict(b, pixel_values=px),
                                deterministic=True)
            px = px + (1e-30 * jnp.sum(lp)).astype(px.dtype)
            return px, acc + jnp.sum(lp)
        _, acc = jax.lax.fori_loop(0, n, body,
                                   (b["pixel_values"], jnp.float32(0)))
        return acc

    t0 = time.time()
    _ = float(run_n(params, batch, 1))
    log(f"B={batch_size}: compile+first-run {time.time() - t0:.1f}s")

    def timed(n):
        t0 = time.time()
        _ = float(run_n(params, batch, n))
        return time.time() - t0

    timed(1)
    t1 = min(timed(1) for _ in range(3))
    tN = min(timed(1 + ITERS) for _ in range(2))
    dt = (tN - t1) / ITERS
    pairs = batch_size / dt
    log(f"B={batch_size}: {dt * 1e3:.2f} ms/fwd = {pairs:.0f} pairs/s")
    return dt, pairs


def main():
    import jax
    t0 = time.time()
    _ = float(jax.numpy.ones(()).sum())
    log(f"tunnel warmup: {time.time() - t0:.1f}s "
        f"(device: {jax.devices()[0].platform})")
    for b in [int(a) for a in sys.argv[1:]] or [64, 128]:
        dt, pairs = bench_batch(b)
        print(json.dumps({"metric": "vit_t5_fwd_pairs_per_sec", "batch": b,
                          "ms_per_fwd": round(dt * 1e3, 2),
                          "value": round(pairs, 1), "unit": "pairs/s"}),
              flush=True)


if __name__ == "__main__":
    main()

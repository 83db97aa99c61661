"""Greedy/beam answer generation throughput (VitVQAModel), one TPU chip.

The reference's generative decode is a dead stub (vit_vqa_model.py:294-341);
models/generation.py is the working implementation (full-sequence decoder
passes inside lax.fori_loop, static shapes, no KV cache at <=25 tokens).
This measures it end-to-end: 5 generated tokens over the T5 vocab.

Timing: the whole generate call is ONE jitted program (the fori_loop lives
inside); reported ms_per_call is the median of call+fetch wall times and
therefore INCLUDES one host-fetch round-trip (~32ms through this tunnel) —
a serving-shaped latency number, not pure device time.

Usage: python benchmarks/bench_generation.py [batch]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from t5_resnet_vqa_tpu.models.generation import (beam_generate,
                                                     greedy_generate)
    from t5_resnet_vqa_tpu.models.vit_vqa import VitVQAModel

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    t0 = time.time()
    _ = float(jnp.ones(()).sum())
    log(f"tunnel warmup: {time.time() - t0:.1f}s "
        f"(device: {jax.devices()[0].platform})")

    model = VitVQAModel(answer_spaces=170, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    batch = dict(
        question_input_ids=jnp.asarray(
            rng.integers(2, 32100, (B, 16)), jnp.int32),
        question_attention_masks=jnp.ones((B, 16), jnp.int32),
        decoder_question_input_ids=jnp.asarray(
            rng.integers(2, 32100, (B, 20)), jnp.int32),
        decoder_question_attention_masks=jnp.ones((B, 20), jnp.int32),
        pixel_values=jnp.asarray(
            rng.standard_normal((B, 224, 224, 3)), jnp.float32),
    )
    variables = {"params": model.init(jax.random.PRNGKey(0),
                                      **batch)["params"]}

    greedy = jax.jit(lambda p, b: greedy_generate(model, p, **b))
    beam = jax.jit(lambda p, b: beam_generate(model, p, **b))

    def fetch(r):
        # greedy -> ids; beam -> (ids, scores)
        return np.asarray(r[0] if isinstance(r, tuple) else r)

    for name, fn in (("greedy", greedy), ("beam3", beam)):
        t0 = time.time()
        out = fetch(fn(variables, batch))
        log(f"{name}: compile+first {time.time() - t0:.1f}s "
            f"out shape {out.shape}")

        def timed():
            t0 = time.time()
            _ = fetch(fn(variables, batch))
            return time.time() - t0

        timed()
        ts = sorted(timed() for _ in range(5))
        dt = ts[len(ts) // 2]
        print(json.dumps({
            "metric": f"vit_t5_generate_{name}", "batch": B,
            "ms_per_call": round(dt * 1e3, 1),
            "value": round(B / dt, 1), "unit": "answers/s"}), flush=True)
        log(f"{name}: {dt * 1e3:.1f} ms/call = {B / dt:.0f} answers/s")


if __name__ == "__main__":
    main()

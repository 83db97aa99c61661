"""Flagship forward throughput vs batch: complete the B-sweep bound.

VERDICT r3 weak #2: the forward sweep stopped at B=128 (the claimed sweet
spot) while the train step kept scaling to B=256 — so either the headline
rises past 8.6k pairs/s at larger B, or the B=128 claim gets its missing
data points. Same chained-fori-loop timing discipline as bench.py (one
scalar fetch; data dependence between iterations so XLA cannot batch or
hoist the loop body).

Usage: python benchmarks/bench_forward_bsweep.py [B ...]   (default 128 256 512)
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ITERS = 30


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from t5_resnet_vqa_tpu.models.resnet_vqa import ResnetVQAModel

    t0 = time.time()
    float(jnp.ones(()).sum())
    log(f"tunnel warmup: {time.time() - t0:.1f}s "
        f"(device: {jax.devices()[0].platform})")

    batches = [int(b) for b in sys.argv[1:]] or [128, 256, 512]
    model = ResnetVQAModel(answer_spaces=170, vision_model_name="resnet50",
                           dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)

    def make_batch(B):
        return dict(
            question_input_ids=jnp.asarray(
                rng.integers(2, 32100, size=(B, 16)), jnp.int32),
            question_attention_masks=jnp.ones((B, 16), jnp.int32),
            image_tensors=jnp.asarray(
                rng.random((B, 256, 256, 3)), jnp.float32),
        )

    params = None
    results = {}
    for B in batches:
        batch = make_batch(B)
        if params is None:
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
                images = images + (1e-30 * jnp.sum(lp)).astype(images.dtype)
                return images, acc + jnp.sum(lp)
            images, acc = jax.lax.fori_loop(
                0, n, body, (b["image_tensors"], jnp.float32(0)))
            return acc

        t0 = time.time()
        float(run_n(params, batch, 1))
        log(f"B={B}: compile+first {time.time() - t0:.1f}s")

        def timed(n):
            t0 = time.time()
            float(run_n(params, batch, n))
            return time.time() - t0

        timed(1)
        t1 = min(timed(1) for _ in range(3))
        tN = min(timed(1 + ITERS) for _ in range(3))
        dt = (tN - t1) / ITERS
        results[B] = {"ms_per_batch": round(dt * 1e3, 2),
                      "pairs_per_sec": round(B / dt, 1)}
        log(f"B={B}: {dt * 1e3:.2f} ms/batch = {B / dt:.1f} pairs/s")

    print(json.dumps({"bench": "forward_bsweep", "results": results}))


if __name__ == "__main__":
    main()

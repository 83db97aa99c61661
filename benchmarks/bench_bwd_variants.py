"""Backward-pass variants for the flagship step (B=128, one chip).

Isolates fwd+bwd (no optimizer update) to quantify the dropout-RNG choice:
  tree_threefry   grads as the ~200-leaf tree, threefry dropout (r1 path)
  tree_rbg        grads as tree, TPU hardware-RNG dropout keys

Measured (v5e-class chip via tunnel, B=128): threefry 35.98 ms, rbg
28.71 ms — the ~7 ms delta is threefry mask generation, which the "rbg"
PRNG offloads to the TPU hardware RNG. This motivates
TrainerConfig.fast_dropout_rng (core/config.py).

Usage: python benchmarks/bench_bwd_variants.py [batch]
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


def main():
    import jax
    import jax.numpy as jnp

    from t5_resnet_vqa_tpu.models.resnet_vqa import ResnetVQAModel

    float(jnp.ones(()).sum())
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rng = np.random.default_rng(0)
    batch = dict(
        question_input_ids=jnp.asarray(
            rng.integers(2, 32100, size=(B, 16)), jnp.int32),
        question_attention_masks=jnp.ones((B, 16), jnp.int32),
        image_tensors=jnp.asarray(rng.random((B, 256, 256, 3)), jnp.float32),
        annotation_ids=jnp.asarray(rng.integers(0, 170, size=(B,)), jnp.int32),
    )
    model = ResnetVQAModel(answer_spaces=170, vision_model_name="resnet50",
                           dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]

    def perturbed(b, acc):
        b = dict(b)
        b["image_tensors"] = b["image_tensors"] + acc * 1e-20
        return b

    def chained(run_n, *state):
        t0 = time.time()
        float(run_n(*state, 1))
        cs = time.time() - t0

        def timed(k):
            t0 = time.time()
            float(run_n(*state, k))
            return time.time() - t0

        timed(1)
        t1 = min(timed(1) for _ in range(3))
        tN = min(timed(1 + ITERS) for _ in range(2))
        return (tN - t1) / ITERS, cs

    results = {}

    for name, impl in (("tree_threefry", None), ("tree_rbg", "rbg")):
        base_key = (jax.random.PRNGKey(42) if impl is None
                    else jax.random.key(42, impl=impl))

        @jax.jit
        def run_tree(p, b, k, n_iter, base_key=base_key):
            def body(i, acc):
                def loss_fn(pp):
                    _, loss = model.apply(
                        {"params": pp}, **perturbed(b, acc),
                        deterministic=False,
                        rngs={"dropout": jax.random.fold_in(base_key, i)})
                    return loss
                loss, grads = jax.value_and_grad(loss_fn)(p)
                gsum = sum(jnp.sum(gg).astype(jnp.float32)
                           for gg in jax.tree.leaves(grads))
                return acc + loss + gsum * 1e-20
            return jax.lax.fori_loop(0, n_iter, body, (jnp.float32(0)))

        dt, cs = chained(run_tree, params, batch, None)
        results[name + "_ms"] = round(dt * 1e3, 2)
        log(f"{name:14s} {dt*1e3:7.2f} ms (compile {cs:.0f}s)")

    results["batch"] = B
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()

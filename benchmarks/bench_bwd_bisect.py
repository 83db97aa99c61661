"""Bisect the flagship backward pass (B=128, rbg dropout, 1 TPU chip).

Observed: fwd+bwd = 28.7 ms but the trainable-half forward is only ~2.1 ms
(benchmarks/train_step.md) — backward costs ~7x the trainable forward where
~2x is expected. Each variant stops gradients at a different cut to
attribute the cost:

  full          grads for the whole trainable half (baseline)
  no_embed      stop_gradient on the T5 token-embedding lookup output
                (isolates the [32128, 768] scatter-add embedding grad)
  no_t5         stop_gradient on the T5 encoder output (SGA+pool+cls only)
  head_only     stop_gradient on the SGA output (pool+cls only)

Usage: python benchmarks/bench_bwd_bisect.py [batch [cut ...]]
(cuts default to all four; pass names to run a subset — compiles are ~80s
each through the tunnel)
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
    key = (jax.random.key(42, impl="rbg")
           if jax.devices()[0].platform == "tpu" else jax.random.PRNGKey(42))

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

    # gradient cuts via flax intercept: wrap apply so a named intermediate
    # gets stop_gradient'd. Implemented by stopping grads on the relevant
    # PARAM subtrees instead (equivalent attribution for cost purposes:
    # the bwd ops feeding only those params are DCE'd).
    import flax

    cuts = {
        "full": (),
        # embedding table only: kills the scatter-add [32128, 768] grad
        "no_embed": ("lang_model/shared",),
        # whole T5 encoder (incl. embedding)
        "no_t5": ("lang_model",),
        # everything but pooler+classifier
        "head_only": ("lang_model", "sga_modules", "downscale_layer"),
    }

    def stop_subtrees(p, prefixes):
        flat = flax.traverse_util.flatten_dict(p, sep="/")
        out = {}
        for k, v in flat.items():
            if any(k.startswith(pref) for pref in prefixes):
                v = jax.lax.stop_gradient(v)
            out[k] = v
        return flax.traverse_util.unflatten_dict(out, sep="/")

    selected = sys.argv[2:] or list(cuts)
    results = {}
    for name, prefixes in ((n, cuts[n]) for n in selected):
        @jax.jit
        def run_n(p, b, n, prefixes=prefixes):
            def body(i, acc):
                def loss_fn(pp):
                    pp = stop_subtrees(pp, prefixes)
                    _, loss = model.apply(
                        {"params": pp}, **perturbed(b, acc),
                        deterministic=False,
                        rngs={"dropout": jax.random.fold_in(key, i)})
                    return loss
                loss, grads = jax.value_and_grad(loss_fn)(p)
                gsum = sum(jnp.sum(gg).astype(jnp.float32)
                           for gg in jax.tree.leaves(grads))
                return acc + loss + gsum * 1e-20
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        dt, cs = chained(run_n, params, batch)
        results[name + "_ms"] = round(dt * 1e3, 2)
        log(f"{name:10s} {dt*1e3:7.2f} ms fwd+bwd (compile {cs:.0f}s)")

    results["batch"] = B
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()

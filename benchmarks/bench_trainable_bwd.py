"""Isolated fwd+bwd timing of the flagship's trainable pieces (B=128).

The full-step profile (train_step.md) leaves ~14.5 ms of backward where the
trainable forward is only ~2.1 ms. This times each trainable piece ALONE —
tiny graphs, fast compiles — to find where backward goes superlinear:

  t5_enc          T5-base encoder fwd+bwd (incl. [32128,768] embedding grad)
  t5_enc_frozen_embed   same but embedding-lookup output stop_gradient'd
  sga_head        ChannelProjection + 3xSGA + pooler + classifier fwd+bwd

Usage: python benchmarks/bench_trainable_bwd.py [batch]
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


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from t5_resnet_vqa_tpu.models.t5 import T5Config, T5Encoder
    from t5_resnet_vqa_tpu.ops import (AttentionConfig, AttentionPooler,
                                       ChannelProjection, SGAStack,
                                       log_softmax_nll)

    float(jnp.ones(()).sum())
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rng = np.random.default_rng(0)
    dt_ = jnp.bfloat16
    key = (jax.random.key(7, impl="rbg")
           if jax.devices()[0].platform == "tpu" else jax.random.PRNGKey(7))
    ids = jnp.asarray(rng.integers(2, 32100, size=(B, 16)), jnp.int32)
    mask = jnp.ones((B, 16), jnp.int32)
    results = {}

    # ---- T5 encoder ----
    enc = T5Encoder(T5Config.t5_base(), dtype=dt_)
    enc_params = enc.init({"params": jax.random.PRNGKey(0),
                           "dropout": jax.random.PRNGKey(1)},
                          ids, mask, deterministic=True)["params"]

    for name, frozen_embed in (("t5_enc", False),
                               ("t5_enc_frozen_embed", True)):
        @jax.jit
        def run_n(p, n, frozen_embed=frozen_embed):
            def body(i, acc):
                def loss_fn(pp):
                    if frozen_embed:
                        pp = dict(pp)
                        pp["shared"] = jax.lax.stop_gradient(pp["shared"])
                    out = enc.apply(
                        {"params": pp}, ids, mask, deterministic=False,
                        rngs={"dropout": jax.random.fold_in(key, i)})
                    return jnp.sum(out).astype(jnp.float32) * (1 + acc * 1e-20)
                loss, grads = jax.value_and_grad(loss_fn)(p)
                gsum = sum(jnp.sum(g).astype(jnp.float32)
                           for g in jax.tree.leaves(grads))
                return acc + loss * 1e-20 + gsum * 1e-20
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        dt, cs = chained(run_n, enc_params)
        results[name + "_ms"] = round(dt * 1e3, 2)
        log(f"{name:22s} {dt*1e3:7.2f} ms (compile {cs:.0f}s)")

    # ---- projection + SGA + pooler + classifier ----
    class Head(nn.Module):
        @nn.compact
        def __call__(self, text, vision_map, labels, deterministic=False):
            ve = ChannelProjection(768, dtype=dt_, name="proj")(vision_map)
            vt = ve.reshape(ve.shape[0], -1, 768)
            fused = SGAStack(num_blocks=3, config=AttentionConfig(),
                             dtype=dt_, name="sga")(
                text, vt, deterministic=deterministic)
            pooled = AttentionPooler(768, dtype=dt_, name="pool")(fused)
            logits = nn.Dense(170, dtype=dt_, name="cls")(pooled)
            _, loss = log_softmax_nll(logits, labels)
            return loss

    head = Head()
    text = jnp.asarray(rng.normal(size=(B, 16, 768)) * 0.05, dt_)
    vmap = jnp.asarray(rng.normal(size=(B, 8, 8, 2048)) * 0.05, dt_)
    labels = jnp.asarray(rng.integers(0, 170, size=(B,)), jnp.int32)
    head_params = head.init({"params": jax.random.PRNGKey(0),
                             "dropout": jax.random.PRNGKey(1)},
                            text, vmap, labels)["params"]

    @jax.jit
    def run_head(p, n):
        def body(i, acc):
            def loss_fn(pp):
                return head.apply(
                    {"params": pp}, text, vmap, labels,
                    rngs={"dropout": jax.random.fold_in(key, i)}
                ) * (1 + acc * 1e-20)
            loss, grads = jax.value_and_grad(loss_fn)(p)
            gsum = sum(jnp.sum(g).astype(jnp.float32)
                       for g in jax.tree.leaves(grads))
            return acc + loss * 1e-20 + gsum * 1e-20
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    dt, cs = chained(run_head, head_params)
    results["sga_head_ms"] = round(dt * 1e3, 2)
    log(f"{'sga_head':22s} {dt*1e3:7.2f} ms (compile {cs:.0f}s)")

    results["batch"] = B
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()

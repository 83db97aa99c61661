"""T5-base encoder fwd+bwd variants at flagship geometry (B=128, S=16).

Round-2 left the encoder at 10.3 ms fwd+bwd — ~2x its ~5.3 ms roofline
(benchmarks/train_step.md "Per-segment breakdown"); VERDICT r3 asks to close
or conclusively bound the gap. Variants:

  base      current T5Encoder (separate q/k/v matmuls)
  fused     T5Config.fused_qkv: one concat-kernel matmul for q/k/v
  remat     jax.checkpoint around the whole encoder (FLOPs for memory)
  s8        S=16 -> 8: bounds what pad-free packing of the ~50%-pad
            questions could ever recover (informational; shapes are static
            in production so this is not a shippable lever by itself)
  fused_s8  both

Measurement discipline (memory: tpu-tunnel-variance): N chained fwd+bwd in
one jitted fori_loop, params perturbed per iteration by +1e-6*grad so XLA
cannot hoist anything, single scalar fetch at the end.

Usage: python benchmarks/bench_t5_encoder.py [batch [variant ...]]
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 30


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from t5_resnet_vqa_tpu.models.t5 import T5Config, T5Encoder

    t0 = time.time()
    float(jnp.ones(()).sum())
    log(f"tunnel warmup: {time.time() - t0:.1f}s "
        f"(device: {jax.devices()[0].platform})")

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    wanted = sys.argv[2:] or ["base", "fused", "remat", "s8", "fused_s8"]
    rng = np.random.default_rng(0)
    results = {}

    for name in wanted:
        cfg = T5Config.t5_base()
        S = 8 if name.endswith("s8") else 16
        if name.startswith("fused"):
            cfg = dataclasses.replace(cfg, fused_qkv=True)
        enc = T5Encoder(cfg, dtype=jnp.bfloat16)

        ids = jnp.asarray(rng.integers(2, 32100, (B, S)), jnp.int32)
        mask_np = np.ones((B, S), np.int32)
        mask_np[:, S // 2:] = (np.arange(S - S // 2)[None, :]
                               < rng.integers(1, S - S // 2 + 1, (B, 1)))
        mask = jnp.asarray(mask_np)
        params = enc.init(jax.random.PRNGKey(0), ids, mask)

        def loss_fn(p, key, _enc=enc, _ids=ids, _mask=mask):
            out = _enc.apply(p, _ids, _mask, deterministic=False,
                             rngs={"dropout": key})
            return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6

        if name == "remat":
            loss_fn = jax.checkpoint(loss_fn)

        @jax.jit
        def run(p, key):
            def body(i, carry):
                p, acc = carry
                l, g = jax.value_and_grad(loss_fn)(
                    p, jax.random.fold_in(key, i))
                # param-chained: next iter depends on this one's grads
                p = jax.tree.map(lambda a, b: a + 1e-6 * b, p, g)
                return p, acc + l
            return jax.lax.fori_loop(0, ITERS, body,
                                     (p, jnp.zeros((), jnp.float32)))[1]

        # production dropout-key stream: TPU hardware RNG (fast_dropout_rng)
        key = jax.random.key(1, impl="rbg")
        t0 = time.time()
        float(run(params, key))        # compile + first run
        log(f"{name}: compile+run {time.time() - t0:.1f}s")
        t0 = time.time()
        float(run(params, key))
        dt = (time.time() - t0) / ITERS * 1000
        results[name] = round(dt, 2)
        log(f"{name}: {dt:.2f} ms/iter (B={B}, S={S})")

    print(json.dumps({"bench": "t5_encoder_fwd_bwd", "batch": B,
                      "iters": ITERS, "ms_per_iter": results}))


if __name__ == "__main__":
    main()

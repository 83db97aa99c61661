"""Per-segment breakdown of the flagship train step (VERDICT r1 weak #4).

Times, on one real chip, with the fori_loop-chained method of
bench_train_step.py (N chained iterations, one scalar fetch):

  tower_fwd   frozen ResNet50 tower forward alone
  full_fwd    full ResnetVQAModel forward (loss)
  fwd_bwd     value_and_grad (forward + backward, no update)
  step_prod   full production step (frozen_modules honored, as the trainer
              builds it -> no Adam moments / decay on the frozen tower)
  step_naive  full step with the tower IN the optimizer (what
              bench_train_step.py measured before r2)

Derived: bwd = fwd_bwd - full_fwd; clip+update = step_prod - fwd_bwd.

Each iteration's input image is perturbed by acc*1e-20 (acc carries the
previous iteration's loss) so XLA cannot hoist the frozen tower out of the
loop — without a loop-carried data dependency the tower is loop-invariant
under a fixed batch and would be computed once.

Usage: python benchmarks/profile_train_step.py [batch]
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
    """per-iteration seconds via (t(1+N) - t(1)) / N, min over repeats."""
    t0 = time.time()
    float(run_n(*state, 1))
    compile_s = time.time() - t0

    def timed(n):
        t0 = time.time()
        float(run_n(*state, n))
        return time.time() - t0

    timed(1)
    t1 = min(timed(1) for _ in range(3))
    tN = min(timed(1 + ITERS) for _ in range(2))
    return (tN - t1) / ITERS, compile_s


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from t5_resnet_vqa_tpu.core.config import Config
    from t5_resnet_vqa_tpu.models.resnet import ResNetBackbone
    from t5_resnet_vqa_tpu.models.resnet_vqa import ResnetVQAModel
    from t5_resnet_vqa_tpu.train.optimizer import build_optimizer

    float(jnp.ones(()).sum())  # tunnel warmup
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
    cfg = Config()
    base_rng = jax.random.PRNGKey(42)
    results = {}

    def perturbed(b, acc):
        b = dict(b)
        b["image_tensors"] = b["image_tensors"] + acc * 1e-20
        return b

    # --- tower forward alone ---
    tower = ResNetBackbone("resnet50", dtype=jnp.bfloat16)
    tower_params = {"params": params["vision_model"]}

    @jax.jit
    def run_tower(p, img, n):
        def body(i, acc):
            feats = tower.apply(p, img + acc * 1e-20)
            return acc + feats[-1].astype(jnp.float32).mean()
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    dt, cs = chained(run_tower, tower_params, batch["image_tensors"])
    results["tower_fwd_ms"] = dt * 1e3
    log(f"tower_fwd      {dt*1e3:7.2f} ms  (compile {cs:.0f}s)")

    # --- full forward: train mode (dropout RNG) and eval mode ---
    for key, det in (("full_fwd", False), ("fwd_eval", True)):
        @jax.jit
        def run_fwd(p, b, n, det=det):
            def body(i, acc):
                _, loss = model.apply(
                    {"params": p}, **perturbed(b, acc), deterministic=det,
                    rngs=(None if det
                          else {"dropout": jax.random.fold_in(base_rng, i)}))
                return acc + loss
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        dt, cs = chained(run_fwd, params, batch)
        results[key + "_ms"] = dt * 1e3
        log(f"{key:14s} {dt*1e3:7.2f} ms  (compile {cs:.0f}s)")

    # --- forward + backward (no update) ---
    # the carried scalar must consume EVERY grad leaf or XLA DCEs the
    # untouched parts of the backward (first version of this script summed
    # one leaf and measured fwd_bwd == full_fwd).
    @jax.jit
    def run_fwd_bwd(p, b, n):
        def body(i, acc):
            def loss_fn(pp):
                _, loss = model.apply(
                    {"params": pp}, **perturbed(b, acc), deterministic=False,
                    rngs={"dropout": jax.random.fold_in(base_rng, i)})
                return loss
            loss, grads = jax.value_and_grad(loss_fn)(p)
            gsum = sum(jnp.sum(g).astype(jnp.float32)
                       for g in jax.tree.leaves(grads))
            return acc + loss + gsum * 1e-20
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    dt, cs = chained(run_fwd_bwd, params, batch)
    results["fwd_bwd_ms"] = dt * 1e3
    log(f"fwd_bwd        {dt*1e3:7.2f} ms  (compile {cs:.0f}s)")

    # --- full step, production (frozen tower outside optimizer) / naive ---
    for key, frozen in (("step_prod", ("vision_model",)), ("step_naive", ())):
        tx, _, _ = build_optimizer(cfg.optimizer, cfg.lr_scheduler,
                                   num_training_steps=10_000,
                                   gradient_clipping=1.0,
                                   frozen_modules=frozen)
        opt_state = jax.jit(tx.init)(params)

        @jax.jit
        def run_step(p, s, b, n, tx=tx):
            def body(i, carry):
                p, s, acc = carry
                def loss_fn(pp):
                    _, loss = model.apply(
                        {"params": pp}, **perturbed(b, acc),
                        deterministic=False,
                        rngs={"dropout": jax.random.fold_in(base_rng, i)})
                    return loss
                loss, grads = jax.value_and_grad(loss_fn)(p)
                updates, s = tx.update(grads, s, p)
                return optax.apply_updates(p, updates), s, acc + loss
            _, _, acc = jax.lax.fori_loop(0, n, body, (p, s, jnp.float32(0)))
            return acc

        dt, cs = chained(run_step, params, opt_state, batch)
        results[key + "_ms"] = dt * 1e3
        log(f"{key:14s} {dt*1e3:7.2f} ms  (compile {cs:.0f}s)")

    results["derived_bwd_ms"] = results["fwd_bwd_ms"] - results["full_fwd_ms"]
    results["derived_clip_update_ms"] = (results["step_prod_ms"]
                                         - results["fwd_bwd_ms"])
    results["batch"] = B
    log(f"derived bwd         {results['derived_bwd_ms']:7.2f} ms")
    log(f"derived clip+update {results['derived_clip_update_ms']:7.2f} ms")
    print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                      for k, v in results.items()}), flush=True)


if __name__ == "__main__":
    main()

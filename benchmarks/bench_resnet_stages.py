"""Per-stage timing of the flagship ResNet50 tower (the forward bottleneck).

The r2 decomposition (train_step.md) puts the frozen tower at 12.4 ms of the
14.8 ms flagship forward at B=128 — ~110 effective TFLOP/s against measured
per-conv peaks of 165-240 (bench_int8_micro.py) — so some stage is running
well under the conv roofline. This bisects: XLA dead-code-eliminates every
stage after the one consumed, so timing "tower up to feats[k]" for k=0..3
(plus the stem alone and the full vision path incl. ConvTranspose
projection) yields cumulative costs whose deltas are per-stage costs, each
with its analytic FLOP count and achieved TFLOP/s.

Timing uses the fori_loop/data-dependent pattern (see bench.py: per-dispatch
wall timing is meaningless through the async tunnel).

Usage: python benchmarks/bench_resnet_stages.py [batch=128] [size=256]
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ITERS = 30


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def stage_flops(size):
    """Analytic fwd FLOPs (MAC*2) per image for resnet50 at ``size``², by
    segment: stem, layer1..4, proj (ConvTranspose 2048->768 k3 on 8x8)."""
    def conv(hw, cin, cout, k):
        return 2 * (hw * hw) * cout * cin * k * k

    s = size // 2          # stem output hw
    h1 = size // 4         # after maxpool
    flops = {"stem": conv(s, 3, 64, 7)}

    # (blocks, base width, in_ch at stage entry, hw at stage OUTPUT)
    stages = [(3, 64, 64, h1), (4, 128, 256, h1 // 2),
              (6, 256, 512, h1 // 4), (3, 512, 1024, h1 // 8)]
    for i, (blocks, w, cin, hw) in enumerate(stages):
        f = 0
        stride_in_hw = hw if i == 0 else hw * 2   # block0's 1x1 reduce runs
        for b in range(blocks):                   # at the INPUT resolution
            c_in = cin if b == 0 else w * 4
            in_hw = stride_in_hw if b == 0 else hw
            f += conv(in_hw, c_in, w, 1)          # 1x1 reduce
            f += conv(hw, w, w, 3)                # 3x3 (stride on block0)
            f += conv(hw, w, w * 4, 1)            # 1x1 expand
            if b == 0:
                f += conv(hw, c_in, w * 4, 1)     # downsample
        flops[f"layer{i + 1}"] = f
    flops["proj"] = conv(size // 32, 2048, 768, 3)
    return flops


def main():
    import jax
    import jax.numpy as jnp

    from t5_resnet_vqa_tpu.models.resnet import ResNetBackbone, StemConv
    from t5_resnet_vqa_tpu.models.resnet_vqa import ResnetVQAModel

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    t0 = time.time()
    float(jnp.ones(()).sum())
    log(f"tunnel warmup: {time.time() - t0:.1f}s "
        f"(device: {jax.devices()[0].platform})")

    model = ResnetVQAModel(answer_spaces=170, vision_model_name="resnet50",
                           dtype=jnp.bfloat16)
    backbone = ResNetBackbone(variant="resnet50", dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, SIZE, SIZE, 3)), jnp.float32)
    bb_params = backbone.init(jax.random.PRNGKey(0), x)["params"]

    full = ResnetVQAModel(answer_spaces=170, vision_model_name="resnet50",
                          dtype=jnp.bfloat16)
    fp = full.init(
        jax.random.PRNGKey(0),
        question_input_ids=jnp.zeros((1, 16), jnp.int32),
        question_attention_masks=jnp.ones((1, 16), jnp.int32),
        image_tensors=jnp.zeros((1, SIZE, SIZE, 3), jnp.float32),
        annotation_ids=None)["params"]

    def timed_loop(fn, params):
        """min over 3 of [t(1+N) - t(1)] / N via data-dependent fori_loop."""
        @jax.jit
        def run_n(p, x0, n):
            def body(_, carry):
                xc, acc = carry
                out = fn(p, xc)
                xc = xc + (1e-30 * jnp.sum(out)).astype(xc.dtype)
                return xc, acc + jnp.sum(out)
            _, acc = jax.lax.fori_loop(0, n, body, (x0, jnp.float32(0)))
            return acc

        float(run_n(params, x, 1))

        def t(n):
            t0 = time.time()
            float(run_n(params, x, n))
            return time.time() - t0

        t(1)
        t1 = min(t(1) for _ in range(3))
        tN = min(t(1 + ITERS) for _ in range(3))
        return (tN - t1) / ITERS

    stem = StemConv(dtype=jnp.bfloat16, use_s2d=True)

    def stem_only(p, xc):
        return stem.apply({"params": p["conv1"]}, xc)

    def make_stage(k):
        def f(p, xc):
            return backbone.apply({"params": p}, xc)[k]
        return f

    def vis(p, xc):
        # plain method taking the full param tree (feature-cache entry point)
        return full.compute_vision_features(p, xc)

    fl = stage_flops(SIZE)
    cum_named = [("stem", stem_only)] + [
        (f"layer{k + 1}", make_stage(k)) for k in range(4)]

    results = {}
    prev_t = 0.0
    cum_f = 0.0
    for name, fn in cum_named:
        t_cum = timed_loop(fn, bb_params)
        dt = t_cum - prev_t
        cum_f += fl[name]
        tflops = fl[name] * B / dt / 1e12 if dt > 1e-6 else None
        results[name] = {"cum_ms": round(t_cum * 1e3, 2),
                         "delta_ms": round(dt * 1e3, 2),
                         "gflop_per_img": round(fl[name] / 1e9, 2),
                         "tflops": round(tflops, 1) if tflops else None}
        log(f"{name:8s} cum {t_cum * 1e3:7.2f} ms  Δ {dt * 1e3:6.2f} ms  "
            f"{fl[name] / 1e9:6.2f} GF/img  -> {tflops or 0:6.1f} TFLOP/s")
        prev_t = t_cum

    t_vis = timed_loop(vis, fp)
    dt = t_vis - prev_t
    tflops = fl["proj"] * B / dt / 1e12 if dt > 1e-6 else None
    results["proj"] = {"cum_ms": round(t_vis * 1e3, 2),
                       "delta_ms": round(dt * 1e3, 2),
                       "gflop_per_img": round(fl["proj"] / 1e9, 2),
                       "tflops": round(tflops, 1) if tflops else None}
    log(f"{'proj':8s} cum {t_vis * 1e3:7.2f} ms  Δ {dt * 1e3:6.2f} ms  "
        f"{fl['proj'] / 1e9:6.2f} GF/img  -> {tflops or 0:6.1f} TFLOP/s")

    total_f = sum(fl.values())
    log(f"tower+proj total: {t_vis * 1e3:.2f} ms, "
        f"{total_f / 1e9:.1f} GF/img, "
        f"{total_f * B / t_vis / 1e12:.1f} TFLOP/s aggregate")
    print(json.dumps({"bench": "resnet_stages", "batch": B, "size": SIZE,
                      "results": results}))


if __name__ == "__main__":
    main()

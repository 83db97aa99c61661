"""Fused ResNet bottleneck block as a Pallas TPU kernel.

Why: the round-3 per-stage bisection (benchmarks/bench_resnet_stages.py,
benchmarks/train_step.md "Round 3") showed the frozen-tower forward's two
early stages run at the *HBM-traffic* roofline of XLA's op-by-op schedule —
every conv reads its input from and writes its output to HBM, so layer1
moves ~3.4 GB at B=128 (4.36 ms) and layer2 ~2.7 GB (3.39 ms) while the MXU
idles (51 / 101 TFLOP/s vs the ~180-240 per-conv peak). A bottleneck block
is conv1(1x1)->BN->relu->conv2(3x3)->BN->relu->conv3(1x1)->BN->add->relu;
fusing the whole chain so the intermediates never leave VMEM cuts the
per-block traffic to [read input once + write output once] — the analytic
floor — and simultaneously fixes the second layer1 limiter, MXU lane
utilization: the 3x3 is computed as ONE im2col matmul with K = 9*width
(K=576 for layer1) instead of nine K=64 matmuls at 25% lane use.

Measurement status (same chip as benchmarks/resnet_stages.json — NEGATIVE
RESULT, kernel retained as an opt-in experiment surface, not wired into
the production models):

  * layer1 stride-1 blocks (64x64, Cin=256, w=64): XLA 1.73 ms/block vs
    fused 2.01 ms — 0.86x. Variants tried (/tmp-era sweep recorded in
    benchmarks/train_step.md): single-matmul im2col (K=576), per-column
    K=192 concat, 9 accumulating K=64 matmuls, chunked vs full-height —
    the im2col chunk=16 shown here was the best; none beat XLA.
  * layer2 stride-1 blocks (32x32, Cin=512, w=128, lane-aligned): best
    variant exactly TIES XLA (0.99 ms/block).
  * Why the traffic win doesn't materialize: the kernel's floor is
    read-input-once + write-output-once (~0.66 ms for a layer1 block),
    but realizing the 3x3 as in-VMEM im2col costs lane-dim relayouts of
    ~4.7 MB per image (Cw=64 tensors occupy half a 128-lane vreg, so the
    9-tap channel concat shuffles lanes), and with a whole image's in+out
    double-buffered per grid step (~8 MB) there is no VMEM left to batch
    images and amortize per-step pipeline overhead. Internal compute
    exceeds the DMA saved; XLA's conv pipeline — already within ~7% of
    the unfused traffic roofline — wins end-to-end.

This mirrors the Pallas attention finding (ops/pallas/attention.py,
benchmarks/pallas_sga.md): on this chip XLA's fusion + pipelining is the
bar, and defaults follow end-to-end numbers.

Scope: the frozen tower only (reference resnet_vqa_model.py:115-135 runs
torchvision resnet under no_grad/eval) — the VQA models wrap the backbone
in stop_gradient, so no backward kernel is needed or provided. Stride-2
blocks fall back to the module path when compiled (Mosaic rejects
strided value slices; the interpreter accepts them, so CPU tests still
cover the stride-2 kernel body).

Numerics: matmuls accumulate in f32 (`preferred_element_type`), the folded
FrozenBatchNorm scale/bias applies in f32 before the bf16 re-cast — the
same accumulate-then-affine structure as the XLA path; agreement with the
unfused block is asserted in tests/test_fused_bottleneck.py (interpreter on
CPU, compiled on TPU).

Layout per grid step (one batch element, whole image in VMEM):

  x (H, W, Cin) --1x1-->  t1 ---pad--> t1p (H+2, W+2, Cw)
  for each row-chunk: im2col (chunk*Wo, 9*Cw) @ w2 (9*Cw, Cw) -> t2
                      t2 @ w3 (Cw, Cout) + identity-chunk -> out chunk

VMEM high-water at the worst geometry (layer1 blocks 1-2: 64x64, Cin=256):
x 2 MB + out 2 MB + t1p 0.56 MB + im2col chunk ~1.2 MB + weights ~0.2 MB,
~6 MB plus pallas' in/out double-buffering — comfortably under the 16 MB
budget, verified by compilation.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _block_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                  wd_ref, bd_ref, o_ref, *, stride: int, chunk: int,
                  has_downsample: bool, out_dtype):
    """One batch element. x (1,H,W,Cin) -> o (1,Ho,Wo,Cout)."""
    x = x_ref[0]                                    # (H, W, Cin)
    H, W, Cin = x.shape
    _, Ho, Wo, Cout = o_ref.shape
    Cw = w1_ref.shape[1]

    f32 = jnp.float32

    # conv1: 1x1 stride 1 at input resolution + BN + relu
    t1 = jnp.dot(x.reshape(H * W, Cin), w1_ref[...],
                 preferred_element_type=f32)
    t1 = jnp.maximum(t1 + b1_ref[...], 0.0).astype(x.dtype)

    # zero-pad to (H+2, W+2, Cw) for the 3x3 halo
    t1p = jnp.pad(t1.reshape(H, W, Cw), ((1, 1), (1, 1), (0, 0)))

    w2 = w2_ref[...]                                # (9*Cw, Cw)
    w3 = w3_ref[...]                                # (Cw, Cout)
    b2 = b2_ref[...]
    b3 = b3_ref[...]

    for r0 in range(0, Ho, chunk):
        rows = min(chunk, Ho - r0)
        # im2col: 9 shifted (rows, Wo, Cw) views, tap-major channel concat
        # (matches HWIO w2.reshape(9*Cw, Cw) ordering)
        taps = []
        for di in range(3):
            for dj in range(3):
                sl = jax.lax.slice(
                    t1p,
                    (di + r0 * stride, dj, 0),
                    (di + (r0 + rows - 1) * stride + 1,
                     dj + (Wo - 1) * stride + 1, Cw),
                    (stride, stride, 1))
                taps.append(sl.reshape(rows * Wo, Cw))
        col = jnp.concatenate(taps, axis=-1)        # (rows*Wo, 9*Cw)

        t2 = jnp.dot(col, w2, preferred_element_type=f32)
        t2 = jnp.maximum(t2 + b2, 0.0).astype(x.dtype)

        y = jnp.dot(t2, w3, preferred_element_type=f32) + b3

        if has_downsample:
            xs = jax.lax.slice(
                x, (r0 * stride, 0, 0),
                ((r0 + rows - 1) * stride + 1, (Wo - 1) * stride + 1, Cin),
                (stride, stride, 1))
            idn = jnp.dot(xs.reshape(rows * Wo, Cin), wd_ref[...],
                          preferred_element_type=f32) + bd_ref[...]
        else:
            idn = x[r0:r0 + rows].reshape(rows * Wo, Cin).astype(f32)

        out = jnp.maximum(y + idn, 0.0).astype(out_dtype)
        o_ref[0, r0:r0 + rows] = out.reshape(rows, Wo, Cout)


@functools.partial(jax.jit, static_argnames=("stride", "interpret"))
def _fused_block_call(x, w1, b1, w2, b2, w3, b3, wd, bd, *, stride: int,
                      interpret: bool):
    B, H, W, Cin = x.shape
    Cout = w3.shape[1]
    Ho, Wo = H // stride, W // stride
    has_downsample = wd is not None
    if wd is None:                     # placeholders keep the arity static
        wd = jnp.zeros((1, 1), x.dtype)
        bd = jnp.zeros((1, 1), jnp.float32)

    # rows per inner matmul chunk: target M = chunk*Wo >= 1024 without
    # blowing the im2col buffer past ~1.3 MB
    chunk = max(1, min(Ho, 1024 // Wo))

    kernel = functools.partial(
        _block_kernel, stride=stride, chunk=chunk,
        has_downsample=has_downsample, out_dtype=x.dtype)

    full = lambda shape: pl.BlockSpec(
        shape, lambda b: (0,) * len(shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, Cin), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full(w1.shape), full(b1.shape), full(w2.shape), full(b2.shape),
            full(w3.shape), full(b3.shape), full(wd.shape), full(bd.shape),
        ],
        out_specs=pl.BlockSpec((1, Ho, Wo, Cout), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Ho, Wo, Cout), x.dtype),
        interpret=interpret,
    )(x, w1, b1, w2, b2, w3, b3, wd, bd)


def fused_bottleneck(x: jnp.ndarray, params: dict, *, stride: int = 1,
                     has_downsample: bool = False,
                     interpret: Optional[bool] = None) -> Optional[jnp.ndarray]:
    """Apply one frozen bottleneck block (conv1/bn1/../conv3/bn3/add/relu)
    as a single fused kernel.

    ``params`` is the flax param subtree of models.resnet.Bottleneck
    (conv1/bn1/conv2/bn2/conv3/bn3[/downsample_conv/downsample_bn]).
    Returns None when the kernel doesn't apply (callers fall back to the
    unfused module path).
    """
    if interpret is None:
        if not _on_tpu():
            return None
        interpret = False
    if stride != 1 and not interpret:
        # Mosaic lowers strided value slices to vector.extract_strided_slice,
        # which only admits stride 1 — compiled stride-2 blocks fall back.
        return None

    dt = x.dtype

    def fold(conv, bn):
        """HWIO kernel * BN scale -> flattened bf16 weight, f32 bias row."""
        w = conv["kernel"].astype(jnp.float32)
        s = bn["scale"].astype(jnp.float32)
        b = bn["bias"].astype(jnp.float32)
        w = (w * s).astype(dt).reshape(-1, w.shape[-1])
        return w, b.reshape(1, -1)

    w1, b1 = fold(params["conv1"], params["bn1"])
    w2, b2 = fold(params["conv2"], params["bn2"])
    w3, b3 = fold(params["conv3"], params["bn3"])
    if has_downsample:
        wd, bd = fold(params["downsample_conv"],
                      params["downsample_bn"])
    else:
        wd = bd = None

    out = _fused_block_call(jax.lax.stop_gradient(x),
                            w1, b1, w2, b2, w3, b3, wd, bd,
                            stride=stride, interpret=interpret)
    return out

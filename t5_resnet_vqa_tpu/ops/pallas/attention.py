"""Fused Pallas TPU attention kernel for the SGA / fusion path.

The SGA sequences are short (text 16/20 tokens, vision 64, ViT 197) with
head_dim 96, so the win over XLA comes from fusing QK^T -> softmax -> @V into
one VMEM-resident kernel and amortizing per-block overhead by processing ALL
heads of one batch element per grid step (head-batched dot_general) instead
of a (batch*head) grid of tiny blocks.

``fused_attention`` returns None when the kernel doesn't apply (non-TPU
platform) and callers fall back to the jnp path
(ops/layers.py:dot_product_attention). Numerics of the two paths are asserted
equal in tests/test_pallas_attention.py (interpreter on CPU, compiled on TPU).

Measured on v5e (B=64, H=8, D=96, text 16 / vision 64; see
benchmarks/pallas_sga.md): the head-batched kernel is ~3x faster than the
first (batch*head)-grid design, but XLA's own fusion of the unfused einsum
path is still faster at these sub-MXU block sizes — which is why
``use_pallas`` defaults to False in the model configs. The kernel is kept
correct and benchmarked so larger-geometry configs can flip it on.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_SUBLANE = 8
_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, *, sk_valid: int,
                      scale: float):
    """One batch element, all heads: q [H, Sq, D], k/v [H, Sk, D] in VMEM."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    # head-batched QK^T: [H, Sq, Sk]
    scores = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 2)
    scores = jnp.where(col < sk_valid, scores, -1e30)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    att = e / jnp.sum(e, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        att.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def fused_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray
) -> Optional[jnp.ndarray]:
    """Unmasked scaled dot-product attention, fused.

    q: [B, H, Sq, D], k/v: [B, H, Sk, D]. Returns [B, H, Sq, D] or None if
    the kernel doesn't apply (non-TPU platform).
    """
    if not _on_tpu():
        return None

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    scale = 1.0 / (D ** 0.5)

    sq_p = _round_up(Sq, _SUBLANE)
    sk_p = _round_up(Sk, _SUBLANE)
    d_p = _round_up(D, _LANE)

    def pad(x, s_p):
        S = x.shape[2]
        return jnp.pad(x, ((0, 0), (0, 0), (0, s_p - S), (0, d_p - D)))

    qp = pad(q, sq_p)
    kp = pad(k, sk_p)
    vp = pad(v, sk_p)

    kernel = functools.partial(_attention_kernel, sk_valid=Sk, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, sq_p, d_p), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, sk_p, d_p), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, sk_p, d_p), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, sq_p, d_p), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, sq_p, d_p), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * sq_p * sk_p * d_p * 2,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=B * H * sq_p * sk_p,
        ),
    )(qp, kp, vp)

    return out[:, :, :Sq, :D]

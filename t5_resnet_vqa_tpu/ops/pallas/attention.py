"""Fused Pallas TPU attention kernel (head-batched, VMEM-resident).

Fuses QK^T -> softmax -> @V into one kernel, processing ALL heads of one
batch element per grid step (head-batched dot_general) instead of a
(batch*head) grid of tiny blocks — the [Sq, Sk] score tensor never touches
HBM.

``fused_attention`` returns None when the kernel doesn't apply (non-TPU
platform) and callers fall back to the jnp path
(ops/layers.py:dot_product_attention). Numerics of the two paths are
asserted equal in tests/test_pallas_attention.py (interpreter on CPU,
compiled on TPU).

Measurement status (v5e — benchmarks/pallas_sga.md):

  * ViT-base attention (H=12, S=197, D=64, bf16): in ISOLATION the kernel
    beats XLA — 313 vs 490 us/attention at B=64 (bit-identical) and 710
    vs 974 us at B=128 (benchmarks/bench_attn_pallas_vs_xla.py) — but
    wired into the full 12-layer tower the custom call blocks XLA's
    cross-op fusion/overlap and the tower regresses (23.8 vs 23.4 ms at
    B=64, 58.2 vs 51.5 ms at B=128; benchmarks/profile_vit_family.py).
    ``ViTConfig.use_pallas`` therefore defaults to False — a microbench
    win is not an end-to-end win, and defaults follow end-to-end numbers.
  * SGA geometry (H=8, D=96, 16/64 tokens): XLA's own fusion ties the
    kernel even in isolation, so SGA's ``use_pallas`` stays False too.

``fused_attention_grad_safe`` wraps the kernel in a custom VJP whose
backward differentiates the equivalent jnp attention (the kernel itself has
no Pallas backward) — in production the ViT tower is frozen, so this path
only exists for fine_tune_vision=True correctness.
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


def _jnp_attention(q, k, v):
    """Reference math of the kernel — the repo's single jnp implementation
    (ops/layers.py:dot_product_attention with no mask/dropout)."""
    from ..layers import dot_product_attention
    return dot_product_attention(q, k, v)


@jax.custom_vjp
def fused_attention_grad_safe(q, k, v):
    """fused_attention with a jnp-derived backward.

    Forward: the Pallas kernel (jnp fallback off-TPU). Backward: the VJP of
    the equivalent jnp attention — exact for the same math, recomputed from
    (q, k, v). Production towers using the kernel are frozen, so backward
    only runs under fine_tune_vision=True.
    """
    out = fused_attention(q, k, v)
    return _jnp_attention(q, k, v) if out is None else out


def _fas_fwd(q, k, v):
    return fused_attention_grad_safe(q, k, v), (q, k, v)


def _fas_bwd(res, g):
    q, k, v = res
    _, vjp = jax.vjp(_jnp_attention, q, k, v)
    return vjp(g)


fused_attention_grad_safe.defvjp(_fas_fwd, _fas_bwd)

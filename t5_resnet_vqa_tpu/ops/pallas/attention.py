"""Fused Pallas TPU attention kernel for the SGA / fusion path.

The SGA sequences are short (text 16/20 tokens, vision 64, ViT 197) with
head_dim 96, so the win over XLA comes from fusing QK^T -> softmax -> @V into
one VMEM-resident kernel per (batch, head) tile, avoiding HBM round-trips of
the [Sq, Sk] score matrix.

``fused_attention`` returns None when the shapes/platform don't qualify, and
callers fall back to the jnp path (ops/layers.py:dot_product_attention) —
numerics of the two paths are asserted equal in tests/test_pallas_attention.py.
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


@functools.partial(jax.jit, static_argnames=())
def _noop(x):
    return x


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, *, sk_valid: int, scale: float):
    """One (batch*head) tile: q [Sq, D], k [Sk, D], v [Sk, D] in VMEM."""
    import jax.numpy as jnp  # local for clarity inside kernel

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    # Mask the Sk padding columns so softmax ignores them.
    sk_pad = scores.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(col < sk_valid, scores, -1e30)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    att = e / jnp.sum(e, axis=-1, keepdims=True)
    o_ref[0] = jax.lax.dot_general(
        att.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def fused_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray
) -> Optional[jnp.ndarray]:
    """Unmasked scaled dot-product attention, fused.

    q: [B, H, Sq, D], k/v: [B, H, Sk, D]. Returns [B, H, Sq, D] or None if the
    kernel doesn't apply (non-TPU platform).
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

    qp = pad(q, sq_p).reshape(B * H, sq_p, d_p)
    kp = pad(k, sk_p).reshape(B * H, sk_p, d_p)
    vp = pad(v, sk_p).reshape(B * H, sk_p, d_p)

    kernel = functools.partial(_attention_kernel, sk_valid=Sk, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(B * H,),
        in_specs=[
            pl.BlockSpec((1, sq_p, d_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_p, d_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_p, d_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, sq_p, d_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, sq_p, d_p), q.dtype),
    )(qp, kp, vp)

    return out.reshape(B, H, sq_p, d_p)[:, :, :Sq, :D]

"""Fused Pallas attention kernel vs the jnp reference path.

On CPU the production entry (``fused_attention``) intentionally returns None
(kernel is TPU-only) and callers fall back to jnp — asserted here. The kernel
*math* is still validated on CPU by invoking the same kernel body through the
Pallas interpreter; on a real TPU the same test runs compiled
(tests marked tpu are also exercised by bench/graft runs).
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from t5_resnet_vqa_tpu.ops import AttentionConfig, MultiHeadAttention, dot_product_attention
from t5_resnet_vqa_tpu.ops.pallas import attention as pa


def _ref_attention(q, k, v):
    d = q.shape[-1]
    scores = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(d)
    scores = scores - scores.max(axis=-1, keepdims=True)
    e = np.exp(scores)
    att = e / e.sum(axis=-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", att, v)


def _interpret_fused(q, k, v):
    """Run the kernel body through the Pallas interpreter (platform-neutral)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    sq_p = pa._round_up(Sq, pa._SUBLANE)
    sk_p = pa._round_up(Sk, pa._SUBLANE)
    d_p = pa._round_up(D, pa._LANE)

    def pad(x, s_p):
        return jnp.pad(x, ((0, 0), (0, 0), (0, s_p - x.shape[2]),
                           (0, d_p - D)))

    qp = pad(q, sq_p)
    kp = pad(k, sk_p)
    vp = pad(v, sk_p)

    kernel = functools.partial(pa._attention_kernel, sk_valid=Sk,
                               scale=1.0 / (D ** 0.5))
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, sq_p, d_p), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, H, sk_p, d_p), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, H, sk_p, d_p), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, H, sq_p, d_p), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, sq_p, d_p), q.dtype),
        interpret=True,
    )(qp, kp, vp)
    return out[:, :, :Sq, :D]


@pytest.mark.parametrize("shape", [
    (2, 8, 16, 96),    # SGA text query geometry
    (1, 8, 64, 96),    # vision tokens
    (2, 4, 20, 24),    # unaligned everything
])
def test_pallas_kernel_matches_reference(rng, shape):
    B, H, Sq, D = shape
    Sk = Sq + 5
    q = rng.standard_normal((B, H, Sq, D), dtype=np.float32)
    k = rng.standard_normal((B, H, Sk, D), dtype=np.float32)
    v = rng.standard_normal((B, H, Sk, D), dtype=np.float32)

    got = np.asarray(_interpret_fused(jnp.asarray(q), jnp.asarray(k),
                                      jnp.asarray(v)))
    want = _ref_attention(q, k, v)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    # the jnp production path agrees too
    jnp_out = np.asarray(dot_product_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    np.testing.assert_allclose(jnp_out, want, rtol=2e-5, atol=2e-5)


def test_fused_attention_falls_back_off_tpu(rng):
    q = jnp.asarray(rng.standard_normal((1, 2, 8, 16), dtype=np.float32))
    assert pa.fused_attention(q, q, q) is None   # CPU -> fallback


def test_mha_use_pallas_flag_is_safe_off_tpu(rng):
    """use_pallas=True must be a no-op on CPU (identical numerics)."""
    x = jnp.asarray(rng.standard_normal((2, 10, 32), dtype=np.float32))
    cfg = AttentionConfig(hidden_size=32, num_heads=4, ff_size=32)
    mod_plain = MultiHeadAttention(cfg, use_pallas=False)
    mod_pallas = MultiHeadAttention(cfg, use_pallas=True)
    params = mod_plain.init(jax.random.PRNGKey(0), x, x, x)
    a = mod_plain.apply(params, x, x, x)
    b = mod_pallas.apply(params, x, x, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                               atol=1e-6)

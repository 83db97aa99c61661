"""Golden parity of the fusion ops against the reference's torch module.

The reference SGA stack (/root/reference/model/multi_head_vision_text_attn.py)
is torch-only, so it is imported directly (read-only) as the source of golden
outputs: a randomly-initialized torch module's weights are converted into the
flax param tree and both sides must agree to fp32 tolerance in eval mode.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")
from model.multi_head_vision_text_attn import (  # noqa: E402
    MHAtt as RefMHAtt,
    SGA as RefSGA,
    ImageConfiguration,
    TextConfiguration,
)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from t5_resnet_vqa_tpu.ops import (  # noqa: E402
    SGA,
    AttentionConfig,
    AttentionPooler,
    MultiHeadAttention,
    SGAStack,
    log_softmax_nll,
)
from t5_resnet_vqa_tpu.utils import torch_convert as tc  # noqa: E402

TOL = dict(rtol=2e-5, atol=2e-5)


def _torch_seed():
    torch.manual_seed(0)


def test_mhatt_parity_unmasked(rng):
    _torch_seed()
    ref = RefMHAtt(TextConfiguration()).eval()
    x = rng.standard_normal((2, 16, 768), dtype=np.float32)
    y = rng.standard_normal((2, 64, 768), dtype=np.float32)

    with torch.no_grad():
        want = ref(torch.tensor(y), torch.tensor(y), torch.tensor(x), None).numpy()

    mod = MultiHeadAttention(AttentionConfig())
    params = {"params": jax.tree.map(jnp.asarray, tc.convert_mhatt(ref.state_dict(), ""))}
    # prefix-less state dict: keys are "linear_v.weight" etc.
    got = mod.apply(params, jnp.asarray(y), jnp.asarray(y), jnp.asarray(x),
                    None, True)
    np.testing.assert_allclose(np.asarray(got), want, **TOL)


def test_mhatt_parity_masked(rng):
    _torch_seed()
    ref = RefMHAtt(TextConfiguration()).eval()
    x = rng.standard_normal((2, 16, 768), dtype=np.float32)
    # mask True = masked (torch masked_fill semantics), broadcast over heads
    mask = rng.random((2, 1, 16, 16)) < 0.3

    with torch.no_grad():
        want = ref(torch.tensor(x), torch.tensor(x), torch.tensor(x),
                   torch.tensor(mask)).numpy()

    mod = MultiHeadAttention(AttentionConfig())
    params = {"params": jax.tree.map(jnp.asarray, tc.convert_mhatt(ref.state_dict(), ""))}
    got = mod.apply(params, jnp.asarray(x), jnp.asarray(x), jnp.asarray(x),
                    jnp.asarray(mask), True)
    np.testing.assert_allclose(np.asarray(got), want, **TOL)


def test_sga_parity(rng):
    _torch_seed()
    ref = RefSGA(ImageConfiguration(), TextConfiguration()).eval()
    text = rng.standard_normal((2, 16, 768), dtype=np.float32)
    vision = rng.standard_normal((2, 64, 768), dtype=np.float32)

    with torch.no_grad():
        want = ref(torch.tensor(text), torch.tensor(vision)).numpy()

    mod = SGA(AttentionConfig())
    params = {"params": jax.tree.map(jnp.asarray, tc.convert_sga(ref.state_dict()))}
    got = mod.apply(params, jnp.asarray(text), jnp.asarray(vision),
                    deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want, **TOL)


def test_sga_stack_matches_reference_loop(rng):
    """The models' loop feeds fresh text as x, previous output as y

    (resnet_vqa_model.py:147-149). SGAStack must replicate that wiring."""
    _torch_seed()
    refs = [RefSGA(ImageConfiguration(), TextConfiguration()).eval() for _ in range(3)]
    text = rng.standard_normal((2, 16, 768), dtype=np.float32)
    vision = rng.standard_normal((2, 64, 768), dtype=np.float32)

    with torch.no_grad():
        t, y = torch.tensor(text), torch.tensor(vision)
        for ref in refs:
            y = ref(t, y)
        want = y.numpy()

    sd = {}
    for i, ref in enumerate(refs):
        for k, v in ref.state_dict().items():
            sd[f"sga_modules.{i}.{k}"] = v

    mod = SGAStack(num_blocks=3)
    params = {"params": jax.tree.map(jnp.asarray, tc.convert_sga_stack(sd, 3))}
    got = mod.apply(params, jnp.asarray(text), jnp.asarray(vision),
                    deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want, **TOL)


def test_attention_pooler_math(rng):
    """AttentionPooler vs a straight numpy transcription of

    resnet_vqa_model.py:23-26 (softmax(Wx+b) over seq, weighted sum)."""
    x = rng.standard_normal((3, 10, 8), dtype=np.float32)
    w = rng.standard_normal((8, 1), dtype=np.float32)
    b = rng.standard_normal((1,), dtype=np.float32)

    logits = x @ w + b                       # [3,10,1]
    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    att = e / e.sum(axis=1, keepdims=True)
    want = (att * x).sum(axis=1)

    mod = AttentionPooler(hidden_size=8)
    params = {"params": {"attention": {"kernel": jnp.asarray(w),
                                       "bias": jnp.asarray(b)}}}
    got = mod.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_log_softmax_nll_equals_cross_entropy(rng):
    """log_softmax + NLL == cross-entropy (ref resnet_vqa_model.py:156-162)."""
    logits = rng.standard_normal((4, 7), dtype=np.float32)
    labels = np.array([0, 3, 6, 2])

    want = torch.nn.NLLLoss()(
        torch.nn.functional.log_softmax(torch.tensor(logits), dim=-1),
        torch.tensor(labels),
    ).item()

    log_probs, loss = log_softmax_nll(jnp.asarray(logits), jnp.asarray(labels))
    assert np.isclose(float(loss), want, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(log_probs),
        torch.nn.functional.log_softmax(torch.tensor(logits), dim=-1).numpy(),
        rtol=1e-6, atol=1e-6,
    )


def test_channel_projection_equals_torch_convtranspose(rng):
    """ConvTranspose2d(k3,s1,p1) == SAME conv with flipped kernel

    (resnet_vqa_model.py:64-78)."""
    _torch_seed()
    ref = torch.nn.ConvTranspose2d(12, 16, kernel_size=3, stride=1, padding=1).eval()
    x = rng.standard_normal((2, 12, 8, 8), dtype=np.float32)

    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()          # NCHW

    from t5_resnet_vqa_tpu.ops import ChannelProjection
    mod = ChannelProjection(out_channels=16)
    params = {"params": {"conv": jax.tree.map(
        jnp.asarray, tc.conv_transpose2d_as_conv(ref.state_dict(), ""))}}
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    got = mod.apply(params, x_nhwc)                  # NHWC
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, rtol=1e-4, atol=1e-4)

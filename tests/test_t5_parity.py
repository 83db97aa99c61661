"""T5 encoder/decoder parity vs randomly-initialized HF torch T5.

The reference's language tower is HF t5-base (resnet_vqa_model.py:60-62,
vit_vqa_model.py:147-148). These tests build an HF torch T5 from config
(random init — this image has no network/pretrained cache), convert the
weights, and require fp32-tolerance agreement from the flax implementation.

A small geometry is used so the suite stays fast on 1 CPU core; the math is
dimension-independent. One full t5-base-geometry encoder test guards the
real-config path.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from t5_resnet_vqa_tpu.models.t5 import T5Config, T5Decoder, T5Encoder  # noqa: E402
from t5_resnet_vqa_tpu.utils import torch_convert as tc  # noqa: E402

TOL = dict(rtol=3e-5, atol=3e-5)


def _hf_config(cfg: T5Config):
    return transformers.T5Config(
        vocab_size=cfg.vocab_size,
        d_model=cfg.d_model,
        d_kv=cfg.d_kv,
        d_ff=cfg.d_ff,
        num_layers=cfg.num_layers,
        num_decoder_layers=cfg.num_decoder_layers,
        num_heads=cfg.num_heads,
        relative_attention_num_buckets=cfg.relative_attention_num_buckets,
        relative_attention_max_distance=cfg.relative_attention_max_distance,
        dropout_rate=cfg.dropout_rate,
        layer_norm_epsilon=cfg.layer_norm_epsilon,
        feed_forward_proj="relu",
        tie_word_embeddings=False,
    )


def _rand_ids(rng, shape, vocab):
    return rng.integers(2, vocab, size=shape).astype(np.int64)


def _mask(shape, valid_lens):
    m = np.zeros(shape, dtype=np.int64)
    for i, l in enumerate(valid_lens):
        m[i, :l] = 1
    return m


@pytest.fixture(scope="module")
def tiny_pair():
    cfg = T5Config.tiny()
    torch.manual_seed(0)
    hf = transformers.T5ForConditionalGeneration(_hf_config(cfg)).eval()
    return cfg, hf


def test_t5_encoder_parity_tiny(tiny_pair, rng):
    cfg, hf = tiny_pair
    ids = _rand_ids(rng, (3, 16), cfg.vocab_size)
    mask = _mask((3, 16), [16, 9, 4])

    with torch.no_grad():
        want = hf.encoder(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
        ).last_hidden_state.numpy()

    enc = T5Encoder(cfg)
    params = {"params": jax.tree.map(
        jnp.asarray, tc.convert_t5_encoder(hf.state_dict(), cfg.num_layers))}
    got = enc.apply(params, jnp.asarray(ids), jnp.asarray(mask),
                    deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want, **TOL)


def test_t5_decoder_parity_tiny(tiny_pair, rng):
    """Decoder in the exact ViT-VQA regime: 1-token encoder memory,

    padded decoder ids with attention mask (vit_vqa_model.py:207-212)."""
    cfg, hf = tiny_pair
    B, S = 3, 20
    ids = _rand_ids(rng, (B, S), cfg.vocab_size)
    mask = _mask((B, S), [20, 11, 5])
    memory = rng.standard_normal((B, 1, cfg.d_model), dtype=np.float32)

    with torch.no_grad():
        want = hf.decoder(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            encoder_hidden_states=torch.tensor(memory),
        ).last_hidden_state.numpy()

    dec = T5Decoder(cfg)
    params = {"params": jax.tree.map(
        jnp.asarray,
        tc.convert_t5_decoder(hf.state_dict(), cfg.num_decoder_layers))}
    got = dec.apply(params, jnp.asarray(ids), jnp.asarray(memory),
                    jnp.asarray(mask), deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want, **TOL)


def test_t5_decoder_parity_multi_token_memory(tiny_pair, rng):
    cfg, hf = tiny_pair
    B, S, M = 2, 8, 5
    ids = _rand_ids(rng, (B, S), cfg.vocab_size)
    memory = rng.standard_normal((B, M, cfg.d_model), dtype=np.float32)
    enc_mask = _mask((B, M), [5, 3])

    with torch.no_grad():
        want = hf.decoder(
            input_ids=torch.tensor(ids),
            encoder_hidden_states=torch.tensor(memory),
            encoder_attention_mask=torch.tensor(enc_mask),
        ).last_hidden_state.numpy()

    dec = T5Decoder(cfg)
    params = {"params": jax.tree.map(
        jnp.asarray,
        tc.convert_t5_decoder(hf.state_dict(), cfg.num_decoder_layers))}
    got = dec.apply(params, jnp.asarray(ids), jnp.asarray(memory),
                    None, jnp.asarray(enc_mask), deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want, **TOL)


@pytest.mark.slow
def test_t5_encoder_parity_base_geometry(rng):
    """Full t5-base geometry (12 layers, 768 d_model) on a tiny batch —

    the exact tower the CNN-family VQA models consume."""
    cfg = T5Config.t5_base()
    torch.manual_seed(1)
    hf = transformers.T5EncoderModel(_hf_config(cfg)).eval()

    ids = _rand_ids(rng, (2, 16), 32100)
    mask = _mask((2, 16), [16, 7])

    with torch.no_grad():
        want = hf.encoder(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
        ).last_hidden_state.numpy()

    enc = T5Encoder(cfg)
    params = {"params": jax.tree.map(
        jnp.asarray, tc.convert_t5_encoder(hf.state_dict(), cfg.num_layers))}
    got = enc.apply(params, jnp.asarray(ids), jnp.asarray(mask),
                    deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_relative_position_bucket_matches_hf():
    from transformers.models.t5.modeling_t5 import T5Attention as HFT5Attention
    from t5_resnet_vqa_tpu.models.t5 import relative_position_bucket

    rel = np.arange(-300, 300).reshape(1, -1) - np.zeros((1, 1), np.int64)
    rel = torch.tensor(np.arange(-300, 300)[None, :])
    for bidirectional in (True, False):
        want = HFT5Attention._relative_position_bucket(
            rel, bidirectional=bidirectional, num_buckets=32, max_distance=128
        ).numpy()
        got = np.asarray(relative_position_bucket(
            jnp.asarray(rel.numpy()), bidirectional, 32, 128))
        np.testing.assert_array_equal(got, want)


def test_fused_qkv_bit_parity():
    """T5Config.fused_qkv: one concat-kernel matmul must reproduce the
    separate q/k/v path exactly (same params, same math) for both the
    encoder self-attention and the decoder cross-attention, including
    gradients back through the concat."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from t5_resnet_vqa_tpu.models.t5 import T5Config, T5Decoder, T5Encoder

    cfg = T5Config.tiny()
    cfg_f = dataclasses.replace(cfg, fused_qkv=True)
    rng = np.random.default_rng(3)
    B, S = 2, 9
    ids = jnp.asarray(rng.integers(2, cfg.vocab_size, (B, S)), jnp.int32)
    mask = jnp.asarray([[1] * S, [1] * 5 + [0] * (S - 5)], jnp.int32)

    enc = T5Encoder(cfg)
    enc_f = T5Encoder(cfg_f)
    p = enc.init(jax.random.PRNGKey(0), ids, mask)
    out = enc.apply(p, ids, mask)
    out_f = enc_f.apply(p, ids, mask)          # same params, fused compute
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out_f))

    g = jax.grad(lambda pp: jnp.sum(enc.apply(pp, ids, mask) ** 2))(p)
    g_f = jax.grad(lambda pp: jnp.sum(enc_f.apply(pp, ids, mask) ** 2))(p)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(g),
            jax.tree_util.tree_leaves_with_path(g_f)):
        assert ka == kb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)

    # decoder: self-attn fused qkv + cross-attn fused kv
    dec = T5Decoder(cfg)
    dec_f = T5Decoder(cfg_f)
    d_ids = jnp.asarray(rng.integers(2, cfg.vocab_size, (B, 4)), jnp.int32)
    d_mask = jnp.ones((B, 4), jnp.int32)
    mem = jnp.asarray(rng.standard_normal((B, S, cfg.d_model)), jnp.float32)
    pd = dec.init(jax.random.PRNGKey(1), d_ids, mem, d_mask, mask)
    o1 = dec.apply(pd, d_ids, mem, d_mask, mask)
    o2 = dec_f.apply(pd, d_ids, mem, d_mask, mask)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))

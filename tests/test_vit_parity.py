"""ViT tower and VitVQAModel parity vs randomly-initialized HF torch models.

Reference: vit_vqa_model.py uses frozen ViTModel (pooler_output + attention
maps) and a full T5 enc-dec with a 1-token cross-attention memory.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from t5_resnet_vqa_tpu.models.t5 import T5Config  # noqa: E402
from t5_resnet_vqa_tpu.models.vit import ViTConfig, ViTModel  # noqa: E402
from t5_resnet_vqa_tpu.models.vit_vqa import VitVQAModel  # noqa: E402
from t5_resnet_vqa_tpu.utils import torch_convert as tc  # noqa: E402

from test_t5_parity import _hf_config  # noqa: E402

TOL = dict(rtol=3e-5, atol=3e-5)


def _hf_vit(cfg: ViTConfig):
    hf_cfg = transformers.ViTConfig(
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.mlp_dim,
        image_size=cfg.image_size,
        patch_size=cfg.patch_size,
        hidden_act="gelu",
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        layer_norm_eps=cfg.layer_norm_eps,
        attn_implementation="eager",
    )
    return transformers.ViTModel(hf_cfg, add_pooling_layer=True).eval()


def test_vit_parity_tiny(rng):
    cfg = ViTConfig.tiny()
    torch.manual_seed(0)
    hf = _hf_vit(cfg)

    x = rng.standard_normal((2, 3, cfg.image_size, cfg.image_size),
                            dtype=np.float32)
    with torch.no_grad():
        out = hf(torch.tensor(x), output_attentions=True)
        want_h = out.last_hidden_state.numpy()
        want_p = out.pooler_output.numpy()
        want_att = np.stack([a.numpy() for a in out.attentions], axis=0)

    model = ViTModel(cfg)
    params = {"params": jax.tree.map(
        jnp.asarray, tc.convert_vit(hf.state_dict(), cfg.num_layers))}
    got_h, got_p, got_att = model.apply(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)), True,
        return_attentions=True)

    np.testing.assert_allclose(np.asarray(got_h), want_h, **TOL)
    np.testing.assert_allclose(np.asarray(got_p), want_p, **TOL)
    np.testing.assert_allclose(np.asarray(got_att), want_att, **TOL)


@pytest.mark.slow
def test_vit_parity_base_geometry(rng):
    cfg = ViTConfig.vit_base()
    torch.manual_seed(1)
    hf = _hf_vit(cfg)
    x = rng.standard_normal((1, 3, 224, 224), dtype=np.float32)
    with torch.no_grad():
        out = hf(torch.tensor(x))
    model = ViTModel(cfg)
    params = {"params": jax.tree.map(
        jnp.asarray, tc.convert_vit(hf.state_dict(), cfg.num_layers))}
    got_h, got_p = model.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got_h),
                               out.last_hidden_state.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_p), out.pooler_output.numpy(),
                               rtol=2e-4, atol=2e-4)


def test_vit_vqa_full_parity(rng):
    """Full VitVQAModel dataflow vs a torch golden wired per

    vit_vqa_model.py:168-227 (frozen ViT pooler -> T5 enc token-0 -> fusing
    MLP -> T5 decoder 1-token memory -> last-non-pad hidden -> classify)."""
    vit_cfg = ViTConfig.tiny()
    t5_cfg = T5Config(vocab_size=128, d_model=vit_cfg.hidden_size, d_kv=8,
                      d_ff=64, num_layers=2, num_decoder_layers=2, num_heads=4)
    answers = 13
    torch.manual_seed(0)
    hf_vit = _hf_vit(vit_cfg)
    hf_t5 = transformers.T5ForConditionalGeneration(_hf_config(t5_cfg)).eval()
    hidden = t5_cfg.d_model
    fuse = torch.nn.Linear(2 * hidden, hidden).eval()
    cls = torch.nn.Linear(hidden, answers).eval()

    B, Sq, Sd = 2, 9, 12
    pix = rng.standard_normal((B, 3, vit_cfg.image_size, vit_cfg.image_size),
                              dtype=np.float32)
    q_ids = rng.integers(2, 128, size=(B, Sq)).astype(np.int64)
    q_mask = np.ones((B, Sq), np.int64); q_mask[1, 6:] = 0
    d_ids = rng.integers(2, 128, size=(B, Sd)).astype(np.int64)
    d_mask = np.ones((B, Sd), np.int64); d_mask[0, 10:] = 0; d_mask[1, 7:] = 0
    labels = np.array([1, 7])

    with torch.no_grad():
        pooled = hf_vit(torch.tensor(pix)).pooler_output
        enc = hf_t5.encoder(input_ids=torch.tensor(q_ids),
                            attention_mask=torch.tensor(q_mask)).last_hidden_state
        fused = torch.relu(fuse(torch.cat([pooled, enc[:, 0, :]], dim=1)))
        dec = hf_t5.decoder(
            input_ids=torch.tensor(d_ids),
            attention_mask=torch.tensor(d_mask),
            encoder_hidden_states=fused.unsqueeze(1)).last_hidden_state
        last_idx = torch.max(
            torch.where(torch.tensor(d_mask) == 1,
                        torch.arange(Sd),
                        torch.zeros_like(torch.tensor(d_mask))), dim=1).values
        ans = torch.stack([dec[b, i, :] for b, i in enumerate(last_idx)], dim=0)
        logits = cls(ans)
        want_lp = torch.nn.functional.log_softmax(logits, dim=-1)
        want_loss = torch.nn.NLLLoss()(want_lp, torch.tensor(labels))

    model = VitVQAModel(answer_spaces=answers, t5_config=t5_cfg,
                        vit_config=vit_cfg)
    sd = hf_t5.state_dict()
    params = {"params": jax.tree.map(jnp.asarray, {
        "vision_model": tc.convert_vit(hf_vit.state_dict(), vit_cfg.num_layers),
        # ONE tied table at the top, like the model (and the reference)
        "shared": {"embedding": np.asarray(sd["shared.weight"])},
        "lang_encoder": tc.convert_t5_encoder(sd, t5_cfg.num_layers,
                                              include_shared=False),
        "lang_decoder": tc.convert_t5_decoder(sd, t5_cfg.num_decoder_layers,
                                              include_shared=False),
        "fusing_layer": tc.linear(fuse.state_dict(), ""),
        "classification_layer": tc.linear(cls.state_dict(), ""),
    })}

    got_lp, got_loss = model.apply(
        params,
        question_input_ids=jnp.asarray(q_ids),
        question_attention_masks=jnp.asarray(q_mask),
        decoder_question_input_ids=jnp.asarray(d_ids),
        decoder_question_attention_masks=jnp.asarray(d_mask),
        pixel_values=jnp.asarray(pix.transpose(0, 2, 3, 1)),
        annotation_ids=jnp.asarray(labels),
    )
    np.testing.assert_allclose(np.asarray(got_lp), want_lp.numpy(),
                               rtol=1e-4, atol=1e-4)
    assert np.isclose(float(got_loss), float(want_loss), rtol=1e-4, atol=1e-4)

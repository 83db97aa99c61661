"""CrossAttentionVitVQAModel parity vs a torch golden wired per

vit_vqa_model.py:65-125 out of HF RobertaModel/ViTModel pieces (random init).
The reference's stream-order flip after layer 1 (concat of
roberta_hidden[:, 197:, :] with image states added to the ORIGINAL
[image; text] embeddings, ref :111-112) is replicated deliberately.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from t5_resnet_vqa_tpu.models.cross_attention_vqa import CrossAttentionVitVQAModel  # noqa: E402
from t5_resnet_vqa_tpu.models.roberta import RobertaConfig, RobertaEmbeddings, RobertaLayer  # noqa: E402
from t5_resnet_vqa_tpu.models.vit import ViTConfig  # noqa: E402
from t5_resnet_vqa_tpu.utils import torch_convert as tc  # noqa: E402

from test_vit_parity import _hf_vit  # noqa: E402

TOL = dict(rtol=5e-5, atol=5e-5)


def _hf_roberta(cfg: RobertaConfig):
    hf_cfg = transformers.RobertaConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        type_vocab_size=cfg.type_vocab_size,
        layer_norm_eps=cfg.layer_norm_eps,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        pad_token_id=cfg.pad_token_id,
        attn_implementation="eager",
    )
    return transformers.RobertaModel(hf_cfg, add_pooling_layer=False).eval()


def test_roberta_embeddings_parity(rng):
    cfg = RobertaConfig.tiny()
    torch.manual_seed(0)
    hf = _hf_roberta(cfg)
    ids = rng.integers(2, cfg.vocab_size, size=(2, 11)).astype(np.int64)
    ids[1, 7:] = cfg.pad_token_id  # exercise position-id offset around pads

    with torch.no_grad():
        want = hf.embeddings(input_ids=torch.tensor(ids)).numpy()

    mod = RobertaEmbeddings(cfg)
    params = {"params": jax.tree.map(
        jnp.asarray, tc.convert_roberta_embeddings(hf.state_dict()))}
    got = mod.apply(params, jnp.asarray(ids), deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want, **TOL)


def test_roberta_layer_parity(rng):
    cfg = RobertaConfig.tiny()
    torch.manual_seed(0)
    hf = _hf_roberta(cfg)
    x = rng.standard_normal((2, 13, cfg.hidden_size), dtype=np.float32)

    with torch.no_grad():
        want = hf.encoder.layer[0](torch.tensor(x))[0].numpy()

    mod = RobertaLayer(cfg)
    params = {"params": jax.tree.map(
        jnp.asarray,
        tc.convert_roberta_layer(hf.state_dict(), "encoder.layer.0"))}
    got = mod.apply(params, jnp.asarray(x), deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want, **TOL)


def test_cross_attention_vqa_full_parity(rng):
    vit_cfg = ViTConfig.tiny()
    rob_cfg = RobertaConfig.tiny()
    answers = 9
    torch.manual_seed(0)
    hf_vit = _hf_vit(vit_cfg)
    hf_rob = _hf_roberta(rob_cfg)
    pooler_lin = torch.nn.Linear(vit_cfg.hidden_size, 1).eval()
    cls_lin = torch.nn.Linear(vit_cfg.hidden_size, answers).eval()
    shared_ln = torch.nn.LayerNorm(vit_cfg.hidden_size).eval()
    with torch.no_grad():
        shared_ln.weight.copy_(torch.rand(vit_cfg.hidden_size) + 0.5)
        shared_ln.bias.copy_(torch.randn(vit_cfg.hidden_size) * 0.1)

    B, L = 2, 10
    n_img = vit_cfg.num_patches + 1
    pix = rng.standard_normal((B, 3, vit_cfg.image_size, vit_cfg.image_size),
                              dtype=np.float32)
    ids = rng.integers(2, rob_cfg.vocab_size, size=(B, L)).astype(np.int64)
    labels = np.array([0, 5])
    num_layers = min(vit_cfg.num_layers, rob_cfg.num_layers)

    # torch golden, wired per ref :77-116
    with torch.no_grad():
        image_emb = hf_vit.embeddings(torch.tensor(pix))
        text_emb = hf_rob.embeddings(input_ids=torch.tensor(ids))
        concat_emb = torch.cat([image_emb, text_emb], dim=1)
        concat_hidden = concat_emb
        image_hidden = image_emb
        for i in range(num_layers):
            rob_h = hf_rob.encoder.layer[i](concat_hidden)[0]
            # transformers 4.57 ViTLayer returns a bare Tensor (older
            # versions, as used by the reference, returned a tuple)
            image_hidden = hf_vit.encoder.layer[i](image_hidden)
            concat_hidden = torch.cat(
                [rob_h[:, n_img:, :], image_hidden], dim=1)
            concat_hidden = shared_ln(concat_hidden + concat_emb)
        att = torch.softmax(pooler_lin(concat_hidden), dim=1).transpose(1, 2)
        pooled = torch.bmm(att, concat_hidden).squeeze(1)
        want_lp = torch.nn.functional.log_softmax(cls_lin(pooled), dim=-1)
        want_loss = torch.nn.NLLLoss()(want_lp, torch.tensor(labels))

    vit_sd = hf_vit.state_dict()
    rob_sd = hf_rob.state_dict()
    params_dict = {
        "vit_embeddings": tc.convert_vit_embeddings(vit_sd),
        "roberta_embeddings": tc.convert_roberta_embeddings(rob_sd),
        "layer_norm": tc.layernorm(shared_ln.state_dict(), ""),
        "attention_pooler": {"attention": tc.linear(pooler_lin.state_dict(), "")},
        "classification_layer": tc.linear(cls_lin.state_dict(), ""),
    }
    for i in range(num_layers):
        params_dict[f"roberta_layer_{i}"] = tc.convert_roberta_layer(
            rob_sd, f"encoder.layer.{i}")
        params_dict[f"vit_layer_{i}"] = tc.convert_vit_layer(
            vit_sd, f"encoder.layer.{i}")
    params = {"params": jax.tree.map(jnp.asarray, params_dict)}

    model = CrossAttentionVitVQAModel(
        answer_spaces=answers, vit_config=vit_cfg, roberta_config=rob_cfg)
    got_lp, got_loss = model.apply(
        params,
        question_input_ids=jnp.asarray(ids),
        pixel_values=jnp.asarray(pix.transpose(0, 2, 3, 1)),
        annotation_ids=jnp.asarray(labels),
    )
    np.testing.assert_allclose(np.asarray(got_lp), want_lp.numpy(),
                               rtol=1e-4, atol=1e-4)
    assert np.isclose(float(got_loss), float(want_loss), rtol=1e-4, atol=1e-4)

"""Training-dynamics parity: 5 optimizer steps vs a torch golden trainer.

Forward parity is pinned elsewhere (test_resnet_vqa_model.py); this pins the
TRAINING trajectory — grouped-LR AdamW(wd=0.1, amsgrad) + global-norm clip
1.0 + HF linear-warmup schedule, exactly as the reference trains
(faster_rcnn_vqa_trainer.py:231-287 optimizer groups/schedule, :391-406 the
step: zero_grad / forward / backward / clip / step / sched.step). Both sides
start from identical converted weights and consume identical batches; the
per-step losses and final trainable params must match to fp32 tolerance.

Also pins the frozen-tower semantics: torch never updates params whose
.grad is None (the no_grad vision tower), so our optimizer must not either —
in particular NO weight decay may leak into the frozen backbone (a plain
zero-grad AdamW update would erode it by lr*wd*p every step).
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

sys.path.insert(0, "/root/reference")
from model.multi_head_vision_text_attn import SGA as RefSGA  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from t5_resnet_vqa_tpu.core.config import (  # noqa: E402
    LRSchedulerConfig,
    OptimizerConfig,
)
from t5_resnet_vqa_tpu.models.resnet_vqa import ResnetVQAModel  # noqa: E402
from t5_resnet_vqa_tpu.models.t5 import T5Config  # noqa: E402
from t5_resnet_vqa_tpu.ops import AttentionConfig  # noqa: E402
from t5_resnet_vqa_tpu.train.optimizer import build_optimizer  # noqa: E402
from t5_resnet_vqa_tpu.train.trainer import make_train_step  # noqa: E402
from t5_resnet_vqa_tpu.utils import torch_convert as tc  # noqa: E402

from test_resnet_parity import _hf_resnet, _randomize_bn_stats  # noqa: E402
from test_resnet_vqa_model import (  # noqa: E402
    _SGACfg,
    _torch_golden_forward,
)
from test_t5_parity import _hf_config  # noqa: E402

STEPS = 5
WARMUP = 2
VISION_LR, LM_LR, FUSION_LR, CLS_LR = 8e-3, 1e-3, 5e-4, 1e-2
WD = 0.1


def _torch_train_loop(resnet, proj, t5enc, sgas, pooler_lin, cls_lin,
                      batches):
    """Reference trainer semantics (faster_rcnn_vqa_trainer.py:391-406)."""
    trainable = []
    groups = [
        # the reference registers the FROZEN vision tower with its own lr
        # (ref :234-236); torch skips it at step time (grad stays None)
        {"params": list(resnet.parameters()), "lr": VISION_LR},
        {"params": list(t5enc.parameters()), "lr": LM_LR},
        {"params": (list(proj.parameters())
                    + [p for s in sgas for p in s.parameters()]
                    + list(pooler_lin.parameters())), "lr": FUSION_LR},
        {"params": list(cls_lin.parameters()), "lr": CLS_LR},
    ]
    for g in groups:
        trainable += g["params"]
    opt = torch.optim.AdamW(groups, weight_decay=WD, amsgrad=True)
    sched = transformers.get_linear_schedule_with_warmup(opt, WARMUP, STEPS)

    losses = []
    for images, q_ids, q_mask, labels in batches:
        opt.zero_grad()
        _, loss, _ = _torch_golden_forward(
            resnet, proj, t5enc, sgas, pooler_lin, cls_lin,
            torch.tensor(images), torch.tensor(q_ids),
            torch.tensor(q_mask), torch.tensor(labels))
        loss.backward()
        torch.nn.utils.clip_grad_norm_(trainable, 1.0)
        opt.step()
        sched.step()
        losses.append(float(loss))
    return losses


@pytest.mark.slow
def test_train_dynamics_parity(rng):
    torch.manual_seed(0)
    hidden, heads, answers = 64, 4, 17
    t5_cfg = T5Config(vocab_size=256, d_model=hidden, d_kv=16, d_ff=128,
                      num_layers=2, num_decoder_layers=2, num_heads=4,
                      dropout_rate=0.0)
    sga_cfg = AttentionConfig(hidden_size=hidden, num_heads=heads,
                              ff_size=hidden, dropout_rate=0.0)
    variant = "resnet18"

    # --- torch golden pieces (dropout 0 so train mode == eval math) ---
    resnet = _hf_resnet(variant)
    with torch.no_grad():
        _randomize_bn_stats(resnet)
    proj = torch.nn.ConvTranspose2d(512, hidden, 3, 1, 1)
    hf_t5 = transformers.T5EncoderModel(_hf_config(t5_cfg))
    sgas = [RefSGA(_SGACfg(hidden, heads, hidden, dropout=0.0),
                   _SGACfg(hidden, heads, hidden, dropout=0.0))]
    pooler_lin = torch.nn.Linear(hidden, 1)
    cls_lin = torch.nn.Linear(hidden, answers)
    resnet.eval()  # frozen tower: BN running stats, like the forced .eval()

    # --- identical starting weights on the flax side ---
    sga_sd = {f"sga_modules.0.{k}": v
              for k, v in sgas[0].state_dict().items()}
    # deep-copy: on the CPU backend jnp.asarray can zero-copy a numpy view
    # that still aliases torch storage, and the torch loop below mutates the
    # modules in place via opt.step()
    params = jax.tree.map(lambda v: jnp.asarray(np.array(v, copy=True)), {
        "vision_model": tc.convert_resnet_hf(resnet.state_dict(), variant),
        "upscale_layer": {
            "conv": tc.conv_transpose2d_as_conv(proj.state_dict(), "")},
        "lang_model": tc.convert_t5_encoder(hf_t5.state_dict(), 2),
        "sga_modules": tc.convert_sga_stack(sga_sd, 1),
        "attention_pooler": {
            "attention": tc.linear(pooler_lin.state_dict(), "")},
        "classification_layer": tc.linear(cls_lin.state_dict(), ""),
    })
    initial_vision = jax.tree.map(np.asarray, params["vision_model"])

    # --- identical batch stream ---
    B = 2
    batches = []
    for i in range(STEPS):
        images = rng.standard_normal((B, 3, 64, 64)).astype(np.float32)
        q_ids = rng.integers(2, 256, size=(B, 16)).astype(np.int64)
        q_mask = np.ones((B, 16), np.int64)
        q_mask[1, 9 + (i % 4):] = 0
        labels = rng.integers(0, answers, size=(B,)).astype(np.int64)
        batches.append((images, q_ids, q_mask, labels))

    want_losses = _torch_train_loop(resnet, proj, hf_t5, sgas, pooler_lin,
                                    cls_lin, batches)

    # --- our side: the production step over the production optimizer ---
    model = ResnetVQAModel(
        answer_spaces=answers, vision_model_name=variant, t5_config=t5_cfg,
        sga_config=sga_cfg, num_attention_blocks=1)
    opt_cfg = OptimizerConfig(
        type="AdamW", vision_lr=VISION_LR, lm_encoder_lr=LM_LR,
        fusion_lr=FUSION_LR, classifier_lr=CLS_LR,
        kwargs={"weight_decay": WD, "amsgrad": True})
    sched_cfg = LRSchedulerConfig(num_warmup_steps=WARMUP)
    tx, _, _ = build_optimizer(opt_cfg, sched_cfg, STEPS,
                               gradient_clipping=1.0,
                               frozen_modules=model.frozen_modules())
    opt_state = tx.init(params)
    train_step = jax.jit(make_train_step(model, tx))

    got_losses = []
    key = jax.random.PRNGKey(0)
    for images, q_ids, q_mask, labels in batches:
        batch = dict(
            question_input_ids=jnp.asarray(q_ids, jnp.int32),
            question_attention_masks=jnp.asarray(q_mask, jnp.int32),
            image_tensors=jnp.asarray(images.transpose(0, 2, 3, 1)),
            annotation_ids=jnp.asarray(labels, jnp.int32),
        )
        params, opt_state, loss, _ = train_step(params, opt_state, batch,
                                                key)
        got_losses.append(float(loss))

    # loss trajectory matches the torch trainer step-for-step
    np.testing.assert_allclose(got_losses, want_losses, rtol=3e-4, atol=3e-4)
    assert got_losses[0] != got_losses[-1]  # it actually trained

    # frozen tower: bitwise untouched (torch: grad is None -> skipped;
    # ours: set_to_zero label -> no update, no weight decay)
    for a, b in zip(jax.tree.leaves(initial_vision),
                    jax.tree.leaves(params["vision_model"])):
        np.testing.assert_array_equal(a, np.asarray(b))

    # trainable params land where torch lands (schedule/clip/amsgrad drift
    # would show up here even if losses happened to agree)
    want_cls = cls_lin.weight.detach().numpy().T
    np.testing.assert_allclose(
        np.asarray(params["classification_layer"]["kernel"]), want_cls,
        rtol=5e-3, atol=5e-4)
    want_pool = pooler_lin.weight.detach().numpy().T
    np.testing.assert_allclose(
        np.asarray(params["attention_pooler"]["attention"]["kernel"]),
        want_pool, rtol=5e-3, atol=5e-4)


# ---------------------------------------------------------------------------
# ViT enc-dec family: the tied-shared-table dynamics proof (round 4)
# ---------------------------------------------------------------------------


def _torch_vit_golden_forward(hf_vit, hf_t5, fuse, cls_lin,
                              pix, q_ids, q_mask, d_ids, d_mask, labels):
    """The reference VitVQAModel forward composition
    (vit_vqa_model.py:168-227), dropout 0: frozen-ViT pooled CLS + T5-enc
    token-0 -> fuse+relu -> decoder on a 1-token memory -> last-non-pad
    hidden -> classifier -> log_softmax/NLL."""
    with torch.no_grad():                      # ref runs ViT under no_grad
        pooled = hf_vit(pix).pooler_output
    enc = hf_t5.encoder(input_ids=q_ids,
                        attention_mask=q_mask).last_hidden_state
    fused = torch.relu(fuse(torch.cat([pooled, enc[:, 0, :]], dim=1)))
    dec = hf_t5.decoder(input_ids=d_ids, attention_mask=d_mask,
                        encoder_hidden_states=fused.unsqueeze(1)
                        ).last_hidden_state
    Sd = d_ids.shape[1]
    last_idx = torch.max(torch.where(d_mask == 1, torch.arange(Sd),
                                     torch.zeros_like(d_mask)), dim=1).values
    ans = torch.stack([dec[b, i, :] for b, i in enumerate(last_idx)], dim=0)
    lp = torch.nn.functional.log_softmax(cls_lin(ans), dim=-1)
    return torch.nn.NLLLoss()(lp, labels)


@pytest.mark.slow
def test_vit_family_train_dynamics_parity(rng):
    """5 optimizer steps of the ViT enc-dec family vs the reference
    composition with the reference ViT trainer's OWN grouping
    (vit_vqa_trainer.py:298-319: vision@vision_lr, ALL of lang_model —
    shared table included — @lm_encoder_lr, fusing+classifier
    @classifier_lr). The headline assert is the SHARED token table: torch's
    T5ForConditionalGeneration accumulates encoder-question AND
    decoder-prompt gradients into ONE table; round <=3's two untied copies
    diverge from this trajectory on step 1 (the round-4 tie makes the
    gradient flow match)."""
    from t5_resnet_vqa_tpu.models.vit import ViTConfig
    from t5_resnet_vqa_tpu.models.vit_vqa import VitVQAModel
    from test_vit_parity import _hf_vit

    torch.manual_seed(0)
    hidden, answers = 32, 11
    vit_cfg = ViTConfig(hidden_size=hidden, num_layers=2, num_heads=4,
                        mlp_dim=64, patch_size=16, image_size=32)
    t5_cfg = T5Config(vocab_size=256, d_model=hidden, d_kv=8, d_ff=64,
                      num_layers=2, num_decoder_layers=2, num_heads=4,
                      dropout_rate=0.0)

    hf_vit = _hf_vit(vit_cfg)
    hf_t5 = transformers.T5ForConditionalGeneration(_hf_config(t5_cfg))
    fuse = torch.nn.Linear(2 * hidden, hidden)
    cls_lin = torch.nn.Linear(hidden, answers)

    sd = hf_t5.state_dict()
    params = jax.tree.map(lambda v: jnp.asarray(np.array(v, copy=True)), {
        "vision_model": tc.convert_vit(hf_vit.state_dict(),
                                       vit_cfg.num_layers),
        "shared": {"embedding": np.asarray(sd["shared.weight"])},
        "lang_encoder": tc.convert_t5_encoder(sd, 2, include_shared=False),
        "lang_decoder": tc.convert_t5_decoder(sd, 2, include_shared=False),
        "fusing_layer": tc.linear(fuse.state_dict(), ""),
        "classification_layer": tc.linear(cls_lin.state_dict(), ""),
    })
    initial_shared = np.asarray(params["shared"]["embedding"]).copy()

    B = 2
    batches = []
    for i in range(STEPS):
        pix = rng.standard_normal((B, 3, 32, 32)).astype(np.float32)
        q_ids = rng.integers(2, 256, size=(B, 9)).astype(np.int64)
        q_mask = np.ones((B, 9), np.int64)
        q_mask[1, 5 + (i % 3):] = 0
        d_ids = rng.integers(2, 256, size=(B, 12)).astype(np.int64)
        d_mask = np.ones((B, 12), np.int64)
        d_mask[0, 8 + (i % 4):] = 0
        labels = rng.integers(0, answers, size=(B,)).astype(np.int64)
        batches.append((pix, q_ids, q_mask, d_ids, d_mask, labels))

    # --- torch loop with the reference ViT trainer's grouping ---
    groups = [
        {"params": list(hf_vit.parameters()), "lr": VISION_LR},
        {"params": list(hf_t5.parameters()), "lr": LM_LR},
        {"params": list(fuse.parameters()), "lr": CLS_LR},
        {"params": list(cls_lin.parameters()), "lr": CLS_LR},
    ]
    trainable = [p for g in groups for p in g["params"]]
    opt = torch.optim.AdamW(groups, weight_decay=WD, amsgrad=True)
    sched = transformers.get_linear_schedule_with_warmup(opt, WARMUP, STEPS)
    want_losses = []
    for pix, q_ids, q_mask, d_ids, d_mask, labels in batches:
        opt.zero_grad()
        loss = _torch_vit_golden_forward(
            hf_vit, hf_t5, fuse, cls_lin,
            torch.tensor(pix), torch.tensor(q_ids), torch.tensor(q_mask),
            torch.tensor(d_ids), torch.tensor(d_mask),
            torch.tensor(labels))
        loss.backward()
        torch.nn.utils.clip_grad_norm_(trainable, 1.0)
        opt.step()
        sched.step()
        want_losses.append(float(loss))

    # --- our side: production step + the reference grouping as group_map ---
    model = VitVQAModel(answer_spaces=answers, t5_config=t5_cfg,
                        vit_config=vit_cfg, fusing_dropout=0.0)
    opt_cfg = OptimizerConfig(
        type="AdamW", vision_lr=VISION_LR, lm_encoder_lr=LM_LR,
        classifier_lr=CLS_LR, kwargs={"weight_decay": WD, "amsgrad": True})
    sched_cfg = LRSchedulerConfig(num_warmup_steps=WARMUP)
    group_map = {"vision_model": "vision", "shared": "lm_encoder",
                 "lang_encoder": "lm_encoder", "lang_decoder": "lm_encoder",
                 "fusing_layer": "classifier",
                 "classification_layer": "classifier"}
    tx, _, _ = build_optimizer(opt_cfg, sched_cfg, STEPS,
                               gradient_clipping=1.0, group_map=group_map,
                               frozen_modules=model.frozen_modules())
    opt_state = tx.init(params)
    train_step = jax.jit(make_train_step(model, tx))

    got_losses = []
    key = jax.random.PRNGKey(0)
    for pix, q_ids, q_mask, d_ids, d_mask, labels in batches:
        batch = dict(
            question_input_ids=jnp.asarray(q_ids, jnp.int32),
            question_attention_masks=jnp.asarray(q_mask, jnp.int32),
            decoder_question_input_ids=jnp.asarray(d_ids, jnp.int32),
            decoder_question_attention_masks=jnp.asarray(d_mask, jnp.int32),
            pixel_values=jnp.asarray(pix.transpose(0, 2, 3, 1)),
            annotation_ids=jnp.asarray(labels, jnp.int32),
        )
        params, opt_state, loss, _ = train_step(params, opt_state, batch,
                                                key)
        got_losses.append(float(loss))

    np.testing.assert_allclose(got_losses, want_losses, rtol=3e-4, atol=3e-4)

    # THE tied-table assert: our single shared table lands exactly where
    # torch's tied table lands, and it moved (both token streams fed it)
    want_shared = hf_t5.shared.weight.detach().numpy()
    got_shared = np.asarray(params["shared"]["embedding"])
    assert np.abs(got_shared - initial_shared).max() > 1e-6, "table never trained"
    np.testing.assert_allclose(got_shared, want_shared, rtol=5e-3, atol=5e-4)

    np.testing.assert_allclose(
        np.asarray(params["classification_layer"]["kernel"]),
        cls_lin.weight.detach().numpy().T, rtol=5e-3, atol=5e-4)


# ---------------------------------------------------------------------------
# CrossAttention family: interleaved-frozen dynamics (round 4)
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_cross_family_train_dynamics_parity(rng):
    """4 optimizer steps of the CrossAttention family vs the reference
    composition with the reference cross trainer's OWN grouping
    (cross_attention_vqa_trainer.py:298-324) and its quirks replicated:

      * ViT embeddings + every interleaved ViT layer run under no_grad —
        gradients must stop at each frozen layer's OUTPUT while the
        trainable RoBERTa stream keeps flowing;
      * the shared ``layer_norm`` is in NO optimizer group (the reference
        forgot it) — its gradients COUNT toward the global clip norm
        (ref :466 clips model.parameters()) but it never updates;
      * clip over everything, AdamW(wd, amsgrad), HF linear warmup.
    """
    from t5_resnet_vqa_tpu.models.cross_attention_vqa import (
        CrossAttentionVitVQAModel)
    from t5_resnet_vqa_tpu.models.roberta import RobertaConfig
    from t5_resnet_vqa_tpu.models.vit import ViTConfig
    from test_cross_attention_parity import _hf_roberta, _hf_vit

    import dataclasses

    torch.manual_seed(0)
    vit_cfg = ViTConfig.tiny()
    # dropout 0 so train-mode math == the dropout-0 torch golden
    rob_cfg = dataclasses.replace(RobertaConfig.tiny(), dropout_rate=0.0)
    answers = 9
    hf_vit = _hf_vit(vit_cfg)
    hf_rob = _hf_roberta(rob_cfg)
    pooler_lin = torch.nn.Linear(vit_cfg.hidden_size, 1)
    cls_lin = torch.nn.Linear(vit_cfg.hidden_size, answers)
    shared_ln = torch.nn.LayerNorm(vit_cfg.hidden_size)
    num_layers = min(vit_cfg.num_layers, rob_cfg.num_layers)
    n_img = vit_cfg.num_patches + 1

    vit_sd = hf_vit.state_dict()
    rob_sd = hf_rob.state_dict()
    params_dict = {
        "vit_embeddings": tc.convert_vit_embeddings(vit_sd),
        "roberta_embeddings": tc.convert_roberta_embeddings(rob_sd),
        "layer_norm": tc.layernorm(shared_ln.state_dict(), ""),
        "attention_pooler": {
            "attention": tc.linear(pooler_lin.state_dict(), "")},
        "classification_layer": tc.linear(cls_lin.state_dict(), ""),
    }
    for i in range(num_layers):
        params_dict[f"roberta_layer_{i}"] = tc.convert_roberta_layer(
            rob_sd, f"encoder.layer.{i}")
        params_dict[f"vit_layer_{i}"] = tc.convert_vit_layer(
            vit_sd, f"encoder.layer.{i}")
    params = jax.tree.map(lambda v: jnp.asarray(np.array(v, copy=True)),
                          params_dict)
    initial_ln = jax.tree.map(np.asarray, params["layer_norm"])
    initial_vit = jax.tree.map(np.asarray, params["vit_layer_0"])

    def torch_forward(pix, ids, labels):
        with torch.no_grad():
            image_emb = hf_vit.embeddings(pix)
        text_emb = hf_rob.embeddings(input_ids=ids)
        concat_emb = torch.cat([image_emb, text_emb], dim=1)
        concat_hidden = concat_emb
        image_hidden = image_emb
        for i in range(num_layers):
            rob_h = hf_rob.encoder.layer[i](concat_hidden)[0]
            with torch.no_grad():
                image_hidden = hf_vit.encoder.layer[i](image_hidden)
                if isinstance(image_hidden, tuple):
                    image_hidden = image_hidden[0]
            concat_hidden = torch.cat(
                [rob_h[:, n_img:, :], image_hidden], dim=1)
            concat_hidden = shared_ln(concat_hidden + concat_emb)
        att = torch.softmax(pooler_lin(concat_hidden), dim=1).transpose(1, 2)
        pooled = torch.bmm(att, concat_hidden).squeeze(1)
        lp = torch.nn.functional.log_softmax(cls_lin(pooled), dim=-1)
        return torch.nn.NLLLoss()(lp, labels)

    B, L = 2, 10
    batches = []
    for i in range(4):
        pix = rng.standard_normal(
            (B, 3, vit_cfg.image_size, vit_cfg.image_size),
            dtype=np.float32)
        ids = rng.integers(2, rob_cfg.vocab_size, size=(B, L)).astype(
            np.int64)
        labels = rng.integers(0, answers, size=(B,)).astype(np.int64)
        batches.append((pix, ids, labels))

    # torch loop, reference grouping: layer_norm in NO group
    groups = [
        {"params": (list(hf_vit.embeddings.parameters())
                    + list(hf_vit.encoder.parameters())), "lr": VISION_LR},
        {"params": (list(hf_rob.embeddings.parameters())
                    + list(hf_rob.encoder.parameters())), "lr": LM_LR},
        {"params": list(pooler_lin.parameters()), "lr": CLS_LR},
        {"params": list(cls_lin.parameters()), "lr": CLS_LR},
    ]
    all_params = ([p for g in groups for p in g["params"]]
                  + list(shared_ln.parameters()))
    opt = torch.optim.AdamW(groups, weight_decay=WD, amsgrad=True)
    sched = transformers.get_linear_schedule_with_warmup(opt, WARMUP, 4)
    want_losses = []
    for pix, ids, labels in batches:
        opt.zero_grad()
        loss = torch_forward(torch.tensor(pix), torch.tensor(ids),
                             torch.tensor(labels))
        loss.backward()
        torch.nn.utils.clip_grad_norm_(all_params, 1.0)  # ln grads count
        opt.step()
        sched.step()
        want_losses.append(float(loss))

    # our side: production step; the never-trained layer_norm rides the
    # frozen label (update zeroed, gradient still in the clip norm)
    model = CrossAttentionVitVQAModel(
        answer_spaces=answers, vit_config=vit_cfg, roberta_config=rob_cfg)
    opt_cfg = OptimizerConfig(
        type="AdamW", vision_lr=VISION_LR, lm_encoder_lr=LM_LR,
        classifier_lr=CLS_LR, kwargs={"weight_decay": WD, "amsgrad": True})
    sched_cfg = LRSchedulerConfig(num_warmup_steps=WARMUP)
    group_map = {"vit_embeddings": "vision",
                 "roberta_embeddings": "lm_encoder",
                 "attention_pooler": "classifier",
                 "classification_layer": "classifier"}
    for i in range(num_layers):
        group_map[f"vit_layer_{i}"] = "vision"
        group_map[f"roberta_layer_{i}"] = "lm_encoder"
    tx, _, _ = build_optimizer(
        opt_cfg, sched_cfg, 4, gradient_clipping=1.0, group_map=group_map,
        frozen_modules=tuple(model.frozen_modules()) + ("layer_norm",))
    opt_state = tx.init(params)
    train_step = jax.jit(make_train_step(model, tx))

    got_losses = []
    key = jax.random.PRNGKey(0)
    for pix, ids, labels in batches:
        batch = dict(
            question_input_ids=jnp.asarray(ids, jnp.int32),
            pixel_values=jnp.asarray(pix.transpose(0, 2, 3, 1)),
            annotation_ids=jnp.asarray(labels, jnp.int32),
        )
        params, opt_state, loss, _ = train_step(params, opt_state, batch,
                                                key)
        got_losses.append(float(loss))

    np.testing.assert_allclose(got_losses, want_losses, rtol=3e-4, atol=3e-4)

    # frozen interleaved ViT layers: bitwise untouched
    for a, b in zip(jax.tree.leaves(initial_vit),
                    jax.tree.leaves(params["vit_layer_0"])):
        np.testing.assert_array_equal(a, np.asarray(b))
    # the reference's forgotten layer_norm: unchanged on BOTH sides
    np.testing.assert_array_equal(initial_ln["scale"],
                                  np.asarray(params["layer_norm"]["scale"]))
    np.testing.assert_array_equal(shared_ln.weight.detach().numpy(),
                                  np.asarray(params["layer_norm"]["scale"]))
    # trainable streams land where torch lands
    np.testing.assert_allclose(
        np.asarray(params["classification_layer"]["kernel"]),
        cls_lin.weight.detach().numpy().T, rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(params["roberta_layer_0"]["query"]["kernel"]),
        hf_rob.encoder.layer[0].attention.self.query.weight.detach(
        ).numpy().T, rtol=5e-3, atol=5e-4)

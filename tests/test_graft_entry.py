"""Driver-contract entry points (small pieces; the flagship compile check
runs on real hardware via the driver)."""

import numpy as np
import pytest

import jax


@pytest.mark.slow
def test_dryrun_multichip_on_virtual_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import __graft_entry__ as g
    g.dryrun_multichip(8)          # asserts internally (finite loss, TP spec)
    g.dryrun_multichip(4)


@pytest.mark.slow
def test_dryrun_multichip_bootstraps_subprocess():
    """Asking for more devices than visible must re-exec with virtual XLA
    host devices instead of crashing (the round-1 MULTICHIP gate failure:
    through the axon tunnel only 1 device is visible)."""
    import __graft_entry__ as g
    n = len(jax.devices()) * 2
    g.dryrun_multichip(n)   # raises on subprocess failure


def test_mesh_trainer_losses_match_single_device(tmp_path):
    """Same seed, same data: a dp4 x tp2 mesh run with steps_per_dispatch=3
    must reproduce the single-device per-epoch train/valid losses (sharded
    reductions reorder float sums, hence the 1e-4 tolerance). Also covers
    K>1 scan dispatch under a mesh (the round-1 K=1 restriction)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import json
    import os

    from t5_resnet_vqa_tpu.data import load_answer_spaces, make_synthetic_daquar
    from t5_resnet_vqa_tpu.parallel import make_mesh
    from t5_resnet_vqa_tpu.train import VQATrainer

    from t5_resnet_vqa_tpu.models.resnet_vqa import ResnetVQAModel
    from t5_resnet_vqa_tpu.models.t5 import T5Config
    from t5_resnet_vqa_tpu.ops import AttentionConfig

    from test_trainer import _tiny_config

    root, _ = make_synthetic_daquar(str(tmp_path / "d"), num_train=96,
                                    num_test=8, image_size=64)
    answers = load_answer_spaces(os.path.join(root, "answer_spaces.txt"))

    def model():
        # dropout 0: K=1 and K=3 dispatch shapes consume different dropout
        # key trees, so stochastic regularization can't be compared exactly
        hidden = 32
        return ResnetVQAModel(
            answer_spaces=len(answers), vision_model_name="resnet18",
            t5_config=T5Config(vocab_size=32128, d_model=hidden, d_kv=8,
                               d_ff=64, num_layers=1, num_decoder_layers=1,
                               num_heads=4, dropout_rate=0.0),
            sga_config=AttentionConfig(hidden_size=hidden, num_heads=4,
                                       ff_size=hidden, dropout_rate=0.0),
            num_attention_blocks=1)

    def run(out, mesh, k):
        cfg = _tiny_config(root, tmp_path / out, epochs=2)
        cfg.dataset.train_batch_size = 8
        cfg.dataset.test_batch_size = 8
        cfg.trainer.steps_per_dispatch = k
        trainer = VQATrainer(model(), cfg, answers, mesh=mesh)
        trainer.train()
        rows = [json.loads(l) for l in
                open(tmp_path / out / "metrics.jsonl")]
        train = [r["train_avg_loss"] for r in rows if "train_avg_loss" in r]
        valid = [r["valid_avg_loss"] for r in rows if "valid_avg_loss" in r]
        return train, valid

    t_single, v_single = run("single", None, 1)
    mesh = make_mesh(data_axis_size=4, model_axis_size=2)
    t_mesh, v_mesh = run("mesh", mesh, 3)

    assert len(t_single) == len(t_mesh) == 2
    np.testing.assert_allclose(t_mesh, t_single, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(v_mesh, v_single, rtol=2e-4, atol=2e-4)


def test_trainer_with_mesh(tmp_path):
    """VQATrainer end-to-end under a dp x tp mesh on virtual devices."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import os

    from t5_resnet_vqa_tpu.data import load_answer_spaces, make_synthetic_daquar
    from t5_resnet_vqa_tpu.parallel import make_mesh
    from t5_resnet_vqa_tpu.train import VQATrainer

    from test_trainer import _tiny_config, _tiny_model

    root, _ = make_synthetic_daquar(str(tmp_path / "d"), num_train=16,
                                    num_test=8, image_size=64)
    answers = load_answer_spaces(os.path.join(root, "answer_spaces.txt"))
    cfg = _tiny_config(root, tmp_path / "out", epochs=1)
    cfg.dataset.train_batch_size = 8   # divisible by the 4-way data axis
    cfg.dataset.test_batch_size = 8
    mesh = make_mesh(data_axis_size=4, model_axis_size=2)
    trainer = VQATrainer(_tiny_model(len(answers)), cfg, answers, mesh=mesh)
    trainer.train()
    assert trainer.last_valid_wups >= 0.0
    # TP spec survived the whole run
    from jax.sharding import PartitionSpec as P
    k = trainer.params["lang_model"]["block_0"]["self_attn"]["q"]["kernel"]
    assert k.sharding.spec == P(None, "model")

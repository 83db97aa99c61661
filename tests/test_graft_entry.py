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

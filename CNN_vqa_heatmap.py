"""CNN-family heatmap + test-set WUPS evaluation CLI.

Parity with /root/reference/CNN_vqa_heatmap.py (:319-348 __main__): recovers
the answer space from the checkpoint's model_ckpt_info.json (:326), loads the
best-model weights, runs test-set inference with channel-mean CAM overlays
routed into perfect/imperfect dirs, and prints the average test WUPS.
"""

import argparse
import json
import os

import jax

from t5_resnet_vqa_tpu.core import Config, select_device
from t5_resnet_vqa_tpu.data import (
    DaquarCnnCollate,
    DaquarDataset,
    DataLoader,
    DaquarVitCollate,
    get_tokenizer,
)
from t5_resnet_vqa_tpu.train import build_model
from t5_resnet_vqa_tpu.train.callbacks import CheckpointManager
from t5_resnet_vqa_tpu.viz import generate_heatmaps


def load_checkpointed_model(cfg: Config):
    """Build the model and restore best-model + answer spaces from the
    checkpoint dir (ref load_faster_rcnn_model/load_resnet_model :19-50)."""
    ckpt = CheckpointManager(cfg.trainer.output_dir)
    info = ckpt.read_json("model_ckpt_info.json")
    if info is None:
        raise FileNotFoundError(
            f"no model_ckpt_info.json under {cfg.trainer.output_dir} "
            "(train first; the answer space is part of the checkpoint "
            "contract)")
    answer_spaces = info["answer_spaces"]
    model, family = build_model(cfg.model, len(answer_spaces))
    params = ckpt.restore_tree("best-model")
    return model, params, answer_spaces, family


def main(mode: str = "cam"):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="vit_daquar_config.json")
    p.add_argument("--set", action="append", default=[], metavar="G.K=V")
    p.add_argument("--output-dir", default=None,
                   help="heatmap output dir (default <output_dir>/heatmaps)")
    p.add_argument("--top-k", type=int, default=1)
    p.add_argument("--batch-size", type=int, default=4)   # ref :341-343
    args = p.parse_args()

    cfg = Config.from_json(args.config, overrides=args.set)
    select_device(cfg.trainer.device)
    model, params, answer_spaces, family = load_checkpointed_model(cfg)

    dk = cfg.dataset
    dataset = DaquarDataset(dk.root_data_dir, dk.test_csv_file, dk.images_dir,
                            "test")
    # uint8 wire: models finalize on device; matches the reference's
    # uint8-resize + scale math exactly (data/preprocessing.py)
    tokenizer = (get_tokenizer(dk.language_model_tokenizer,
                               tokenizer_file=dk.tokenizer_file)
                 if dk.tokenizer_file else None)
    if mode == "cam":
        collate = DaquarCnnCollate(
            answer_spaces, dk.interpolation_strategy,
            resizing_dimensions=(dk.image_size, dk.image_size),
            lang_model=dk.language_model_tokenizer, eval_mode=True,
            tokenizer=tokenizer, emit_uint8=dk.uint8_wire_images)
    else:
        collate = DaquarVitCollate(
            answer_spaces, lang_model=dk.language_model_tokenizer,
            eval_mode=True, tokenizer=tokenizer,
            emit_uint8=dk.uint8_wire_images)
    loader = DataLoader(dataset, collate, args.batch_size,
                        drop_remainder=False)

    if mode == "cam":
        @jax.jit
        def _infer(batch):
            log_probs, _, features = model.apply(
                {"params": params}, **batch, deterministic=True,
                return_features=True)
            fmap = features["pool"] if "pool" in features else features["features"]
            return {"log_probs": log_probs, "features": fmap}
    else:
        @jax.jit
        def _infer(batch):
            log_probs, _, attentions = model.apply(
                {"params": params}, **batch, deterministic=True,
                return_attentions=True)
            return {"log_probs": log_probs, "attentions": attentions}

    out_dir = args.output_dir or os.path.join(cfg.trainer.output_dir,
                                              "heatmaps")
    generate_heatmaps(_infer, loader, answer_spaces, out_dir, mode=mode,
                      top_k=args.top_k)


if __name__ == "__main__":
    main("cam")

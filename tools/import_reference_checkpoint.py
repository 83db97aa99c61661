"""Import a trained reference (PyTorch) checkpoint into this framework.

A user of shiv-vignesh/T5-Resnet-VQA has ``best-model.pt`` (a
``model.state_dict()`` torch.save — reference callbacks.py:34-46) plus
``model_ckpt_info.json`` carrying the answer space. This tool converts that
into this framework's orbax checkpoint layout, after which every surface
(training resume, CNN_vqa_heatmap.py / ViT_vqa_heatmap.py evaluation, the
VQAInferenceSession serving API) works on the migrated weights.

Usage:
  python tools/import_reference_checkpoint.py \
      --config vit_daquar_config.json \
      --torch-checkpoint /path/to/best-model.pt \
      --ckpt-info /path/to/model_ckpt_info.json \
      [--output-dir OUT]   # default: config's trainer_kwargs.output_dir

Family dispatch follows the reference entry scripts' init_model
(train_faster_rcnn_vqa.py:9-49): ``model_kwargs.vision_model_name`` selects
resnet18/34/50, faster-rcnn, the ViT pipeline, or (with
language_model_name=roberta-base) the cross-attention variant.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def convert_state_dict(sd, model_cfg):
    from t5_resnet_vqa_tpu.train.factory import (CROSS_FAMILY, model_family)
    from t5_resnet_vqa_tpu.utils import torch_convert as tc

    name = model_cfg.vision_model_name
    blocks = model_cfg.num_attention_blocks
    if name in ("resnet18", "resnet34", "resnet50"):
        return tc.convert_resnet_vqa_checkpoint(sd, name,
                                                num_attention_blocks=blocks)
    if name == "faster-rcnn":
        return tc.convert_faster_rcnn_vqa_checkpoint(
            sd, num_attention_blocks=blocks)
    if model_family(model_cfg) == CROSS_FAMILY:
        return tc.convert_cross_attention_vqa_checkpoint(sd)
    return tc.convert_vit_vqa_checkpoint(sd)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True,
                   help="six-group JSON config (reference layout accepted)")
    p.add_argument("--torch-checkpoint", required=True,
                   help="reference best-model.pt / checkpoint-model.pt")
    p.add_argument("--ckpt-info", required=True,
                   help="reference model_ckpt_info.json (answer space)")
    p.add_argument("--output-dir", default=None)
    p.add_argument("--set", action="append", default=[], metavar="G.K=V")
    args = p.parse_args()

    import torch

    from t5_resnet_vqa_tpu.core import Config
    from t5_resnet_vqa_tpu.train.callbacks import CheckpointManager

    cfg = Config.from_json(args.config, overrides=args.set)
    out_dir = args.output_dir or cfg.trainer.output_dir

    def _resolved_scheme(cfg, answer_spaces):
        from t5_resnet_vqa_tpu.data import get_tokenizer
        tok = get_tokenizer(cfg.dataset.language_model_tokenizer,
                            tokenizer_file=cfg.dataset.tokenizer_file or None,
                            pinned_words=answer_spaces)
        return getattr(tok, "scheme", "unknown")

    info = json.load(open(args.ckpt_info))
    sd = torch.load(args.torch_checkpoint, map_location="cpu")
    if not isinstance(sd, dict) or not any(
            hasattr(v, "shape") for v in sd.values()):
        raise SystemExit("--torch-checkpoint is not a state_dict torch.save")

    params = convert_state_dict(sd, cfg.model)

    ckpt = CheckpointManager(out_dir)
    ckpt.save_tree("best-model", params)
    ckpt.write_json("model_ckpt_info.json", {
        "epoch": info.get("epoch", 0),
        "best_score": info.get("best_score", 0.0),
        "answer_spaces": info["answer_spaces"],
        # record the id layout this config resolves to (same resolution the
        # trainer/serving will perform), so a later run under a DIFFERENT
        # layout — e.g. importing with tokenizer_file then resuming under
        # the hash fallback — is refused instead of silently scrambling
        # token semantics
        "tokenizer_scheme": _resolved_scheme(cfg, info["answer_spaces"]),
    })
    # EarlyStopping resumes its best score from this manifest — without it,
    # continued training would treat the first (worse) validation as an
    # improvement and clobber the imported best-model
    ckpt.write_json("model-metrics.json",
                    {"best-score": info.get("best_score", 0.0)})
    n = sum(1 for _ in __import__("jax").tree_util.tree_leaves(params))
    print(f"imported {n} tensors -> {ckpt.output_dir} "
          f"({len(info['answer_spaces'])} answers)")


if __name__ == "__main__":
    main()

"""Export a checkpoint trained HERE into a REFERENCE-loadable best-model.pt.

The reverse of tools/import_reference_checkpoint.py — makes migration
bidirectional: a user can train on TPU with this framework and hand the
result back to a reference (PyTorch) deployment. The exported state dict
loads into the reference's own model classes with ``strict=True`` and
reproduces their logits (see utils/torch_export.py for inversion rules and
tests/test_reverse_migration.py for the proof against the reference code).

Writes, reference-callbacks style (reference callbacks.py:34-46):
  <out_dir>/best-model.pt           torch.save(state_dict)
  <out_dir>/model_ckpt_info.json    {epoch, best_score, answer_spaces}

Usage:
  python tools/export_reference_checkpoint.py --config cfg.json \
      [--checkpoint best-model] [--out-dir exported/] [--set k=v ...]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True,
                   help="six-group JSON config of the trained run")
    p.add_argument("--set", action="append", default=[],
                   metavar="GROUP.KEY=V")
    p.add_argument("--checkpoint", default="best-model",
                   help="which checkpoint to export (best-model / "
                        "checkpoint-model / final-model)")
    p.add_argument("--out-dir", default=None,
                   help="where best-model.pt lands (default: "
                        "<output_dir>/reference_export)")
    return p


def export_state_dict(params, model_cfg):
    """Dispatch the family-appropriate exporter from utils/torch_export."""
    from t5_resnet_vqa_tpu.train.factory import (
        CNN_FAMILY, CROSS_FAMILY, model_family)
    from t5_resnet_vqa_tpu.utils import torch_export as tx

    family = model_family(model_cfg)
    n_blocks = model_cfg.num_attention_blocks
    if family == CNN_FAMILY:
        if model_cfg.vision_model_name == "faster-rcnn":
            return tx.export_faster_rcnn_vqa_checkpoint(
                params, num_attention_blocks=n_blocks)
        return tx.export_resnet_vqa_checkpoint(
            params, model_cfg.vision_model_name,
            num_attention_blocks=n_blocks)
    if family == CROSS_FAMILY:
        return tx.export_cross_attention_vqa_checkpoint(params)
    return tx.export_vit_vqa_checkpoint(params)


def main():
    args = build_argparser().parse_args()

    # export is pure host work (Orbax read -> numpy -> torch.save); without
    # this, the restore places arrays on the default accelerator — pointless
    # for a conversion tool and a hard hang when the TPU tunnel is down
    import jax
    jax.config.update("jax_platforms", "cpu")

    import torch

    from t5_resnet_vqa_tpu.core import Config
    from t5_resnet_vqa_tpu.train.callbacks import CheckpointManager

    cfg = Config.from_json(args.config, overrides=args.set)
    ckpt = CheckpointManager(cfg.trainer.output_dir)
    info = ckpt.read_json("model_ckpt_info.json")
    if info is None:
        raise SystemExit(f"no model_ckpt_info.json under {ckpt.output_dir} "
                         "(train first)")
    params = ckpt.restore_tree(args.checkpoint)

    sd = export_state_dict(params, cfg.model)

    out_dir = args.out_dir or os.path.join(cfg.trainer.output_dir,
                                           "reference_export")
    os.makedirs(out_dir, exist_ok=True)
    torch.save(sd, os.path.join(out_dir, "best-model.pt"))
    with open(os.path.join(out_dir, "model_ckpt_info.json"), "w") as f:
        json.dump({"epoch": info.get("epoch", 0),
                   "best_score": info.get("best_score", 0.0),
                   "answer_spaces": info["answer_spaces"]}, f)
    print(f"exported {len(sd)} tensors -> {out_dir}/best-model.pt "
          f"({len(info['answer_spaces'])} answers)")


if __name__ == "__main__":
    main()

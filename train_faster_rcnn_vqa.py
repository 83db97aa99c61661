"""CNN-family training entry point (faster-rcnn / resnet18/34/50 towers).

Parity with /root/reference/train_faster_rcnn_vqa.py: loads the six-group
JSON config, reads the answer-space file, builds the model dispatched on
``model_kwargs.vision_model_name`` (ref init_model :9-49), auto-resumes from
the best checkpoint when present (ref :24-26), and runs the trainer.

Improvements over the reference: a real CLI (--config path instead of the
hardcoded ``vit_daquar_config.json``, dotted --set overrides) and optional
mesh parallelism (--data-parallel/--model-parallel).
"""

import argparse

from t5_resnet_vqa_tpu.core import Config, select_device
from t5_resnet_vqa_tpu.parallel import make_mesh
from t5_resnet_vqa_tpu.train import VQATrainer


def parse_args(default_vision: str = None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="vit_daquar_config.json",
                   help="six-group JSON config (reference layout accepted)")
    p.add_argument("--set", action="append", default=[], metavar="GROUP.KEY=V",
                   help="config override, e.g. trainer.epochs=3")
    p.add_argument("--data-parallel", type=int, default=0,
                   help="data-axis size (0 = no mesh, 1 chip)")
    p.add_argument("--model-parallel", type=int, default=1,
                   help="model(TP)-axis size")
    args = p.parse_args()
    cfg = Config.from_json(args.config, overrides=args.set)
    # honor the config's device field (the reference only logs it); must
    # happen before any computation is dispatched
    select_device(cfg.trainer.device)
    if default_vision and cfg.model.vision_model_name.startswith("google/"):
        # this entry point is the CNN family; config carries a ViT name only
        # when reusing the reference's single shared config file
        cfg.model.vision_model_name = default_vision
    mesh = None
    if args.data_parallel:
        mesh = make_mesh(args.data_parallel, args.model_parallel)
    return cfg, mesh


def main():
    cfg, mesh = parse_args(default_vision="resnet50")
    trainer = VQATrainer.from_config(cfg, mesh=mesh)
    trainer.train()


if __name__ == "__main__":
    main()

"""ViT + T5 encoder-decoder training entry point.

Parity with /root/reference/train_vit_vqa.py (which is import-broken as
shipped — its trainer imports a module that does not exist in the reference
repo, vit_vqa_trainer.py:10; SURVEY §2 C14 — fixed here by construction).
"""

from t5_resnet_vqa_tpu.train import VQATrainer

from train_faster_rcnn_vqa import parse_args


def main():
    cfg, mesh = parse_args()
    cfg.model.vision_model_name = "google/vit-base-patch16-224-in21k"
    trainer = VQATrainer.from_config(cfg, mesh=mesh)
    trainer.train()


if __name__ == "__main__":
    main()

"""Heatmap / attention visualization + test-set WUPS evaluation.

One harness replacing the reference's four near-identical loops
(CNN_vqa_heatmap.py generate_heatmaps/:89-200 + _topk/:203-316,
ViT_vqa_heatmap.py :62-193 + :203-335):

  * CNN/FPN family — channel-mean CAM over the backbone feature map
    ('pool' level for faster-rcnn, C5 otherwise), min-max normalized,
    resized to the source image, JET colormap, 0.5/0.9 weighted overlay
    (ref CNN :131-149).
  * ViT family — attention rollout: mean over heads per layer, +identity,
    row-normalize, recursive matmul across layers, CLS row -> 14x14 grid
    mask scaled onto the image then JET (ref ViT :104-143).

Each sample is routed to perfect_match_predictions/ or
imperfect_match_predictions/ by WUPS == 1.0 (any-of-top-k when k > 1) with
heatmap_*.png, original_*.png and a predictions.json; the harness returns the
test-set average WUPS (ref :190-200).
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, List, Optional

import numpy as np

from ..eval.wups import wup_measure

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


# ---------------------------------------------------------------------------
# math
# ---------------------------------------------------------------------------

def compute_cam(features: np.ndarray) -> np.ndarray:
    """[H, W, C] (NHWC) feature map -> [H, W] channel-mean CAM, min-max
    normalized (ref CNN :135-137 does the same on [C, H, W])."""
    cam = features.mean(axis=-1)
    rng = cam.max() - cam.min()
    return (cam - cam.min()) / (rng if rng > 0 else 1.0)


def attention_rollout(att_layers: np.ndarray) -> np.ndarray:
    """[L, H, S, S] per-layer attention -> [S, S] joint attention
    (ref ViT :116-130: mean heads, +I, row-normalize, chain matmul)."""
    att = att_layers.mean(axis=1)                       # [L, S, S]
    S = att.shape[-1]
    aug = att + np.eye(S, dtype=att.dtype)
    aug = aug / aug.sum(axis=-1, keepdims=True)
    joint = aug[0]
    for n in range(1, aug.shape[0]):
        joint = aug[n] @ joint
    return joint


def rollout_mask(att_layers: np.ndarray) -> np.ndarray:
    """CLS-row attention over patches -> [g, g] grid (ref ViT :132-138)."""
    joint = attention_rollout(att_layers)
    g = int(np.sqrt(joint.shape[-1] - 1))
    return joint[0, 1:].reshape(g, g)


def overlay_cam(image_bgr: np.ndarray, cam: np.ndarray) -> np.ndarray:
    """JET overlay, weights 0.5 / 0.9 (ref CNN :141-149)."""
    heat = cv2.resize(cam.astype(np.float32),
                      (image_bgr.shape[1], image_bgr.shape[0]))
    heat = np.uint8(255 * heat)
    heat = cv2.applyColorMap(heat, cv2.COLORMAP_JET)
    return cv2.addWeighted(image_bgr, 0.5, heat, 0.9, 0)


def overlay_rollout(image_bgr: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Mask-scaled image then JET (ref ViT :139-143)."""
    m = cv2.resize(mask / max(mask.max(), 1e-12),
                   (image_bgr.shape[1], image_bgr.shape[0]))[..., np.newaxis]
    return cv2.applyColorMap((m * image_bgr).astype("uint8"),
                             cv2.COLORMAP_JET)


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------

def generate_heatmaps(
    infer_fn: Callable[[dict], Dict[str, np.ndarray]],
    dataloader,
    answer_spaces: List[str],
    output_dir: str,
    mode: str = "cam",            # "cam" | "rollout"
    top_k: int = 1,
) -> float:
    """Run test-set inference + visualization.

    ``infer_fn(device_batch)`` must return {"log_probs": [B, A]} plus either
    "features" ([B, h, w, C] NHWC map) for mode="cam" or "attentions"
    ([L, B, H, S, S]) for mode="rollout" — i.e. the model's
    ``return_features=True`` / ``return_attentions=True`` outputs.
    Returns the average test WUPS (also printed, ref :190-200).
    """
    os.makedirs(output_dir, exist_ok=True)
    perfect_dir = os.path.join(output_dir, "perfect_match_predictions")
    imperfect_dir = os.path.join(output_dir, "imperfect_match_predictions")
    os.makedirs(perfect_dir, exist_ok=True)
    os.makedirs(imperfect_dir, exist_ok=True)

    all_predictions: List[int] = []
    all_targets: List[int] = []

    for idx, batch in enumerate(dataloader):
        valid = int(batch.get("_valid", len(batch["annotation_ids"])))
        questions = batch["questions"][:valid]
        image_fns = batch["image_fns"][:valid]
        annotation_ids = np.asarray(batch["annotation_ids"])[:valid]

        device_batch = {k: v for k, v in batch.items()
                        if k not in ("answers", "questions", "image_fns",
                                     "annotation_ids")
                        and not k.startswith("_")}
        out = infer_fn(device_batch)
        log_probs = np.asarray(out["log_probs"])[:valid]
        # ref convert_logits_to_predictions[_topk] :75-87
        order = np.argsort(-log_probs, axis=-1)
        topk = order[:, :top_k]
        preds = order[:, 0]
        all_predictions.extend(preds.tolist())
        all_targets.extend(annotation_ids.tolist())

        for b in range(valid):
            image = cv2.imread(image_fns[b])
            if mode == "cam":
                cam = compute_cam(np.asarray(out["features"])[b])
                overlay = overlay_cam(image, cam)
            else:
                att = np.asarray(out["attentions"])[:, b]     # [L, H, S, S]
                overlay = overlay_rollout(image, rollout_mask(att))

            target_text = answer_spaces[int(annotation_ids[b])]
            hit_text = None
            for p in topk[b]:
                if wup_measure(answer_spaces[int(p)], target_text) == 1.0:
                    hit_text = answer_spaces[int(p)]
                    break

            base = perfect_dir if hit_text is not None else imperfect_dir
            sample_dir = os.path.join(base, f"{idx}_{b}_heatmap_predictions")
            os.makedirs(sample_dir, exist_ok=True)
            cv2.imwrite(os.path.join(sample_dir, f"heatmap_{idx}_{b}.png"),
                        overlay)
            cv2.imwrite(os.path.join(sample_dir, f"original_{idx}_{b}.png"),
                        image)
            record = {
                "question": questions[b].question_text,
                "predicted_answer": answer_spaces[int(preds[b])],
                "target_answer": target_text,
                "wups_score": wup_measure(answer_spaces[int(preds[b])],
                                          target_text),
            }
            if top_k > 1:
                record["topk_predictions"] = [answer_spaces[int(p)]
                                              for p in topk[b]]
                record["topk_hit"] = hit_text
            with open(os.path.join(sample_dir, "predictions.json"), "w") as f:
                json.dump(record, f)

    scores = [wup_measure(answer_spaces[p], answer_spaces[t])
              for p, t in zip(all_predictions, all_targets)]
    avg = sum(scores) / len(scores) if scores else 0.0
    print(f"Average Test WUPS Score: {avg:.4f}")
    return avg

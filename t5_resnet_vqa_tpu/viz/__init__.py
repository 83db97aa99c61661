from .heatmap import (
    attention_rollout,
    compute_cam,
    generate_heatmaps,
    overlay_cam,
    overlay_rollout,
    rollout_mask,
)

__all__ = [
    "compute_cam", "attention_rollout", "rollout_mask",
    "overlay_cam", "overlay_rollout", "generate_heatmaps",
]

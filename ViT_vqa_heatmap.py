"""ViT-family attention-rollout heatmap + test-set WUPS evaluation CLI.

Parity with /root/reference/ViT_vqa_heatmap.py (:338-359): same harness as
the CNN CLI but visualizing ViT attention rollout (stacked per-layer
attention maps, head-mean, +identity, row-normalize, recursive matmul,
CLS row -> 14x14 grid; ref :104-143).
"""

from CNN_vqa_heatmap import main

if __name__ == "__main__":
    main("rollout")

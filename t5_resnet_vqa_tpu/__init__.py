"""t5_resnet_vqa_tpu — a TPU-native JAX/XLA/Pallas VQA framework.

A ground-up rebuild of the capabilities of the shiv-vignesh/T5-Resnet-VQA
reference stack (DAQUAR VQA: ResNet/Faster-RCNN/ViT vision towers fused with
T5/RoBERTa language towers), redesigned for TPU:

- All compute paths are jit-compiled, shape-static XLA programs.
- Hot fusion ops (the SGA cross-attention stack) have fused Pallas TPU kernels
  with jnp fallbacks (``t5_resnet_vqa_tpu.ops.pallas``).
- Scaling is expressed through ``jax.sharding`` meshes (data/model axes) rather
  than per-device loops (``t5_resnet_vqa_tpu.parallel``).
- Host-side work (image decode/resize, tokenization, WUPS scoring) lives in a
  prefetching input pipeline overlapped with device compute
  (``t5_resnet_vqa_tpu.data``), with an optional native C++ fast path.

Layer map (mirrors SURVEY.md §7):
    core/      config, constants, logging, rng
    ops/       single-implementation fusion ops (SGA, MHA, pooler) + Pallas kernels
    models/    ResNet, FPN, T5, ViT, RoBERTa towers and the 4 VQA model families
    data/      DAQUAR dataset, collates, tokenizers, prefetching loader
    train/     unified trainer, optax param-group optimizer, callbacks, checkpoints
    eval/      WUPS metric, predictions, ROUGE
    viz/       CAM + attention-rollout heatmaps
    parallel/  mesh + sharding rules (dp/tp)
    utils/     torch->jax weight conversion, time formatting
"""

__version__ = "0.1.0"

"""Config system.

The reference consumes one JSON file with six kwarg groups and no validation
(/root/reference/vit_daquar_config.json:1-67, consumed positionally by the
trainer constructors, train_vit_vqa.py:43-47). This module keeps the same six
groups and key names so a reference config file loads unchanged, and adds the
things the reference lacks: typed dataclasses, defaults, validation, and
dotted-path CLI overrides (``--set trainer_kwargs.epochs=3``).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple


def _filter_kwargs(cls, d: Dict[str, Any]) -> Dict[str, Any]:
    """Keep only keys the dataclass knows; '_description' etc. are dropped."""
    names = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in d.items() if k in names}


@dataclass
class ModelConfig:
    """model_kwargs group (vit_daquar_config.json:2-7)."""
    vision_model_name: str = "resnet50"
    language_model_name: str = "t5-base"
    device: str = "tpu"                  # accepted for parity; jax picks devices
    num_attention_blocks: int = 3        # SGA depth (resnet_vqa_model.py:38)
    fine_tune_lm_encoder: bool = True
    fine_tune_lm_decoder: bool = True
    fine_tune_vision: bool = False       # backbones run frozen in the reference
    compute_dtype: str = "float32"       # "bfloat16" for the fast path
    use_pallas: bool = False             # fused Pallas SGA attention kernels
    # single concat-kernel q/k/v matmuls in every T5 attention — bit-exact,
    # same param tree (checkpoints interchangeable); measured within tunnel
    # noise on this chip (benchmarks/bench_t5_encoder.py), so default off
    fused_qkv: bool = False
    # completes the reference's declared-but-dead calibration intent
    # (resnet_vqa_model.py:44 "Implement temperature scaling", :99
    # temperature_scaler=1.5, :155 commented): logits/T before softmax.
    # 1.0 = off (reference effective behavior); the reference's declared
    # value is 1.5
    temperature_scaler: float = 1.0

    VISION_CHOICES = (
        "resnet18", "resnet34", "resnet50", "faster-rcnn",
        "google/vit-base-patch16-224-in21k",
    )

    def validate(self) -> None:
        if self.vision_model_name not in self.VISION_CHOICES:
            raise ValueError(
                f"vision_model_name={self.vision_model_name!r} not in "
                f"{self.VISION_CHOICES}"
            )
        if self.compute_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"bad compute_dtype {self.compute_dtype!r}")


@dataclass
class DatasetConfig:
    """dataset_kwargs group (vit_daquar_config.json:8-17)."""
    root_data_dir: str = "DAQUAR_dataset"
    train_csv_file: str = "train.csv"
    test_csv_file: str = "test.csv"
    answer_spaces_file: str = "answer_spaces.txt"
    images_dir: str = "images"
    image_preprocessor_model: str = "google/vit-base-patch16-224-in21k"
    language_model_tokenizer: str = "t5-base"
    # path to a user-supplied HF tokenizer.json (e.g. t5-base's): real
    # sentencepiece-equivalent ids offline — REQUIRED for imported reference
    # checkpoints to see the vocabulary their embeddings were trained on
    tokenizer_file: str = ""
    train_batch_size: int = 4
    test_batch_size: int = 16
    interpolation_strategy: str = "bilinear_interpolation"
    image_size: int = 256               # CNN-family resize target (ref 256^2)
    num_prefetch_batches: int = 2
    num_workers: int = 0
    use_native_preprocessor: bool = True  # C++ resize/pack fast path if built
    drop_remainder: bool = True           # static shapes: pad/drop last batch
    # ship uint8 images over host->device and fuse the /255 (+normalize)
    # into the model's first device op: 4x less H2D traffic, identical math
    uint8_wire_images: bool = True
    # shrink the static question/decoder tokenization lengths to the
    # dataset's true max token count (capped at the reference's 16/20).
    # Applied ONLY where trailing pad columns provably cannot reach the
    # output — the ViT family (token-0 read + causal last-non-pad read);
    # the CNN/cross families consume pad rows unmasked (reference SGA /
    # RoBERTa-layer calls pass no masks), so their pad compute is
    # load-bearing semantics and stays. Pad compute is ~39% of T5-encoder
    # fwd+bwd when questions fit in half the buffer
    # (benchmarks/bench_t5_encoder.py). Train-time only; eval CLIs/serving
    # keep the fixed reference lengths.
    adaptive_question_len: bool = True
    # 0 (off, reference-exact), 2 or 4: decode images at 1/2 / 1/4 scale
    # (cv2.IMREAD_REDUCED_COLOR_* — DCT-scaled for JPEG) before the resize.
    # OPT-IN like uint8_wire_images: pixels differ slightly from
    # full-decode-then-resize; measured parity delta + host-decode speedup
    # in benchmarks/serving.md
    reduced_decode: int = 0
    # "daquar" (csv, default) or "okvqa" — the reference DECLARED the OK-VQA
    # path (trainer/vit_vqa_trainer.py:10 imports it; dataset at
    # dataset_utils/dataset.py:43-207) but shipped it broken; here it
    # trains for real through data/okvqa.py's COCO-style loader with the
    # 10-annotator-answer grid feeding the fresh-answer-per-epoch rule.
    dataset_type: str = "daquar"
    # OK-VQA file layout (reference _init_dataloader dataset_kwargs names,
    # vit_vqa_trainer.py:267-276, split into questions/annotations JSONs)
    train_questions_json_fn: str = "OpenEnded_mscoco_train2014_questions.json"
    train_annotations_json_fn: str = "mscoco_train2014_annotations.json"
    test_questions_json_fn: str = "OpenEnded_mscoco_val2014_questions.json"
    test_annotations_json_fn: str = "mscoco_val2014_annotations.json"
    train_images_dir: str = "train2014"
    test_images_dir: str = "val2014"

    def validate(self) -> None:
        from . import constants
        if self.interpolation_strategy not in constants.INTERPOLATION_STRATEGIES:
            raise ValueError(
                f"interpolation_strategy={self.interpolation_strategy!r}"
            )
        if self.train_batch_size <= 0 or self.test_batch_size <= 0:
            raise ValueError("batch sizes must be positive")
        if self.dataset_type not in ("daquar", "okvqa"):
            raise ValueError(f"dataset_type={self.dataset_type!r} "
                             f"(expected 'daquar' or 'okvqa')")
        if self.reduced_decode not in (0, 2, 4):
            raise ValueError(f"reduced_decode={self.reduced_decode!r} "
                             f"(expected 0, 2 or 4)")


@dataclass
class TrainerConfig:
    """trainer_kwargs group (vit_daquar_config.json:19-35)."""
    epochs: int = 60
    monitor_train: bool = True
    monitor_val: bool = True
    monitor_test: bool = True
    device: str = "tpu"
    gradient_clipping: float = 1.0
    output_dir: str = "output"
    load_from_checkpoint: bool = False
    is_training: bool = True
    use_cache: bool = False
    first_val_epoch: int = 0
    metric_eval_mode: str = "strict"
    metric_average_mode: str = "macro"
    mxp_training: bool = False           # bfloat16 compute when True
    loss_combination_strategy: str = "dynamic_weighted"
    seed: int = 0
    log_every_fraction: float = 0.1      # 10%-interval step logs like the ref
    trace_dir: str = ""                  # capture a jax.profiler trace here
    # steps-per-loop: run K optimizer steps per host dispatch (lax.scan over
    # K stacked batches). Amortizes per-dispatch host/runtime latency — the
    # standard TPU training pattern; 1 == reference-like per-step dispatch.
    # Default 4 on measurement: sustained epoch wall 4.85s -> 1.28s at K=8
    # on a tunneled chip (benchmarks/train_step.md "Sustained trainer
    # throughput"); identical losses vs K=1 are test-pinned
    # (tests/test_trainer.py). Tiny runs (<10 batches/epoch) always use
    # per-step dispatch regardless, matching the reference's logging.
    steps_per_dispatch: int = 4
    # crash recovery: additionally write checkpoint-model +
    # state_dict_checkpoint every N optimizer steps (0 = epoch-end only,
    # the reference's cadence). A mid-epoch crash then loses at most N
    # steps of optimizer state on resume.
    checkpoint_every_steps: int = 0
    # HBM budget (MiB) for device snapshots pinned by PENDING background
    # checkpoint saves; submission drains the oldest in-flight save before
    # snapshotting past it. 0 = CheckpointManager default (4 GiB). Raise on
    # big-HBM chips to overlap more saves; lower if training OOMs.
    checkpoint_snapshot_budget_mb: int = 0
    # bound on how many epochs the DURABLE crash-recovery point may trail
    # training. Background pair saves coalesce under backpressure (a slow
    # tunnel makes a save take minutes while epochs take seconds), which
    # lets the on-disk checkpoint fall arbitrarily far behind — the round-4
    # ViT 60-epoch soak silently replayed 3 epochs after a crash. After the
    # epoch-E save is submitted, if more than this many epoch checkpoints
    # are still unlanded the trainer blocks until the queue drains (logged).
    # 0 = every epoch checkpoint is synchronous-durable before the next
    # epoch starts; -1 = unbounded (the old behavior).
    max_checkpoint_lag_epochs: int = 2
    # also compute ROUGE-1/2/L over validation predictions (the reference
    # implements compute_rouge_metric but never calls it live, ref :489-513;
    # here the hook is wired behind this flag)
    compute_rouge: bool = False
    # experiment tracking: metrics always stream to <output_dir>/metrics.jsonl;
    # with use_wandb=True AND the wandb package importable, the same records
    # also drive wandb.init/log/finish (the reference's tracking surface,
    # faster_rcnn_vqa_trainer.py:34-43). Offline-by-default divergence stays.
    use_wandb: bool = False
    wandb_project: str = "t5-resnet-vqa-tpu"
    # dropout mask RNG: True uses JAX's "rbg" PRNG (TPU hardware RNG) for
    # the dropout key stream on TPU — measured ~7ms/step cheaper than
    # threefry at B=128 on v5e. Mask *bits* differ from threefry but the
    # Bernoulli(keep_prob) statistics are identical; param-init RNG stays
    # threefry either way.
    fast_dropout_rng: bool = True
    # precompute the frozen vision tower's features once per unique image
    # and train every epoch without the tower (train/feature_cache.py).
    # Exact math — the tower is gradient-isolated and the collates are
    # deterministic per image — measured -34% step time on the flagship.
    # Auto-disabled when the model fine-tunes vision, exposes no
    # compute_vision_features, or the cache would exceed ~6GB; mesh runs
    # keep the cache host-resident so gathers ride the sharded batch path.
    cache_frozen_features: bool = True

    def validate(self) -> None:
        if self.epochs <= 0:
            raise ValueError("epochs must be positive")
        if self.gradient_clipping is not None and self.gradient_clipping < 0:
            raise ValueError("gradient_clipping must be >= 0")
        if self.steps_per_dispatch < 1:
            raise ValueError("steps_per_dispatch must be >= 1")
        if self.checkpoint_every_steps < 0:
            raise ValueError("checkpoint_every_steps must be >= 0")
        if self.max_checkpoint_lag_epochs < -1:
            raise ValueError("max_checkpoint_lag_epochs must be >= -1")


@dataclass
class OptimizerConfig:
    """optimizer_kwargs group (vit_daquar_config.json:37-49).

    Per-module learning rates mirror the reference's optimizer param groups
    (faster_rcnn_vqa_trainer.py:231-267): vision_lr, lm_encoder_lr, the
    hardcoded 5e-4 for scale/SGA/pooler modules, classifier_lr.
    """
    type: str = "AdamW"
    default_lr: float = 5e-5
    lm_encoder_lr: float = 5e-3
    lm_decoder_lr: float = 1e-4
    vision_lr: float = 8e-3
    classifier_lr: float = 1e-5
    fusion_lr: float = 5e-4              # scale conv / SGA / pooler groups
    kwargs: Dict[str, Any] = field(
        default_factory=lambda: {"weight_decay": 0.1, "amsgrad": True}
    )

    def validate(self) -> None:
        if self.type not in ("AdamW", "Adam", "SGD", "Lamb", "Adafactor"):
            raise ValueError(f"unsupported optimizer type {self.type!r}")


@dataclass
class LRSchedulerConfig:
    """lr_scheduler_kwargs group (vit_daquar_config.json:51-57).

    Linear warmup + linear decay; warmup = min(num_warmup_steps or total/10,
    max_warmup_steps) exactly as faster_rcnn_vqa_trainer.py:109-111.
    """
    num_warmup_steps: int = -1
    num_training_steps: int = -1
    max_warmup_steps: int = 10000
    increase_batch_size_on_plateau: bool = False

    def resolve_warmup(self, total_steps: int) -> int:
        warmup = (
            self.num_warmup_steps
            if self.num_warmup_steps != -1
            else total_steps // 10
        )
        return min(warmup, self.max_warmup_steps)

    def validate(self) -> None:
        if self.max_warmup_steps < 0:
            raise ValueError("max_warmup_steps must be >= 0")


@dataclass
class CallbacksConfig:
    """callbacks_kwargs group (vit_daquar_config.json:58-66).

    Unlike the reference — which configures patience/threshold but never calls
    EarlyStopping.__call__ (SURVEY.md C15) — this framework honors them.
    """
    save_final_model: bool = False
    patience: int = 3
    mode: str = "max"
    threshold: float = 0.005

    def validate(self) -> None:
        if self.mode not in ("max", "min"):
            raise ValueError(f"mode must be max|min, got {self.mode!r}")
        if self.patience < 1:
            raise ValueError("patience must be >= 1")


@dataclass
class ParallelConfig:
    """TPU-native addition: mesh layout. Absent in the reference (SURVEY §2:

    no torch.distributed anywhere); here data/model axes over ICI."""
    data_axis_size: int = -1             # -1: all remaining devices
    model_axis_size: int = 1

    def validate(self) -> None:
        if self.model_axis_size < 1:
            raise ValueError("model_axis_size must be >= 1")


_GROUP_MAP = {
    "model_kwargs": ("model", ModelConfig),
    "dataset_kwargs": ("dataset", DatasetConfig),
    "trainer_kwargs": ("trainer", TrainerConfig),
    "optimizer_kwargs": ("optimizer", OptimizerConfig),
    "lr_scheduler_kwargs": ("lr_scheduler", LRSchedulerConfig),
    "callbacks_kwargs": ("callbacks", CallbacksConfig),
    "parallel_kwargs": ("parallel", ParallelConfig),
}


@dataclass
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    trainer: TrainerConfig = field(default_factory=TrainerConfig)
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    lr_scheduler: LRSchedulerConfig = field(default_factory=LRSchedulerConfig)
    callbacks: CallbacksConfig = field(default_factory=CallbacksConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)

    def validate(self) -> "Config":
        for f in dataclasses.fields(self):
            getattr(self, f.name).validate()
        return self

    # -- loading ------------------------------------------------------------

    @classmethod
    def from_dict(cls, raw: Dict[str, Any]) -> "Config":
        """Build from a reference-style dict of the six kwarg groups.

        The reference nests EarlyStopping args one level deeper
        (callbacks_kwargs.kwargs — vit_daquar_config.json:59-66); both layouts
        are accepted.
        """
        init: Dict[str, Any] = {}
        for group_key, (attr, group_cls) in _GROUP_MAP.items():
            group_raw = dict(raw.get(group_key, {}))
            if group_key == "callbacks_kwargs" and "kwargs" in group_raw:
                inner = group_raw.pop("kwargs")
                group_raw.update(inner)
            init[attr] = group_cls(**_filter_kwargs(group_cls, group_raw))
        return cls(**init).validate()

    @classmethod
    def from_json(cls, path: str, overrides: Optional[List[str]] = None) -> "Config":
        with open(path) as f:
            raw = json.load(f)
        cfg = cls.from_dict(raw)
        for ov in overrides or []:
            cfg.apply_override(ov)
        return cfg.validate()

    # -- overrides ------------------------------------------------------------

    def apply_override(self, assignment: str) -> None:
        """Apply ``group.key=value``; value parsed as JSON, else string.

        Accepts both framework attr names (``trainer.epochs``) and reference
        group names (``trainer_kwargs.epochs``).
        """
        if "=" not in assignment:
            raise ValueError(f"override {assignment!r} must be key=value")
        path, value_str = assignment.split("=", 1)
        parts = path.strip().split(".")
        if len(parts) != 2:
            raise ValueError(f"override path {path!r} must be group.key")
        group_name, key = parts
        for gk, (attr, _) in _GROUP_MAP.items():
            if group_name in (gk, attr):
                group_name = attr
                break
        group = getattr(self, group_name, None)
        if group is None or not hasattr(group, key):
            raise ValueError(f"unknown config field {path!r}")
        try:
            value = json.loads(value_str)
        except json.JSONDecodeError:
            value = value_str
        setattr(group, key, value)

    def to_dict(self) -> Dict[str, Any]:
        """Dump back in the reference six-group layout."""
        out = {}
        for group_key, (attr, _) in _GROUP_MAP.items():
            out[group_key] = dataclasses.asdict(getattr(self, attr))
        return out

    # -- convenience ----------------------------------------------------------

    def param_table(self) -> List[Tuple[str, str]]:
        rows = []
        for group_key, (attr, _) in _GROUP_MAP.items():
            for k, v in dataclasses.asdict(getattr(self, attr)).items():
                rows.append((f"{group_key}.{k}", str(v)))
        return rows

"""Batch collates: raw DAQUAR samples -> fixed-shape numpy device feeds.

Parity targets:
  * CNN path  — DaquarFasterRcnnT5CollateFn
    (resnet_vqa_daquar_dataset.py:92-231): cv2 decode -> BGR2RGB -> resize
    256^2 (bilinear/lanczos/bicubic switch) -> ToTensor ONLY (scale to [0,1],
    deliberately unnormalized, ref :134-138) ; question "[Question] {q}"
    padded to 16; decoder text "+ [Answer]" padded to 20; answers padded to
    20; label = randomly chosen answer's index in the answer space.
  * ViT path  — DaquarVitT5CollateFn (vit_vqa_daquar_dataset.py:89-202):
    images via the ViT image processor (224^2, rescale 1/255, normalize
    mean=std=0.5); OOV answers fall back to the 'O' class (ref :149-153).

Documented divergences (SURVEY §7):
  * the CNN path gains the ViT path's OOV->'O' guard (the reference crashes
    on OOV answers there, ref :183);
  * ViT-path questions are padded to the static QUESTION_MAX_LEN=16 instead
    of "longest" (TPU static shapes);
  * label sampling uses a seeded numpy Generator instead of the global
    ``random`` module: every __call__ still draws fresh answers (the
    reference's fresh-answer-every-epoch behavior, ref :178-189) but the
    stream is reproducible from the seed.

Outputs are NHWC float32; all arrays are numpy (the prefetcher moves them to
device asynchronously).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from ..core import constants
from .daquar import Sample
from .preprocessing import load_and_resize_image, load_image_batch
from .tokenizer import get_tokenizer


class DaquarCollateBase:
    def __init__(
        self,
        answer_spaces: Sequence[str],
        lang_model: str = "t5-base",
        eval_mode: bool = False,
        seed: int = 0,
        tokenizer=None,
    ):
        self.answer_spaces = [a.strip("\n") for a in answer_spaces]
        self._answer_index = {a: i for i, a in enumerate(self.answer_spaces)}
        self.eval_mode = eval_mode
        # answer-space words get collision-free ids in the hash fallback
        self.tokenizer = tokenizer or get_tokenizer(
            lang_model, pinned_words=self.answer_spaces)
        # static tokenization lengths. The trainer may LOWER these to the
        # dataset's true max token count (adaptive_question_len): trailing
        # all-pad columns are masked out of every attention/pool op, so
        # trimming them is exact math — it only shrinks the compiled
        # shapes (~39% of encoder fwd+bwd time at S=16 is pad compute when
        # real questions fit in 8 tokens; benchmarks/bench_t5_encoder.py)
        self.question_max_len = constants.QUESTION_MAX_LEN
        self.decoder_max_len = constants.MAX_LEN
        self.rng = np.random.default_rng(seed)
        # OOV fallback class (ViT-path reference behavior, :149-153)
        self._oov_index = self._answer_index.get("O", 0)
        # False when the trainer's frozen-feature cache is active: image
        # decode/resize is skipped entirely and batches carry no image
        # array (the cached tower features ride in instead)
        self.emit_images = True

    # -- shared text/label handling ----------------------------------------

    def _labels(self, samples: Sequence[Sample]):
        """Pick one answer per sample (fresh each call, like the reference's
        per-epoch random.choice, ref :178-189) and map to class ids."""
        chosen: List[str] = []
        ids = np.empty(len(samples), np.int32)
        for i, s in enumerate(samples):
            answers = s.annotation.answers
            a = answers[int(self.rng.integers(len(answers)))]
            chosen.append(a)
            ids[i] = self._answer_index.get(a, self._oov_index)
        return ids, chosen

    def _text_feeds(self, samples: Sequence[Sample], chosen: List[str]):
        q_texts = [f"{constants.QUESTION_SPECIAL_TOKEN} "
                   f"{s.question.question_text}" for s in samples]
        d_texts = [f"{constants.QUESTION_SPECIAL_TOKEN} "
                   f"{s.question.question_text} "
                   f"{constants.ANSWER_SPECIAL_TOKEN}" for s in samples]
        q_ids, q_mask = self.tokenizer(q_texts, self.question_max_len)
        d_ids, d_mask = self.tokenizer(d_texts, self.decoder_max_len)
        a_ids, a_mask = self.tokenizer(chosen, constants.MAX_LEN)
        return q_ids, q_mask, d_ids, d_mask, a_ids, a_mask

    def _assemble(self, samples, images_key, images):
        annotation_ids, chosen = self._labels(samples)
        q_ids, q_mask, d_ids, d_mask, a_ids, a_mask = self._text_feeds(
            samples, chosen)
        batch: Dict[str, np.ndarray] = {
            "question_input_ids": q_ids,
            "decoder_question_input_ids": d_ids,
            "question_attention_masks": q_mask,
            "decoder_question_attention_masks": d_mask,
            "annotation_ids": annotation_ids,
            "answer_input_ids": a_ids,
            "answer_attention_masks": a_mask,
        }
        if images is not None:
            batch[images_key] = images
        if self.eval_mode:
            batch["answers"] = [s.annotation.answers for s in samples]
            batch["questions"] = [s.question for s in samples]
            batch["image_fns"] = [s.image_path for s in samples]
        return batch


class DaquarCnnCollate(DaquarCollateBase):
    """CNN-family collate (reference DaquarFasterRcnnT5CollateFn)."""

    def __init__(self, answer_spaces: Sequence[str],
                 interpolation_strategy: str = "bilinear_interpolation",
                 resizing_dimensions=(constants.CNN_IMAGE_SIZE,
                                      constants.CNN_IMAGE_SIZE),
                 lang_model: str = "t5-base", eval_mode: bool = False,
                 seed: int = 0, tokenizer=None, use_native: bool = True,
                 emit_uint8: bool = False, reduced_decode: int = 0,
                 num_workers: int = 0):
        super().__init__(answer_spaces, lang_model, eval_mode, seed, tokenizer)
        self.interpolation_strategy = interpolation_strategy
        self.resizing_dimensions = tuple(resizing_dimensions)
        self.use_native = use_native
        self.emit_uint8 = emit_uint8
        self.reduced_decode = reduced_decode
        self.num_workers = num_workers

    def load_images(self, paths: Sequence[str]) -> np.ndarray:
        """The collate's exact image pipeline for a list of paths —
        [B, H, W, 3] float32 in [0,1], unnormalized (ToTensor-only parity);
        emit_uint8 ships resized uint8 and the model divides by 255 on
        device — bit-identical to the reference's uint8-resize + ToTensor
        path, 4x less H2D (see preprocessing.load_image_batch precision
        note). Also used by the frozen-feature cache precompute."""
        return load_image_batch(
            list(paths), self.resizing_dimensions,
            self.interpolation_strategy, normalize=None,
            use_native=self.use_native, emit_uint8=self.emit_uint8,
            reduce=self.reduced_decode, workers=self.num_workers)

    def __call__(self, samples: Sequence[Sample]) -> Dict[str, np.ndarray]:
        images = (self.load_images([s.image_path for s in samples])
                  if self.emit_images else None)
        return self._assemble(samples, "image_tensors", images)


class DaquarVitCollate(DaquarCollateBase):
    """ViT-family collate (reference DaquarVitT5CollateFn): 224^2 pixel
    values rescaled 1/255 then normalized mean=std=0.5 (the in21k ViT image
    processor's configuration)."""

    VIT_MEAN = constants.VIT_IMAGE_MEAN
    VIT_STD = constants.VIT_IMAGE_STD

    def __init__(self, answer_spaces: Sequence[str],
                 lang_model: str = "t5-base", eval_mode: bool = False,
                 seed: int = 0, tokenizer=None, use_native: bool = True,
                 emit_uint8: bool = False, reduced_decode: int = 0,
                 num_workers: int = 0):
        super().__init__(answer_spaces, lang_model, eval_mode, seed, tokenizer)
        self.use_native = use_native
        self.emit_uint8 = emit_uint8
        self.reduced_decode = reduced_decode
        self.num_workers = num_workers

    def load_images(self, paths: Sequence[str]) -> np.ndarray:
        # emit_uint8 defers the rescale+normalize to the model's first
        # device op (models/image_input.py) — 4x less H2D; same fp32 math as
        # the host path on the same uint8-resized pixels
        return load_image_batch(
            list(paths),
            (constants.VIT_IMAGE_SIZE, constants.VIT_IMAGE_SIZE),
            "bilinear_interpolation",
            normalize=(self.VIT_MEAN, self.VIT_STD),
            use_native=self.use_native, emit_uint8=self.emit_uint8,
            reduce=self.reduced_decode, workers=self.num_workers)

    def __call__(self, samples: Sequence[Sample]) -> Dict[str, np.ndarray]:
        images = (self.load_images([s.image_path for s in samples])
                  if self.emit_images else None)
        return self._assemble(samples, "pixel_values", images)

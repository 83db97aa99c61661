"""Host-side image preprocessing: decode -> RGB -> resize -> scale/normalize.

Parity with the reference collate's cv2 path
(resnet_vqa_daquar_dataset.py:153-171): cv2.imread (BGR) -> cvtColor RGB ->
cv2.resize with the configured interpolation -> float tensor in [0,1]
(torchvision ToTensor). Output layout is NHWC (TPU-native) instead of the
reference's NCHW.

A native C++ fast path (native/preproc.cpp, loaded via ctypes) fuses the
resize + uint8->float32 scale + optional normalize per image; it is bit-exact
with the cv2 bilinear path for the default strategy and is used when built
and ``use_native=True``. cv2 remains the fallback and the only path for
lanczos/bicubic.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

try:
    import cv2
    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False

_CV2_INTERP = {
    "bilinear_interpolation": 1,   # cv2.INTER_LINEAR
    "lanczos_interpolation": 4,    # cv2.INTER_LANCZOS4
    "bicubic_interpolation": 2,    # cv2.INTER_CUBIC
}


def _native_lib():
    from ..native import loader
    return loader.get_lib()


def decode_image(path: str, reduce: int = 0) -> np.ndarray:
    """File -> RGB uint8 HWC array.

    ``reduce`` in {2, 4} decodes at 1/2 / 1/4 scale
    (cv2.IMREAD_REDUCED_COLOR_*): for JPEG this is libjpeg's DCT-scaled
    decode (skips most of the IDCT work); for PNG it decodes full rows but
    skips the full-size buffer + the later large-source resize. OPT-IN
    (dataset_kwargs.reduced_decode): the downstream resize then starts from
    the reduced image, so pixels differ slightly from the reference's
    full-decode-then-resize — parity delta measured in
    benchmarks/serving.md."""
    if _HAS_CV2:
        flag = (getattr(cv2, f"IMREAD_REDUCED_COLOR_{reduce}")
                if reduce in (2, 4) else cv2.IMREAD_COLOR)
        arr = cv2.imread(path, flag)
        if arr is None:
            raise FileNotFoundError(f"cannot decode image: {path}")
        return cv2.cvtColor(arr, cv2.COLOR_BGR2RGB)
    from PIL import Image  # pragma: no cover
    return np.asarray(Image.open(path).convert("RGB"))


def load_and_resize_image(
    path: str,
    size: Tuple[int, int],
    interpolation_strategy: str = "bilinear_interpolation",
    reduce: int = 0,
) -> np.ndarray:
    """-> resized RGB uint8 [H, W, 3]."""
    img = decode_image(path, reduce=reduce)
    w, h = size
    if _HAS_CV2:
        return cv2.resize(img, (w, h),
                          interpolation=_CV2_INTERP[interpolation_strategy])
    from PIL import Image  # pragma: no cover
    return np.asarray(Image.fromarray(img).resize((w, h)))


def finalize_image(
    img_u8: np.ndarray,
    normalize: Optional[Tuple[Sequence[float], Sequence[float]]] = None,
) -> np.ndarray:
    """uint8 [H, W, 3] -> float32 [H, W, 3] in [0,1], optionally normalized."""
    out = img_u8.astype(np.float32) / 255.0
    if normalize is not None:
        mean, std = normalize
        out = (out - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    return out


def load_image_batch(
    paths: Sequence[str],
    size: Tuple[int, int],
    interpolation_strategy: str = "bilinear_interpolation",
    normalize: Optional[Tuple[Sequence[float], Sequence[float]]] = None,
    use_native: bool = True,
    emit_uint8: bool = False,
    reduce: int = 0,
    workers: int = 0,
) -> np.ndarray:
    """-> [B, H, W, 3] float32 NHWC batch, or resized uint8 when
    ``emit_uint8`` (scale/normalize then happen as the model's first device
    op — 4x less host->device traffic).

    Precision note: the uint8 path resizes with cv2 in uint8 and therefore
    matches the REFERENCE's own pipeline (cv2.resize preserves dtype, then
    ToTensor /255 — resnet_vqa_daquar_dataset.py:153-171) bit for bit. The
    fp32 paths keep the resample's fractional precision instead — native
    (use_native) and cv2-python fp32 agree with the uint8 path within one
    uint8 LSB. ``use_native`` is ignored under ``emit_uint8``: a fused
    resize+scale pass has nothing to fuse when the scale runs on device,
    and cv2's SIMD uint8 resize is the fastest host option."""
    w, h = size

    # workers > 1: thread-pool the per-image decode(+resize). Image decode
    # is 96% of the serving host path at real frame geometry
    # (benchmarks/serving.md) and cv2 releases the GIL inside
    # imread/resize, so this scales near-linearly with cores on multi-core
    # hosts (this image has 1 core — dataset_kwargs.num_workers, which the
    # reference accepts for its torch DataLoader but runs at 0, stays 0 by
    # default).
    def _map(fn, items):
        if workers and workers > 1 and len(items) > 1:
            import concurrent.futures
            with concurrent.futures.ThreadPoolExecutor(
                    min(workers, len(items))) as pool:
                return list(pool.map(fn, items))
        return [fn(p) for p in items]

    if emit_uint8:
        resized = _map(lambda p: load_and_resize_image(
            p, size, interpolation_strategy, reduce=reduce), list(paths))
        out = np.empty((len(paths), h, w, 3), np.uint8)
        for i, r in enumerate(resized):
            out[i] = r
        return out

    decoded = _map(lambda p: decode_image(p, reduce=reduce), list(paths))

    if use_native and interpolation_strategy == "bilinear_interpolation":
        try:
            lib = _native_lib()
            if lib is not None:
                return lib.resize_scale_batch(decoded, (h, w), normalize)
        except Exception:
            pass  # fall back to cv2

    out = np.empty((len(paths), h, w, 3), np.float32)
    for i, img in enumerate(decoded):
        if _HAS_CV2:
            resized = cv2.resize(
                img, (w, h), interpolation=_CV2_INTERP[interpolation_strategy])
        else:  # pragma: no cover
            from PIL import Image
            resized = np.asarray(Image.fromarray(img).resize((w, h)))
        out[i] = finalize_image(resized, normalize)
    return out

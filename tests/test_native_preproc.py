"""Native C++ preprocessing vs the cv2 golden path.

The .so is built by ``make -C t5_resnet_vqa_tpu/native``; tests skip when it
hasn't been built. Agreement bound: cv2 INTER_LINEAR uses fixed-point
arithmetic, the native kernel fp32 — within 1 uint8 LSB (1/255) per pixel.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from t5_resnet_vqa_tpu.native import loader


@pytest.fixture(scope="module")
def lib():
    l = loader.get_lib()
    if l is None:
        pytest.skip("libvqapreproc.so not built")
    return l


@pytest.mark.parametrize("src_hw,dst_hw", [
    ((480, 640), (256, 256)),
    ((100, 80), (224, 224)),     # upscale
    ((256, 256), (256, 256)),    # identity size
])
def test_native_matches_cv2_bilinear(lib, rng, src_hw, dst_hw):
    img = rng.integers(0, 256, size=(*src_hw, 3), dtype=np.uint8)
    want = cv2.resize(img, (dst_hw[1], dst_hw[0]),
                      interpolation=cv2.INTER_LINEAR).astype(np.float32) / 255.0
    got = lib.resize_scale_batch([img], dst_hw, None)[0]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1.5 / 255.0)


def test_native_normalize(lib, rng):
    img = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
    mean, std = (0.5, 0.5, 0.5), (0.5, 0.5, 0.5)
    got = lib.resize_scale_batch([img], (32, 32), (mean, std))[0]
    base = lib.resize_scale_batch([img], (32, 32), None)[0]
    np.testing.assert_allclose(got, (base - 0.5) / 0.5, atol=1e-6)
    assert got.min() >= -1.0 - 1e-6 and got.max() <= 1.0 + 1e-6


def test_collate_uses_native_path_consistently(lib, tmp_path, rng):
    """CNN collate via native vs cv2 fallback agree within 1 LSB."""
    from t5_resnet_vqa_tpu.data import (DaquarCnnCollate, DaquarDataset,
                                        load_answer_spaces,
                                        make_synthetic_daquar)
    root, _ = make_synthetic_daquar(str(tmp_path), num_train=4, num_test=2,
                                    image_size=100)
    answers = load_answer_spaces(f"{root}/answer_spaces.txt")
    ds = DaquarDataset(root, "train.csv", "images", "train")
    samples = [ds[i] for i in range(4)]
    b_native = DaquarCnnCollate(answers, resizing_dimensions=(64, 64),
                                seed=0, use_native=True)(samples)
    b_cv2 = DaquarCnnCollate(answers, resizing_dimensions=(64, 64),
                             seed=0, use_native=False)(samples)
    np.testing.assert_allclose(b_native["image_tensors"],
                               b_cv2["image_tensors"], atol=1.5 / 255.0)

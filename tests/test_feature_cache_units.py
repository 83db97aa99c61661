"""Unit coverage for the feature-cache plumbing (no model forward):
collect_image_slots single-pass slot assignment and CachedFeatureLoader's
gather wiring, including the padded final batch (drop_remainder=False
repeats row 0's sample AND its `_indices` entry)."""

import numpy as np
import jax.numpy as jnp

from t5_resnet_vqa_tpu.data.pipeline import DataLoader
from t5_resnet_vqa_tpu.train.feature_cache import (CachedFeatureLoader,
                                                   FrozenFeatureCache,
                                                   collect_image_slots)


class _Row:
    def __init__(self, path):
        self.image_path = path


class _DS:
    """Rows sharing images (DAQUAR shape: many QA pairs per image)."""

    def __init__(self, paths):
        self.paths = paths

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, i):
        return _Row(self.paths[i])


def test_collect_image_slots_dedupes_across_datasets():
    train = _DS(["a", "b", "a", "c", "b"])
    test = _DS(["c", "d"])
    paths, (rt, rte) = collect_image_slots([train, test])
    assert paths == ["a", "b", "c", "d"]
    assert rt.tolist() == [0, 1, 0, 2, 1]
    assert rte.tolist() == [2, 3]


def test_cached_loader_gathers_padded_final_batch():
    paths = ["img0", "img1", "img2"]
    ds = _DS(["img0", "img1", "img2", "img1", "img0"])  # 5 rows, batch 2
    feats = jnp.arange(3 * 4, dtype=jnp.float32).reshape(3, 4)
    cache = FrozenFeatureCache(feats, {p: i for i, p in enumerate(paths)})

    def collate(samples):
        # image-less collate (emit_images=False shape): text feeds only
        return {"annotation_ids": np.zeros(len(samples), np.int32)}

    loader = DataLoader(ds, collate, batch_size=2, shuffle=False,
                        drop_remainder=False)
    _, (rows,) = collect_image_slots([ds])
    wrapped = CachedFeatureLoader(loader, cache, rows)

    batches = list(wrapped)
    assert len(batches) == 3
    for b in batches:
        assert b["vision_features"].shape == (2, 4)
    host_feats = np.asarray(feats)
    # final partial batch: row 4 (img0) + pad repeat of row 4
    np.testing.assert_array_equal(np.asarray(batches[-1]["vision_features"]),
                                  host_feats[[0, 0]])
    assert int(batches[-1]["_valid"]) == 1
    # row->slot mapping respected in a full batch: rows 2,3 -> img2, img1
    np.testing.assert_array_equal(np.asarray(batches[1]["vision_features"]),
                                  host_feats[[2, 1]])

"""PatchPipeline tests: decode formats, crop/batch shapes, value range,
decoded-image cache (tf_boilerplate.py:19-35 capability)."""

import numpy as np
import pytest
from PIL import Image

from nic_tpu.train.data import PatchPipeline


@pytest.fixture
def corpus(tmp_path):
    rng = np.random.default_rng(0)
    imgs = {}
    for i in range(3):
        arr = rng.integers(0, 256, (40, 48, 3), dtype=np.uint8)
        Image.fromarray(arr).save(tmp_path / f"img{i}.png")
        imgs[f"img{i}.png"] = arr
    np.save(tmp_path / "float.npy", rng.random((40, 48, 3)).astype(np.float32))
    np.save(
        tmp_path / "u8.npy", rng.integers(0, 256, (40, 48, 3), dtype=np.uint8)
    )
    # Too small for the patch: must be skipped, not crash.
    Image.fromarray(rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)).save(
        tmp_path / "tiny.png"
    )
    return tmp_path, imgs


def test_batches_shape_and_range(corpus):
    tmp_path, _ = corpus
    pipe = PatchPipeline(str(tmp_path / "*"), batchsize=4, patchsize=32,
                         num_threads=2, prefetch=4)
    try:
        for _ in range(3):
            b = next(pipe)
            assert b.shape == (4, 32, 32, 3)
            assert b.dtype == np.uint8  # trainer normalizes on device
    finally:
        pipe.close()


def test_full_size_patch_matches_source_pixels(corpus):
    tmp_path, imgs = corpus
    # patch = full height; crops can only slide horizontally.
    pipe = PatchPipeline(str(tmp_path / "img0.png"), batchsize=1, patchsize=40,
                         num_threads=1, prefetch=2)
    try:
        b = next(pipe)
        src = imgs["img0.png"]
        # The 40x40 crop must appear in the 40x48 source at some column.
        found = any(
            np.allclose(b[0], src[:, j : j + 40]) for j in range(48 - 40 + 1)
        )
        assert found
    finally:
        pipe.close()


def test_cache_populates_and_is_uint8(corpus):
    tmp_path, _ = corpus
    pipe = PatchPipeline(str(tmp_path / "img*.png"), batchsize=2, patchsize=32,
                         num_threads=1, prefetch=2)
    try:
        for _ in range(8):
            next(pipe)
        assert len(pipe._cache) >= 1
        assert all(v.dtype == np.uint8 for v in pipe._cache.values())
    finally:
        pipe.close()


def test_cache_budget_zero_disables_caching(corpus):
    tmp_path, _ = corpus
    pipe = PatchPipeline(str(tmp_path / "img*.png"), batchsize=2, patchsize=32,
                         num_threads=1, prefetch=2, cache_bytes=0)
    try:
        next(pipe)
        assert len(pipe._cache) == 0
    finally:
        pipe.close()


def test_empty_glob_raises(tmp_path):
    with pytest.raises(RuntimeError, match="No training images"):
        PatchPipeline(str(tmp_path / "nothing*"), batchsize=1, patchsize=8)

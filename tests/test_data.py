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


# --------------------------------------------------------------- DeviceDataset


class TestDeviceDataset:
    def test_sample_shapes_and_content(self, corpus):
        from nic_tpu.train.data import DeviceDataset

        tmp_path, imgs = corpus
        ds = DeviceDataset(
            str(tmp_path / "img*.png"), batchsize=2, patchsize=16, seed=0
        )
        assert ds.num_images == 3
        out = np.asarray(ds.sample(4))
        assert out.shape == (4, 2, 16, 16, 3)
        assert out.dtype == np.uint8
        # Every crop must be a real window of one of the source images.
        stack = np.stack([imgs[f"img{i}.png"] for i in range(3)])
        patch = out[0, 0]
        found = any(
            np.array_equal(stack[n, y : y + 16, x : x + 16], patch)
            for n in range(3)
            for y in range(stack.shape[1] - 15)
            for x in range(stack.shape[2] - 15)
        )
        assert found

    def test_successive_samples_differ(self, corpus):
        from nic_tpu.train.data import DeviceDataset

        tmp_path, _ = corpus
        ds = DeviceDataset(
            str(tmp_path / "img*.png"), batchsize=2, patchsize=16, seed=0
        )
        a, b = np.asarray(ds.sample(2)), np.asarray(ds.sample(2))
        assert not np.array_equal(a, b)

    def test_mixed_sizes_rejected(self, corpus, tmp_path):
        from PIL import Image

        from nic_tpu.train.data import DeviceDataset

        src, _ = corpus
        rng = np.random.default_rng(1)
        Image.fromarray(
            rng.integers(0, 256, (40, 48, 3), dtype=np.uint8)
        ).save(tmp_path / "a.png")
        Image.fromarray(
            rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        ).save(tmp_path / "b.png")
        with pytest.raises(ValueError, match="uniformly-sized"):
            DeviceDataset(str(tmp_path / "*.png"), batchsize=2, patchsize=16)

    def test_trainer_fit_on_device_data(self, tmp_path):
        from PIL import Image

        from nic_tpu.train.data import DeviceDataset
        from nic_tpu.train.trainer import TrainConfig, Trainer

        rng = np.random.default_rng(0)
        for i in range(2):
            Image.fromarray(
                rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
            ).save(tmp_path / f"t{i}.png")
        cfg = TrainConfig(
            model="mbt2018",
            num_filters=4,
            batchsize=2,
            patchsize=64,
            last_step=3,
            steps_per_call=2,
            checkpoint_dir=str(tmp_path / "ckpt"),
            log_every=1,
            save_checkpoint_secs=10_000,
            num_devices=1,
        )
        trainer = Trainer(cfg)
        ds = DeviceDataset(
            str(tmp_path / "t*.png"), batchsize=2, patchsize=64,
            mesh=trainer.mesh,
        )
        state = trainer.fit(ds, verbose=False)
        assert int(state.step) == 3

    def test_sharded_sample_layout(self, corpus):
        import jax

        from nic_tpu.parallel.mesh import data_mesh
        from nic_tpu.train.data import DeviceDataset

        tmp_path, _ = corpus
        mesh = data_mesh()
        ds = DeviceDataset(
            str(tmp_path / "img*.png"), batchsize=8, patchsize=16, mesh=mesh
        )
        out = ds.sample(2)
        assert len(out.sharding.device_set) == mesh.size

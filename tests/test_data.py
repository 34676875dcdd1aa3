"""Data pipeline tests: trigger set, transforms, imagenet train step."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepipr_tpu.data import CyclingIterator, prepare_wm
from deepipr_tpu.data.datasets import IMAGENET_MEAN, IMAGENET_STD, normalize


@pytest.fixture(scope="module")
def trigger_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("ts") / "trigger_set"
    subprocess.run(
        [sys.executable, "tools/make_trigger_set.py", "--out", str(out),
         "--num", "10"],
        check=True,
    )
    return str(out)


class TestTriggerSet:
    def test_prepare_wm_batches(self, trigger_dir):
        dl = prepare_wm(os.path.join(trigger_dir, "pics"), crop=32)
        batches = list(dl)
        assert len(batches) == 5  # 10 images, batch 2, drop_last
        assert batches[0]["image"].shape == (2, 32, 32, 3)

    def test_cycling_iterator_wraps(self, trigger_dir):
        dl = prepare_wm(os.path.join(trigger_dir, "pics"), crop=32)
        it = CyclingIterator(dl)
        for _ in range(12):  # more than one epoch of 5 batches
            b = it.next()
            assert b["image"].shape[0] == 2

    def test_missing_trigger_set_raises(self):
        with pytest.raises(FileNotFoundError, match="WatermarkNN"):
            prepare_wm("/nonexistent/pics")

    def test_numeric_filename_order_pairs_labels(self, tmp_path):
        """WatermarkNN ships 1.jpg..N.jpg (not zero-padded): lexicographic
        order would pair image 10 with label line 2. Pixel value encodes the
        image index; every image must get label == index."""
        from PIL import Image

        root = tmp_path / "trigger_set"
        pics = root / "pics"
        pics.mkdir(parents=True)
        n = 12
        for i in range(1, n + 1):
            arr = np.full((32, 32, 3), i, np.uint8)
            Image.fromarray(arr).save(pics / f"{i}.png")
        (root / "labels-cifar.txt").write_text(
            "\n".join(str(i) for i in range(1, n + 1)) + "\n")

        dl = prepare_wm(str(pics), crop=32, shuffle=False)
        for batch in dl:
            # images are normalized; recover the index from the raw mean
            raw = batch["image"] * np.asarray(IMAGENET_STD) + np.asarray(
                IMAGENET_MEAN)
            idx = np.round(raw.mean(axis=(1, 2, 3)) * 255).astype(int)
            np.testing.assert_array_equal(idx, batch["label"])

    def test_more_images_than_labels_raises(self, tmp_path):
        from PIL import Image

        root = tmp_path / "trigger_set"
        pics = root / "pics"
        pics.mkdir(parents=True)
        for i in range(4):
            Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(
                pics / f"{i}.png")
        (root / "labels-cifar.txt").write_text("0\n1\n")
        with pytest.raises(ValueError, match="mismatch"):
            prepare_wm(str(pics), crop=32)


class TestTransforms:
    def test_normalize_imagenet_stats(self):
        x = np.full((1, 4, 4, 3), 255, np.uint8)
        y = normalize(x)
        np.testing.assert_allclose(
            y[0, 0, 0], (1.0 - IMAGENET_MEAN) / IMAGENET_STD, rtol=1e-6
        )


class TestImagenetModel:
    def test_imagenet_alexnet_train_step_with_dropout(self):
        """Dropout rng is supplied by the train step (imagenet classifier)."""
        from deepipr_tpu.models import AlexNet
        from deepipr_tpu.train import TrainState, make_train_step, sgd_optimizer

        model = AlexNet(num_classes=10, imagenet=True)
        rngs = {"params": jax.random.key(0), "passport": jax.random.key(1),
                "dropout": jax.random.key(2)}
        x = jnp.zeros((2, 64, 64, 3))
        v = model.init(rngs, x, train=True)
        state = TrainState.create(v, sgd_optimizer(0.01))
        step = make_train_step(model, private=False)
        state, m = step(state, {"image": x, "label": jnp.zeros(2, jnp.int32)})
        assert np.isfinite(float(m["loss"]))

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

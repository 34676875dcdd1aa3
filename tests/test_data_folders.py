"""ImageFolder + Caltech split tests on a synthesized image directory."""

import os

import numpy as np
import pytest
from PIL import Image

from deepipr_tpu.data.datasets import load_caltech, load_image_folder


@pytest.fixture(scope="module")
def image_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    for cls in ["aardvark", "bobcat", "cheetah"]:
        d = root / cls
        d.mkdir()
        for i in range(10):
            arr = rng.integers(0, 256, (40 + i, 48, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{i}.png")
    return str(root)


class TestImageFolder:
    def test_classes_sorted_and_sized(self, image_root):
        x, y, classes = load_image_folder(image_root, size=32, center_crop=False)
        assert classes == ["aardvark", "bobcat", "cheetah"]
        assert x.shape == (30, 32, 32, 3)
        assert x.dtype == np.uint8
        np.testing.assert_array_equal(np.unique(y), [0, 1, 2])

    def test_center_crop_path(self, image_root):
        x, _, _ = load_image_folder(image_root, size=32, center_crop=True)
        assert x.shape == (30, 32, 32, 3)


class TestCaltech:
    def test_80_20_per_class_split(self, image_root):
        tx, ty, vx, vy = load_caltech(image_root, num_classes=3, size=32)
        assert len(tx) == 24 and len(vx) == 6  # 8/2 per class
        for c in range(3):
            assert (ty == c).sum() == 8
            assert (vy == c).sum() == 2
        # no example leaks between splits
        t_hashes = {a.tobytes() for a in tx}
        assert all(a.tobytes() not in t_hashes for a in vx)

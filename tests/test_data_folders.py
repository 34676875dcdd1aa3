"""ImageFolder + Caltech split tests on a synthesized image directory."""

import os

import numpy as np
import pytest
import PIL.Image
from PIL import Image

from deepipr_tpu.data.datasets import (
    StreamingImageFolder,
    load_caltech,
    load_image_folder,
    prepare_dataset,
)


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


@pytest.fixture
def decode_counter(monkeypatch):
    """Counts PIL file decodes (the expensive op the streaming loader bounds)."""
    calls = {"n": 0}
    orig = PIL.Image.open

    def counting_open(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(PIL.Image, "open", counting_open)
    return calls


class TestStreamingImageFolder:
    def test_construction_decodes_nothing(self, image_root, decode_counter):
        dl = StreamingImageFolder(image_root, batch_size=4, size=32,
                                  resize_ratio=1.0)
        assert decode_counter["n"] == 0
        assert dl.num_examples == 30
        assert dl.classes == ["aardvark", "bobcat", "cheetah"]

    def test_batches_decode_O_batch(self, image_root, decode_counter):
        dl = StreamingImageFolder(image_root, batch_size=4, size=32,
                                  resize_ratio=1.0, workers=2)
        it = iter(dl)
        b = next(it)
        assert decode_counter["n"] == 4  # exactly one decode per example
        assert b["image"].shape == (4, 32, 32, 3)
        assert b["image"].dtype == np.float32
        total = b["label"].shape[0] + sum(x["label"].shape[0] for x in it)
        assert total == 30

    def test_train_mode_shapes_and_determinism(self, image_root):
        a = StreamingImageFolder(image_root, batch_size=8, size=32, train=True,
                                 shuffle=True, drop_last=True, seed=3,
                                 resize_ratio=1.0, workers=2)
        b = StreamingImageFolder(image_root, batch_size=8, size=32, train=True,
                                 shuffle=True, drop_last=True, seed=3,
                                 resize_ratio=1.0, workers=2)
        for ba, bb in zip(a, b):
            assert ba["image"].shape == (8, 32, 32, 3)
            np.testing.assert_array_equal(ba["image"], bb["image"])
            np.testing.assert_array_equal(ba["label"], bb["label"])

    def test_resized_uint8_cache_skips_decode(self, image_root, tmp_path,
                                              decode_counter):
        cache = str(tmp_path / "cache")
        dl = StreamingImageFolder(image_root, batch_size=8, size=32,
                                  resize_ratio=1.0, cache_dir=cache, workers=2)
        first = [b["image"].copy() for b in dl]
        assert decode_counter["n"] == 30
        second = [b["image"] for b in dl]
        assert decode_counter["n"] == 30  # epoch 2 served from the cache
        for x, y in zip(first, second):
            np.testing.assert_array_equal(x, y)

    def test_prepare_dataset_imagenet_streams(self, image_root, tmp_path):
        base = tmp_path / "ILSVRC2012"
        base.mkdir()
        for split in ("train", "val"):
            (base / split).symlink_to(image_root)
        args = {"dataset": "imagenet1000", "batch_size": 4,
                "data_root": str(tmp_path), "tl_dataset": "synthetic"}
        train, test = prepare_dataset(args)
        assert isinstance(train, StreamingImageFolder)
        assert isinstance(test, StreamingImageFolder)
        assert train.train and train.shuffle and train.drop_last
        b = next(iter(test))
        assert b["image"].shape[1:] == (224, 224, 3)

    def test_raw_ships_uint8_same_pixels(self, image_root):
        """raw=True must yield the exact uint8 crops the f32 path normalizes
        (the device-side normalize is the only moved work)."""
        from deepipr_tpu.data.datasets import normalize

        kw = dict(batch_size=8, size=32, train=True, shuffle=True,
                  drop_last=True, seed=3, resize_ratio=1.0, workers=2)
        f32 = StreamingImageFolder(image_root, **kw)
        u8 = StreamingImageFolder(image_root, raw=True, **kw)
        for bf, bu in zip(f32, u8):
            assert bu["image"].dtype == np.uint8
            np.testing.assert_allclose(normalize(bu["image"]), bf["image"],
                                       rtol=0, atol=1e-6)
            np.testing.assert_array_equal(bf["label"], bu["label"])

    def test_prepare_dataset_imagenet_device_augment_raw(self, image_root,
                                                         tmp_path):
        base = tmp_path / "ILSVRC2012"
        base.mkdir()
        for split in ("train", "val"):
            (base / split).symlink_to(image_root)
        args = {"dataset": "imagenet1000", "batch_size": 4,
                "data_root": str(tmp_path), "tl_dataset": "synthetic",
                "device_augment": True}
        train, test = prepare_dataset(args)
        assert train.raw  # uint8 to the chip; normalize moves on-device
        assert not test.raw  # eval batches stay host-normalized f32
        assert next(iter(train))["image"].dtype == np.uint8


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


class TestMultiHostSharding:
    """num_shards/shard_id: disjoint strided slices of a commonly-seeded
    permutation — the per-process view of multi-host data parallelism."""

    def test_shards_partition_each_epoch(self, image_root):
        def labels_for(shard_id):
            dl = StreamingImageFolder(
                image_root, batch_size=5, size=32, train=True, shuffle=True,
                seed=9, resize_ratio=1.0, workers=2,
                num_shards=2, shard_id=shard_id,
            )
            assert dl.num_examples == 15
            assert len(dl) == 3
            return np.concatenate([b["label"] for b in dl])

        l0, l1 = labels_for(0), labels_for(1)
        assert len(l0) == len(l1) == 15
        # the union of the two shards covers the full per-class label counts
        combined = np.sort(np.concatenate([l0, l1]))
        np.testing.assert_array_equal(combined, np.sort(np.repeat([0, 1, 2], 10)))

    def test_bad_shard_id_raises(self, image_root):
        with pytest.raises(ValueError):
            StreamingImageFolder(image_root, batch_size=5, num_shards=2,
                                 shard_id=2)


class TestAcquire:
    """Archive extraction + gated download (reference dataset.py:14-139)."""

    @staticmethod
    def _make_archive(dest_dir, foldername="101_ObjectCategories", gz=True,
                      classes=("ant", "bee"), n=6):
        """Build a tiny Caltech-shaped tarball at dest_dir/<filename>."""
        import tarfile

        rng = np.random.default_rng(1)
        src = dest_dir / "_src"
        for cls in classes:
            d = src / foldername / cls
            d.mkdir(parents=True)
            for i in range(n):
                arr = rng.integers(0, 256, (36, 42, 3), dtype=np.uint8)
                Image.fromarray(arr).save(d / f"image_{i:04d}.jpg")
        fname = foldername + (".tar.gz" if gz else ".tar")
        fpath = dest_dir / fname
        with tarfile.open(fpath, "w:gz" if gz else "w") as tar:
            tar.add(src / foldername, arcname=foldername)
        import shutil

        shutil.rmtree(src)
        return fpath

    def test_prepare_archive_extracts_tarball(self, tmp_path):
        from deepipr_tpu.data.acquire import ARCHIVES, prepare_archive

        root = tmp_path / "caltech-101"
        root.mkdir()
        self._make_archive(root)
        folder = prepare_archive(str(root), "caltech-101")
        assert folder == str(root / ARCHIVES["caltech-101"].foldername)
        assert sorted(os.listdir(folder)) == ["ant", "bee"]
        # idempotent: second call returns the extracted tree directly
        assert prepare_archive(str(root), "caltech-101") == folder

    def test_prepare_dataset_from_archive_only(self, tmp_path):
        """End-to-end: prepare_dataset auto-extracts a pre-placed archive."""
        root = tmp_path / "caltech-101"
        root.mkdir()
        self._make_archive(root)
        args = {"dataset": "caltech-101", "batch_size": 4,
                "data_root": str(tmp_path), "tl_dataset": "synthetic"}
        train, test = prepare_dataset(args)
        b = next(iter(test))
        assert b["image"].shape[1:] == (32, 32, 3)

    def test_missing_archive_raises_with_guidance(self, tmp_path):
        args = {"dataset": "caltech-256", "batch_size": 4,
                "data_root": str(tmp_path), "tl_dataset": "synthetic"}
        with pytest.raises(FileNotFoundError, match="--download"):
            prepare_dataset(args)

    def test_unsafe_member_rejected(self, tmp_path):
        import io
        import tarfile

        from deepipr_tpu.data.acquire import extract_archive

        fpath = tmp_path / "evil.tar"
        with tarfile.open(fpath, "w") as tar:
            info = tarfile.TarInfo("../../escape.txt")
            data = b"pwned"
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
        with pytest.raises(ValueError, match="unsafe"):
            extract_archive(str(fpath), str(tmp_path / "dest"))
        assert not (tmp_path.parent / "escape.txt").exists()

    def test_download_gated_then_mocked_fetch(self, tmp_path, monkeypatch):
        """allow_download drives download_url (mocked: zero-egress env)."""
        from urllib import request

        from deepipr_tpu.data import acquire

        root = tmp_path / "caltech-101"
        root.mkdir()
        stash = tmp_path / "stash"
        stash.mkdir()
        archive = self._make_archive(stash)

        def fake_retrieve(url, fpath):
            import shutil

            assert "101_ObjectCategories" in url
            shutil.copy(archive, fpath)

        monkeypatch.setattr(request, "urlretrieve", fake_retrieve)
        folder = acquire.prepare_archive(str(root), "caltech-101",
                                         allow_download=True)
        assert sorted(os.listdir(folder)) == ["ant", "bee"]

    def test_locate_flat_layout_unchanged(self, image_root):
        from deepipr_tpu.data.acquire import locate_caltech

        assert locate_caltech(image_root, "caltech-101") == image_root


class TestCaltechReferenceSplit:
    def test_reference_split_is_first_80pct_sorted(self, image_root):
        """split='reference': first 80% of each class in sorted-filename
        order is train (reference dataset.py:57-61), deterministically."""
        tx, ty, vx, vy = load_caltech(image_root, 3, split="reference")
        x, y, _ = load_image_folder(image_root, size=32, center_crop=True,
                                    resize_ratio=1.0)
        # per class: 10 images -> 8 train / 2 test, in file order
        assert len(ty) == 24 and len(vy) == 6
        for c in range(3):
            np.testing.assert_array_equal(tx[ty == c], x[y == c][:8])
            np.testing.assert_array_equal(vx[vy == c], x[y == c][8:])
        # deterministic across calls
        tx2, *_ = load_caltech(image_root, 3, split="reference")
        np.testing.assert_array_equal(tx, tx2)

    def test_unknown_split_rejected(self, image_root):
        with pytest.raises(ValueError, match="split"):
            load_caltech(image_root, 3, split="bogus")


class TestDraftDecode:
    """JPEG DCT-domain draft decode: same geometry, near-identical pixels
    (measured 2.16x decode rate at 3x-target sources, 1.0x below 2x)."""

    @pytest.fixture(scope="class")
    def big_image_root(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("bigimgs")
        rng = np.random.default_rng(5)
        d = root / "cls"
        d.mkdir()
        for i in range(6):
            base = rng.integers(0, 256, (96, 128, 3), dtype=np.uint8)
            Image.fromarray(base).resize((1024, 768)).save(
                d / f"{i}.jpg", quality=90)
        return str(root)

    def test_draft_matches_full_decode(self, big_image_root):
        kw = dict(batch_size=6, size=224, train=False, workers=2)
        on = StreamingImageFolder(big_image_root, draft=True, **kw)
        off = StreamingImageFolder(big_image_root, draft=False, **kw)
        bo, bf = next(iter(on)), next(iter(off))
        assert bo["image"].shape == bf["image"].shape == (6, 224, 224, 3)
        # pixel drift from the 1/2-scale DCT decode is tiny relative to the
        # [0,1]-normalized dynamic range the model sees
        assert np.abs(bo["image"] - bf["image"]).mean() < 0.05
        np.testing.assert_array_equal(bo["label"], bf["label"])

    def test_draft_skipped_for_small_sources(self, image_root):
        """Sources under 2x decode_size decode bit-identically either way."""
        kw = dict(batch_size=8, size=32, train=False, resize_ratio=1.0,
                  workers=2)
        on = StreamingImageFolder(image_root, draft=True, **kw)
        off = StreamingImageFolder(image_root, draft=False, **kw)
        np.testing.assert_array_equal(next(iter(on))["image"],
                                      next(iter(off))["image"])


def test_prepare_dataset_plumbs_no_draft(tmp_path, image_root):
    base = tmp_path / "ILSVRC2012"
    base.mkdir()
    for split in ("train", "val"):
        (base / split).symlink_to(image_root)
    args = {"dataset": "imagenet1000", "batch_size": 4,
            "data_root": str(tmp_path), "tl_dataset": "synthetic",
            "draft": False}
    train, test = prepare_dataset(args)
    assert not train.draft and not test.draft
    args["draft"] = True
    train, test = prepare_dataset(args)
    assert train.draft and test.draft


class TestAcquireCifarAndTriggerSet:
    """Round-4 acquisition breadth (VERDICT r3 item 5): pre-placed CIFAR
    archives and the WatermarkNN trigger set become one-command usable."""

    @staticmethod
    def _make_cifar10_archive(dest_dir, n=20):
        """Tiny cifar-10-python.tar.gz in the torchvision pickle layout."""
        import pickle
        import shutil
        import tarfile

        rng = np.random.default_rng(0)
        src = dest_dir / "_src" / "cifar-10-batches-py"
        src.mkdir(parents=True)
        for name in [f"data_batch_{i}" for i in range(1, 6)] + ["test_batch"]:
            batch = {
                b"data": rng.integers(0, 256, (n, 3072), dtype=np.uint8),
                b"labels": rng.integers(0, 10, n).tolist(),
            }
            with open(src / name, "wb") as f:
                pickle.dump(batch, f)
        fpath = dest_dir / "cifar-10-python.tar.gz"
        with tarfile.open(fpath, "w:gz") as tar:
            tar.add(src, arcname="cifar-10-batches-py")
        shutil.rmtree(src.parent)
        return fpath

    def test_prepare_dataset_cifar10_from_archive(self, tmp_path):
        root = tmp_path / "cifar10"
        root.mkdir()
        self._make_cifar10_archive(root)
        args = {"dataset": "cifar10", "batch_size": 8,
                "data_root": str(tmp_path), "tl_dataset": "synthetic"}
        train, test = prepare_dataset(args)
        b = next(iter(test))
        assert b["image"].shape[1:] == (32, 32, 3)
        # idempotent second call uses the extracted tree
        prepare_dataset(args)

    def test_locate_cifar100_archive(self, tmp_path):
        import pickle
        import tarfile

        from deepipr_tpu.data.acquire import locate_cifar

        root = tmp_path / "cifar100"
        root.mkdir()
        src = tmp_path / "cifar-100-python"
        src.mkdir()
        rng = np.random.default_rng(0)
        for name in ("train", "test"):
            with open(src / name, "wb") as f:
                pickle.dump({
                    b"data": rng.integers(0, 256, (12, 3072), dtype=np.uint8),
                    b"fine_labels": rng.integers(0, 100, 12).tolist(),
                }, f)
        with tarfile.open(root / "cifar-100-python.tar.gz", "w:gz") as tar:
            tar.add(src, arcname="cifar-100-python")
        assert locate_cifar(str(root), "cifar100") == str(root)
        assert (root / "cifar-100-python" / "train").exists()
        # nothing present and no download -> None
        assert locate_cifar(str(tmp_path / "empty"), "cifar100") is None

    @staticmethod
    def _make_wm_tree(base, n=6, nested=True):
        """WatermarkNN layout: pics/<i>.jpg + labels-cifar.txt."""
        rng = np.random.default_rng(2)
        root = (base / "WatermarkNN-master" / "data" / "trigger_set"
                if nested else base)
        pics = root / "pics"
        pics.mkdir(parents=True)
        for i in range(1, n + 1):
            arr = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
            Image.fromarray(arr).save(pics / f"{i}.jpg")
        np.savetxt(root / "labels-cifar.txt",
                   rng.integers(0, 10, n)[:, None], fmt="%d")
        return base / "WatermarkNN-master" if nested else root

    def test_prepare_wm_from_repo_tarball(self, tmp_path):
        """A WatermarkNN repo tarball pre-placed in data/trigger_set is
        auto-extracted and found at its nested path."""
        import shutil
        import tarfile

        from deepipr_tpu.data.datasets import prepare_wm

        stage = tmp_path / "_stage"
        stage.mkdir()
        repo = self._make_wm_tree(stage, nested=True)
        base = tmp_path / "trigger_set"
        base.mkdir()
        with tarfile.open(base / "WatermarkNN.tar.gz", "w:gz") as tar:
            tar.add(repo, arcname="WatermarkNN-master")
        shutil.rmtree(stage)

        loader = prepare_wm(str(base / "pics"), crop=32, shuffle=False)
        b = next(iter(loader))
        assert b["image"].shape == (2, 32, 32, 3)

    def test_prepare_wm_from_zip(self, tmp_path):
        """trigger_set.zip in the parent dir, flat layout inside."""
        import shutil
        import zipfile

        from deepipr_tpu.data.datasets import prepare_wm

        stage = tmp_path / "_stage"
        stage.mkdir()
        self._make_wm_tree(stage, nested=False)
        with zipfile.ZipFile(tmp_path / "trigger_set.zip", "w") as zf:
            for p in sorted(stage.rglob("*")):
                if p.is_file():
                    zf.write(p, p.relative_to(stage))
        shutil.rmtree(stage)

        loader = prepare_wm(str(tmp_path / "trigger_set" / "pics"),
                            crop=32, shuffle=False)
        b = next(iter(loader))
        assert b["image"].shape == (2, 32, 32, 3)

    def test_foreign_archive_not_extracted(self, tmp_path):
        """Code review r4: a name-matched archive WITHOUT the trigger set
        (e.g. an unrelated project's master.tar.gz in the data dir) must be
        ignored — never unpacked into base, let alone on every call."""
        import tarfile
        import warnings as _warnings

        from deepipr_tpu.data.acquire import locate_trigger_set

        stage = tmp_path / "_stage" / "otherproj-master"
        (stage / "src").mkdir(parents=True)
        (stage / "src" / "main.c").write_text("int main(){}\n")
        with tarfile.open(tmp_path / "master.tar.gz", "w:gz") as tar:
            tar.add(stage, arcname="otherproj-master")

        base = tmp_path / "trigger_set"
        with _warnings.catch_warnings(record=True) as w:
            _warnings.simplefilter("always")
            assert locate_trigger_set(str(base)) is None
        assert any("ignoring it" in str(x.message) for x in w)
        # nothing was written next to the datasets
        assert not (base / "otherproj-master").exists()

    def test_repo_tarball_extracts_only_trigger_subtree(self, tmp_path):
        """Advisor r4: a WatermarkNN repo tarball carries the whole repo
        tree; only */data/trigger_set/ may be unpacked into base."""
        import shutil
        import tarfile

        from deepipr_tpu.data.acquire import locate_trigger_set

        stage = tmp_path / "_stage"
        stage.mkdir()
        repo = self._make_wm_tree(stage, nested=True)
        del repo
        top = stage / "WatermarkNN-master"
        (top / "src").mkdir()
        (top / "src" / "train.py").write_text("print('repo code')\n")
        (top / "README.md").write_text("readme\n")
        base = tmp_path / "trigger_set"
        base.mkdir()
        with tarfile.open(base / "WatermarkNN.tar.gz", "w:gz") as tar:
            tar.add(top, arcname="WatermarkNN-master")
        shutil.rmtree(stage)

        found = locate_trigger_set(str(base))
        assert found is not None
        ext = base / "WatermarkNN-master"
        assert (ext / "data" / "trigger_set" / "pics").is_dir()
        assert not (ext / "src").exists()
        assert not (ext / "README.md").exists()

    def test_find_trigger_set_prefers_shallowest(self, tmp_path):
        """Advisor r4: with several nested trigger sets, the shallowest
        (then lexicographically first) wins — not os.walk order."""
        from deepipr_tpu.data.acquire import _find_trigger_set

        base = tmp_path / "trigger_set"
        deep = base / "zz" / "deeper"
        deep.mkdir(parents=True)
        self._make_wm_tree(deep, nested=False)
        shallow = base / "b_shallow"
        shallow.mkdir()
        self._make_wm_tree(shallow, nested=False)
        shallow2 = base / "a_shallow"
        shallow2.mkdir()
        self._make_wm_tree(shallow2, nested=False)

        pics, labels = _find_trigger_set(str(base))
        assert pics == str(base / "a_shallow" / "pics")

    def test_zip_traversal_rejected(self, tmp_path):
        import zipfile

        from deepipr_tpu.data.acquire import extract_archive

        fpath = tmp_path / "evil.zip"
        with zipfile.ZipFile(fpath, "w") as zf:
            zf.writestr("../../escape.txt", "pwned")
        with pytest.raises(ValueError, match="unsafe"):
            extract_archive(str(fpath), str(tmp_path / "dest"))

    def test_locate_caltech_prefers_archive_over_stray_dir(self, tmp_path):
        """ADVICE r3: a stray directory next to the tarball must not make
        the flat-layout heuristic shadow the authoritative archive."""
        from deepipr_tpu.data.acquire import ARCHIVES, locate_caltech

        root = tmp_path / "caltech-101"
        root.mkdir()
        TestAcquire._make_archive(root)
        (root / "stray_partial").mkdir()
        out = locate_caltech(str(root), "caltech-101")
        assert out == str(root / ARCHIVES["caltech-101"].foldername)
        assert sorted(os.listdir(out)) == ["ant", "bee"]


class TestDraftCacheSeparation:
    def test_cache_trees_are_disjoint(self, image_root):
        """ADVICE r3 + code review r4: the resized-u8 cache is keyed by BOTH
        the draft flag and the decode size, so neither toggling --no-draft
        nor changing the image size silently reuses stale arrays."""
        from deepipr_tpu.data.datasets import StreamingImageFolder

        cache = os.path.join(os.path.dirname(image_root), "cache")
        kw = dict(batch_size=2, cache_dir=cache)
        a = StreamingImageFolder(image_root, draft=True, **kw)
        b = StreamingImageFolder(image_root, draft=False, **kw)
        assert a.cache_dir != b.cache_dir
        assert os.path.basename(a.cache_dir).startswith("draft")
        assert os.path.basename(b.cache_dir).startswith("full")
        # different target size -> different tree (256px cache must not feed
        # a 512px run)
        c = StreamingImageFolder(image_root, draft=True, size=448, **kw)
        assert c.cache_dir != a.cache_dir
        assert str(c.decode_size) in os.path.basename(c.cache_dir)

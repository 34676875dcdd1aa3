"""Byte-level CIFAR-archive drill (VERDICT r4 item 4).

Zero-egress: no real CIFAR archive can land in this image, so these tests
prove the full acquisition path — a cifar-10-python.tar.gz in the dataset
root, auto-extracted by acquire.locate_cifar, parsed by load_cifar, trained
on by the real `train_v23.py --dataset cifar10` CLI — against a synthesized
archive whose on-disk format is byte-for-byte the torchvision/Kriz layout
(tools/make_cifar_archive.py; reference dataset.py:246-332). The day a
genuine archive is placed, parity is exactly one command.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


class TestArchiveFormat:
    def test_cifar10_roundtrip_bit_exact(self, tmp_path):
        import make_cifar_archive

        from deepipr_tpu.data.acquire import locate_cifar
        from deepipr_tpu.data.datasets import load_cifar, synthetic_dataset

        out = str(tmp_path / "cifar10")
        make_cifar_archive.main(
            ["--out", out, "--train", "200", "--test", "100"])
        # only the archive exists until locate_cifar extracts it
        assert os.path.exists(os.path.join(out, "cifar-10-python.tar.gz"))
        assert not os.path.isdir(os.path.join(out, "cifar-10-batches-py"))

        assert locate_cifar(out, "cifar10") == out
        tx, ty, vx, vy = load_cifar(out, "cifar10")
        stx, sty, svx, svy = synthetic_dataset(num_train=200, num_test=100)
        np.testing.assert_array_equal(tx, stx)
        np.testing.assert_array_equal(ty, sty)
        np.testing.assert_array_equal(vx, svx)
        np.testing.assert_array_equal(vy, svy)

    def test_cifar100_roundtrip_bit_exact(self, tmp_path):
        import make_cifar_archive

        from deepipr_tpu.data.acquire import locate_cifar
        from deepipr_tpu.data.datasets import load_cifar, synthetic_dataset

        out = str(tmp_path / "cifar100")
        make_cifar_archive.main(["--name", "cifar100", "--out", out,
                                 "--train", "200", "--test", "100"])
        assert locate_cifar(out, "cifar100") == out
        tx, ty, vx, vy = load_cifar(out, "cifar100")
        stx, sty, svx, svy = synthetic_dataset(
            num_train=200, num_test=100, num_classes=100)
        np.testing.assert_array_equal(tx, stx)
        np.testing.assert_array_equal(ty, sty)
        np.testing.assert_array_equal(vx, svx)
        np.testing.assert_array_equal(vy, svy)

    def test_pickles_use_byte_keys(self, tmp_path):
        """encoding='bytes' loaders (ours AND torchvision's) index with
        b'data'/b'labels' — str-keyed pickles would silently break them."""
        import pickle
        import tarfile

        import make_cifar_archive

        out = str(tmp_path / "c")
        make_cifar_archive.main(
            ["--out", out, "--train", "50", "--test", "10"])
        with tarfile.open(os.path.join(out, "cifar-10-python.tar.gz")) as t:
            f = t.extractfile("cifar-10-batches-py/data_batch_1")
            b = pickle.load(f, encoding="bytes")
        assert set(b) >= {b"data", b"labels", b"batch_label", b"filenames"}
        assert b[b"data"].dtype == np.uint8
        assert b[b"data"].shape[1] == 3072


@pytest.mark.slow
class TestCliEndToEnd:
    def test_train_v23_one_epoch_through_cifar10_path(self, tmp_path):
        """The REAL CLI, `--dataset cifar10` (not synthetic): archive ->
        auto-extract -> load -> 1 V2 epoch -> checkpoint + history.csv."""
        import make_cifar_archive

        data_root = str(tmp_path / "data")
        make_cifar_archive.main(
            ["--out", os.path.join(data_root, "cifar10"),
             "--train", "500", "--test", "100"])

        driver = (
            "import jax; jax.config.update('jax_platforms','cpu'); "
            "import runpy, sys; sys.argv = ["
            "'train_v23.py', '--arch', 'alexnet', '--dataset', 'cifar10', "
            f"'--data-root', {data_root!r}, "
            "'--epochs', '1', '--batch-size', '64', "
            "'--passport-config', 'passport_configs/alexnet_passport.json', "
            f"'--logdir', {str(tmp_path / 'logs')!r}, '--tag', 'drill']; "
            "runpy.run_path('train_v23.py', run_name='__main__')"
        )
        out = subprocess.run(
            [sys.executable, "-c", driver], cwd=REPO, text=True,
            capture_output=True, timeout=1800)
        assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
        assert "Training done" in out.stdout

        logdir = tmp_path / "logs" / "alexnet_cifar10_v2_drill" / "1"
        assert (logdir / "history.csv").exists()
        assert (logdir / "models" / "best.ckpt").exists()
        cfg = json.loads((logdir / "config.json").read_text())
        assert cfg["dataset"] == "cifar10"
        # history has both-branch validation columns (the V2 contract)
        header = (logdir / "history.csv").read_text().splitlines()[0]
        assert "valid_private_acc" in header or "valid_acc_private" in header

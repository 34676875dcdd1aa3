#!/usr/bin/env python
"""Synthesize a byte-exact CIFAR-10/100-format archive from synthetic tensors.

VERDICT r4 item 4: the zero-egress image has no real CIFAR archives, so the
cifar10 code path (acquire.locate_cifar -> auto-extract -> load_cifar ->
training) had never been exercised at the byte level. This tool builds a
`cifar-10-python.tar.gz` (or cifar-100) whose on-disk format is exactly the
torchvision/Kriz layout the reference trains from (reference
dataset.py:246-332 via torchvision.datasets.CIFAR10):

  cifar-10-batches-py/
    data_batch_{1..5}   pickled dicts, BYTE keys (py2-era pickles load with
    test_batch          encoding="bytes"): b"data" uint8 (N,3072) row-major
    batches.meta        R/G/B planes, b"labels" list[int], b"batch_label",
                        b"filenames"; meta has b"label_names" etc.

  cifar-100-python/
    train, test         b"data", b"fine_labels", b"coarse_labels"
    meta

Content is deepipr_tpu.data.datasets.synthetic_dataset tensors (deterministic,
CNN-learnable), so a full `train_v23.py --dataset cifar10 --data-root <out>`
run trains through the REAL cifar path end to end. The day genuine archives
land, parity is one command — this proves every byte of plumbing before that.

Usage:
  python tools/make_cifar_archive.py --out data/cifar10            # 50k/10k
  python tools/make_cifar_archive.py --name cifar100 --out data/cifar100
  python tools/make_cifar_archive.py --train 200 --test 100 --out /tmp/mini
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys
import tarfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CIFAR10_LABELS = [b"airplane", b"automobile", b"bird", b"cat", b"deer",
                  b"dog", b"frog", b"horse", b"ship", b"truck"]


def _flat(x_nhwc: np.ndarray) -> np.ndarray:
    """NHWC uint8 -> the CIFAR row layout: 3072 = R plane, G plane, B plane."""
    n = x_nhwc.shape[0]
    return np.ascontiguousarray(
        x_nhwc.transpose(0, 3, 1, 2).reshape(n, 3072))


def _dump(obj, path):
    # protocol 2: what py2-era cPickle wrote; loads under encoding="bytes"
    with open(path, "wb") as f:
        pickle.dump(obj, f, protocol=2)


def build_cifar10(stage: str, tx, ty, vx, vy):
    d = os.path.join(stage, "cifar-10-batches-py")
    os.makedirs(d, exist_ok=True)
    n = len(ty)
    per = n // 5
    assert per * 5 == n, "train count must divide into 5 batches"
    data = _flat(tx)
    for i in range(5):
        sl = slice(i * per, (i + 1) * per)
        _dump({
            b"batch_label": b"training batch %d of 5" % (i + 1),
            b"labels": [int(v) for v in ty[sl]],
            b"data": data[sl],
            b"filenames": [b"synthetic_%05d.png" % j
                           for j in range(sl.start, sl.stop)],
        }, os.path.join(d, "data_batch_%d" % (i + 1)))
    _dump({
        b"batch_label": b"testing batch 1 of 1",
        b"labels": [int(v) for v in vy],
        b"data": _flat(vx),
        b"filenames": [b"synthetic_test_%05d.png" % j
                       for j in range(len(vy))],
    }, os.path.join(d, "test_batch"))
    _dump({
        b"num_cases_per_batch": per,
        b"label_names": CIFAR10_LABELS,
        b"num_vis": 3072,
    }, os.path.join(d, "batches.meta"))
    return d


def build_cifar100(stage: str, tx, ty, vx, vy):
    d = os.path.join(stage, "cifar-100-python")
    os.makedirs(d, exist_ok=True)
    for name, x, y in (("train", tx, ty), ("test", vx, vy)):
        _dump({
            b"batch_label": name.encode(),
            b"fine_labels": [int(v) for v in y],
            b"coarse_labels": [int(v) // 5 for v in y],
            b"data": _flat(x),
            b"filenames": [b"synthetic_%05d.png" % j
                           for j in range(len(y))],
        }, os.path.join(d, name))
    _dump({
        b"fine_label_names": [b"class_%02d" % i for i in range(100)],
        b"coarse_label_names": [b"coarse_%02d" % i for i in range(20)],
    }, os.path.join(d, "meta"))
    return d


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--name", default="cifar10",
                    choices=["cifar10", "cifar100"])
    ap.add_argument("--out", default="data/cifar10",
                    help="dataset root: the archive lands at "
                    "<out>/cifar-10(0)-python.tar.gz, where "
                    "acquire.locate_cifar auto-extracts it")
    ap.add_argument("--train", type=int, default=50000)
    ap.add_argument("--test", type=int, default=10000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--keep-stage", action="store_true",
                    help="keep the pre-tar staging tree (debugging)")
    args = ap.parse_args(argv)

    from deepipr_tpu.data.datasets import synthetic_dataset

    nclass = 10 if args.name == "cifar10" else 100
    tx, ty, vx, vy = synthetic_dataset(
        num_train=args.train, num_test=args.test, num_classes=nclass,
        seed=args.seed)

    os.makedirs(args.out, exist_ok=True)
    stage = os.path.join(args.out, "_stage")
    folder = (build_cifar10 if args.name == "cifar10"
              else build_cifar100)(stage, tx, ty, vx, vy)

    fname = ("cifar-10-python.tar.gz" if args.name == "cifar10"
             else "cifar-100-python.tar.gz")
    archive = os.path.join(args.out, fname)
    with tarfile.open(archive, "w:gz") as tar:
        tar.add(folder, arcname=os.path.basename(folder))
    if not args.keep_stage:
        import shutil

        shutil.rmtree(stage)
    print(f"wrote {archive} ({os.path.getsize(archive) / 1e6:.1f} MB, "
          f"{args.train}/{args.test} {args.name})")
    return archive


if __name__ == "__main__":
    main()

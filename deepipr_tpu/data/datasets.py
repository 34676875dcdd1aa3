"""Data pipeline: CIFAR / Caltech / ImageNet / trigger-set / synthetic.

Mirrors the reference's dataset.py semantics with a NumPy host pipeline feeding
NHWC float32 batches (static shapes, drop_last for training):

- train transforms: RandomCrop(pad = 4/32 * size) + RandomHorizontalFlip +
  ImageNet mean/std normalization (dataset.py:268-293); transfer-learning mode
  drops the random crop (dataset.py:282-284).
- test transforms: normalization only (32px CIFAR) or Resize+CenterCrop (224).
- trigger set: WatermarkNN folder + labels-cifar.txt, CenterCrop, batch 2,
  drop_last, cycled batch-by-batch onto training batches (dataset.py:142-193).
- 'synthetic': a deterministic offline stand-in (fixed-seed images, labels from
  a fixed random linear probe) so training/benchmarks run with zero egress.

Datasets are in-memory uint8; augmentation + normalization are vectorized
NumPy per batch.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Iterator, Tuple

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


# ---------------------------------------------------------------------------
# sources
# ---------------------------------------------------------------------------

def load_cifar(root: str, name: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Load CIFAR-10/100 from the standard python-pickle layout on disk."""
    if name == "cifar10":
        d = os.path.join(root, "cifar-10-batches-py")
        if not os.path.isdir(d):
            raise FileNotFoundError(
                f"CIFAR-10 not found at {d}; place the extracted "
                "cifar-10-batches-py directory there (no network access)."
            )
        xs, ys = [], []
        for i in range(1, 6):
            with open(os.path.join(d, f"data_batch_{i}"), "rb") as f:
                b = pickle.load(f, encoding="bytes")
            xs.append(b[b"data"])
            ys.extend(b[b"labels"])
        with open(os.path.join(d, "test_batch"), "rb") as f:
            b = pickle.load(f, encoding="bytes")
        test_x, test_y = b[b"data"], b[b"labels"]
    else:
        d = os.path.join(root, "cifar-100-python")
        if not os.path.isdir(d):
            raise FileNotFoundError(f"CIFAR-100 not found at {d}")
        with open(os.path.join(d, "train"), "rb") as f:
            b = pickle.load(f, encoding="bytes")
        xs, ys = [b[b"data"]], list(b[b"fine_labels"])
        with open(os.path.join(d, "test"), "rb") as f:
            b = pickle.load(f, encoding="bytes")
        test_x, test_y = b[b"data"], b[b"fine_labels"]

    def to_nhwc(flat):
        return (
            np.concatenate([np.asarray(a) for a in np.atleast_1d(flat)])
            if isinstance(flat, list)
            else np.asarray(flat)
        ).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)

    train_x = to_nhwc(np.concatenate(xs))
    return (
        train_x.astype(np.uint8),
        np.asarray(ys, np.int32),
        to_nhwc(test_x).astype(np.uint8),
        np.asarray(test_y, np.int32),
    )


def synthetic_dataset(
    num_train=2048, num_test=512, size=32, num_classes=10, seed=0,
    noise: float = 0.6,
):
    """Deterministic, CNN-learnable toy data with balanced classes.

    Each class is a low-resolution random template upsampled to the image
    size; examples are template + heavy pixel noise. Template matching is
    exactly what convolutions learn, so small models reach high accuracy in a
    few epochs — while fake-passport corruption still collapses it.
    """
    rng = np.random.default_rng(seed)
    n = num_train + num_test
    y = rng.integers(0, num_classes, n).astype(np.int32)
    low = size // 4
    templates = rng.uniform(-1, 1, (num_classes, low, low, 3)).astype(np.float32)
    up = np.kron(templates, np.ones((1, 4, 4, 1), np.float32))
    signal = up[y]
    eps = rng.normal(0, 1, (n, size, size, 3)).astype(np.float32)
    x = np.clip(128 + 64 * signal + 64 * noise * eps, 0, 255).astype(np.uint8)
    return x[:num_train], y[:num_train], x[num_train:], y[num_train:]


def load_image_folder(root: str, size: int = 224, center_crop: bool = True,
                      resize_ratio: float = 256 / 224):
    """Minimal ImageFolder: root/<class>/<img> -> resized uint8 arrays.

    center_crop=True: short side scaled to size*resize_ratio, then center
    crop to size (the reference's Resize+CenterCrop; ratio 256/224 for
    ImageNet eval, 1.0 for Caltech's Resize(32)+CenterCrop(32)).
    """
    from PIL import Image

    classes = sorted(
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
    )
    xs, ys = [], []
    for ci, cls in enumerate(classes):
        cdir = os.path.join(root, cls)
        for fn in sorted(os.listdir(cdir)):
            img = Image.open(os.path.join(cdir, fn)).convert("RGB")
            if center_crop:
                short = min(img.size)
                scale = int(size * resize_ratio) / short
                img = img.resize(
                    (max(size, round(img.size[0] * scale)),
                     max(size, round(img.size[1] * scale)))
                )
                w, h = img.size
                left, top = (w - size) // 2, (h - size) // 2
                img = img.crop((left, top, left + size, top + size))
            else:
                img = img.resize((size, size))
            xs.append(np.asarray(img, np.uint8))
            ys.append(ci)
    return np.stack(xs), np.asarray(ys, np.int32), classes


def load_caltech(root: str, num_classes: int, size: int = 32, seed: int = 7,
                 split: str = "shuffled"):
    """Caltech-101/256 with the per-class 80/20 split and Resize+CenterCrop
    transform (dataset.py:14-139, 274-278).

    split="shuffled" (default): seeded per-class shuffle before the 80/20
    cut — avoids ordering bias in folders sorted by acquisition session.
    split="reference": the reference's exact deterministic split — first
    80% of each class in sorted-filename order is train (dataset.py:57-61).
    """
    x, y, _ = load_image_folder(root, size=size, center_crop=True,
                                resize_ratio=1.0)
    if split not in ("shuffled", "reference"):
        raise ValueError(f"unknown split {split!r}")
    rng = np.random.default_rng(seed)
    train_idx, test_idx = [], []
    for c in np.unique(y):
        idx = np.where(y == c)[0]
        if split == "shuffled":
            rng.shuffle(idx)
        k = int(0.8 * len(idx))
        train_idx.extend(idx[:k])
        test_idx.extend(idx[k:])
    train_idx, test_idx = np.asarray(train_idx), np.asarray(test_idx)
    return x[train_idx], y[train_idx], x[test_idx], y[test_idx]


def _short_side_resize(img, target: int):
    """PIL resize so the short side equals target (aspect preserved)."""
    w, h = img.size
    if min(w, h) == target:
        return img
    scale = target / min(w, h)
    return img.resize((max(target, round(w * scale)),
                       max(target, round(h * scale))))


def _random_resized_crop_params(rng, h: int, w: int):
    """torchvision RandomResizedCrop sampling: area scale U(0.08,1), aspect
    ratio exp(U(log 3/4, log 4/3)), 10 attempts then center-crop fallback
    (the reference's ImageNet train transform, dataset.py:204-210)."""
    area = h * w
    for _ in range(10):
        target_area = area * rng.uniform(0.08, 1.0)
        ratio = np.exp(rng.uniform(np.log(3 / 4), np.log(4 / 3)))
        cw = int(round(np.sqrt(target_area * ratio)))
        ch = int(round(np.sqrt(target_area / ratio)))
        if 0 < cw <= w and 0 < ch <= h:
            top = int(rng.integers(0, h - ch + 1))
            left = int(rng.integers(0, w - cw + 1))
            return top, left, ch, cw
    in_ratio = w / h
    if in_ratio < 3 / 4:
        cw, ch = w, min(h, int(round(w / (3 / 4))))
    elif in_ratio > 4 / 3:
        ch, cw = h, min(w, int(round(h * (4 / 3))))
    else:
        ch, cw = h, w
    return (h - ch) // 2, (w - cw) // 2, ch, cw


class StreamingImageFolder:
    """Lazy ImageFolder loader: O(batch) memory, thread-pool decode.

    The reference streams ImageNet through DataLoader workers and pickles the
    dataset object as a cache (dataset.py:196-243); an eager load would need
    ~190 GB of host RAM for ImageNet train. This loader indexes
    root/<class>/<img> paths up front and decodes per batch:

    - decode: short-side resize to int(size*resize_ratio) (256 for 224)
    - train: RandomResizedCrop(size) + horizontal flip (dataset.py:204-210)
    - eval:  center crop to size (Resize(256)+CenterCrop(224), :213-218)
    - cache_dir: optional resized-uint8 .npy cache, so epochs after the first
      skip JPEG decode entirely (analog of the reference's cache.pth)

    Deviation from torchvision: the train crop is sampled on the pre-resized
    image rather than the original, which bounds decode cost and makes the
    cache reusable; crop statistics are equivalent up to that rescale.

    Yields the same {'image','label'} float32 NHWC batches as DataLoader.
    """

    def __init__(
        self,
        root: str,
        batch_size: int,
        size: int = 224,
        train: bool = False,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 0,
        workers: int = 16,
        resize_ratio: float = 256 / 224,
        cache_dir: str = None,
        num_shards: int = 1,
        shard_id: int = 0,
        raw: bool = False,
        draft: bool = True,
    ):
        self.root = root
        self.batch_size = batch_size
        self.size = size
        self.train = train
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.workers = workers
        # multi-host DP: each process reads a disjoint strided slice of the
        # (commonly-seeded) epoch permutation; batch_size is per process
        if not (0 <= shard_id < num_shards):
            raise ValueError(f"shard_id {shard_id} not in [0, {num_shards})")
        self.num_shards = num_shards
        self.shard_id = shard_id
        self.decode_size = int(round(size * resize_ratio))
        # Both the draft flag (DCT-domain downscale changes decoded pixels)
        # and the decode size (short-side resolution of the stored array)
        # change what _decode_resized produces, so each (mode, decode_size)
        # pair gets a disjoint cache tree — a cache populated under one
        # setting is never silently reused by another (e.g. a 256px cache
        # feeding a 512px run upscaled garbage).
        self.cache_dir = (
            os.path.join(cache_dir,
                         f"{'draft' if draft else 'full'}{self.decode_size}")
            if cache_dir is not None else None)
        # raw=True ships uint8 batches (4x less H2D than f32); the crop/flip
        # still happen host-side (RandomResizedCrop is not expressible as the
        # device pad-crop) — only the normalize moves onto the chip
        # (experiment.py wires normalize_device as the device transform).
        self.raw = raw
        self.draft = draft
        self.epoch = 0

        self.classes = sorted(
            d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
        )
        if not self.classes:
            raise FileNotFoundError(f"no class directories under {root}")
        self.samples = []  # (relative path, label)
        for ci, cls in enumerate(self.classes):
            cdir = os.path.join(root, cls)
            for fn in sorted(os.listdir(cdir)):
                self.samples.append((os.path.join(cls, fn), ci))
        self.labels = np.asarray([lab for _, lab in self.samples], np.int32)

    def _shard_size(self):
        return len(range(self.shard_id, len(self.samples), self.num_shards))

    def __len__(self):
        n = self._shard_size() // self.batch_size
        if not self.drop_last and self._shard_size() % self.batch_size:
            n += 1
        return n

    @property
    def num_examples(self):
        return self._shard_size()

    def _decode_resized(self, rel: str) -> np.ndarray:
        """uint8 (H,W,3) with short side == decode_size; cached when enabled."""
        from PIL import Image

        if self.cache_dir is not None:
            cpath = os.path.join(self.cache_dir, rel + ".npy")
            if os.path.exists(cpath):
                return np.load(cpath)
        img = Image.open(os.path.join(self.root, rel))
        if self.draft:
            # JPEG DCT-domain downscale during decode: libjpeg decodes at
            # 1/2, 1/4 or 1/8 scale when the source is that much larger than
            # decode_size (short side stays >= decode_size, so the resize
            # below remains a downscale). No-op for non-JPEG or sources
            # under 2x the target. The reference decodes full-size always
            # (dataset.py:204-218); this trades sub-Nyquist high-frequency
            # content the resize would discard anyway for 2-4x decode rate
            # on large-image folders.
            img.draft("RGB", (self.decode_size, self.decode_size))
        img = img.convert("RGB")
        arr = np.asarray(_short_side_resize(img, self.decode_size), np.uint8)
        if self.cache_dir is not None:
            os.makedirs(os.path.dirname(cpath), exist_ok=True)
            tmp = cpath + f".tmp{os.getpid()}.npy"  # atomic vs other workers
            np.save(tmp, arr)
            os.replace(tmp, cpath)
        return arr

    def _example(self, idx: int, epoch: int) -> np.ndarray:
        """Decode + transform one example to (size, size, 3) uint8."""
        from PIL import Image

        rel, _ = self.samples[idx]
        arr = self._decode_resized(rel)
        h, w = arr.shape[:2]
        if self.train:
            rng = np.random.default_rng((self.seed, epoch, idx))
            top, left, ch, cw = _random_resized_crop_params(rng, h, w)
            crop = arr[top:top + ch, left:left + cw]
            if (ch, cw) != (self.size, self.size):
                crop = np.asarray(
                    Image.fromarray(crop).resize((self.size, self.size)),
                    np.uint8,
                )
            if rng.random() < 0.5:
                crop = crop[:, ::-1]
            return crop
        top, left = (h - self.size) // 2, (w - self.size) // 2
        return arr[top:top + self.size, left:left + self.size]

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        from concurrent.futures import ThreadPoolExecutor

        epoch = self.epoch
        self.epoch += 1
        rng = np.random.default_rng((self.seed, epoch))
        idx = np.arange(len(self.samples))
        if self.shuffle:
            rng.shuffle(idx)  # same seed on every process -> same permutation
        idx = idx[self.shard_id::self.num_shards]
        end = (
            len(idx) - len(idx) % self.batch_size if self.drop_last else len(idx)
        )
        with ThreadPoolExecutor(max_workers=self.workers) as pool:
            for i in range(0, end, self.batch_size):
                sel = idx[i:i + self.batch_size]
                imgs = list(pool.map(lambda j: self._example(j, epoch), sel))
                batch = np.stack(imgs)
                yield {
                    "image": batch if self.raw else normalize(batch),
                    "label": self.labels[sel],
                }


# ---------------------------------------------------------------------------
# transforms + loader
# ---------------------------------------------------------------------------

def normalize(batch_u8: np.ndarray) -> np.ndarray:
    from deepipr_tpu.data.native import normalize_native

    out = normalize_native(batch_u8, IMAGENET_MEAN, IMAGENET_STD)
    if out is not None:
        return out
    x = batch_u8.astype(np.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def _apply_crop_flip(batch_u8, ys, xs, flips, pad):
    """NumPy reference for the native kernel: zero-pad crop + hflip."""
    n, h, w, c = batch_u8.shape
    out = batch_u8
    if pad > 0:
        padded = np.pad(
            out, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="constant"
        )
        out = np.stack(
            [padded[i, ys[i]:ys[i] + h, xs[i]:xs[i] + w] for i in range(n)]
        )
    out = out.copy()
    out[flips] = out[flips, :, ::-1]
    return out


def augment_normalize(batch_u8: np.ndarray, rng: np.random.Generator,
                      pad: int, random_crop: bool = True) -> np.ndarray:
    """Fused train transform: zero-pad random crop + hflip + normalization.

    Uses the native C++ kernel when available (one cache-friendly pass);
    NumPy fallback is draw-for-draw identical.
    """
    from deepipr_tpu.data.native import augment_normalize_native

    n = batch_u8.shape[0]
    crop_pad = pad if (random_crop and pad > 0) else 0
    if crop_pad:
        ys = rng.integers(0, 2 * pad + 1, n).astype(np.int32)
        xs = rng.integers(0, 2 * pad + 1, n).astype(np.int32)
    else:
        ys = np.zeros(n, np.int32)
        xs = np.zeros(n, np.int32)
    flips = rng.random(n) < 0.5

    out = augment_normalize_native(
        batch_u8, ys, xs, flips.astype(np.uint8), crop_pad,
        IMAGENET_MEAN, IMAGENET_STD,
    )
    if out is not None:
        return out
    return normalize(_apply_crop_flip(batch_u8, ys, xs, flips, crop_pad))


def augment(batch_u8: np.ndarray, rng: np.random.Generator, pad: int,
            random_crop: bool = True) -> np.ndarray:
    """Random crop (with reflection-free zero pad, torch default) + hflip."""
    n = batch_u8.shape[0]
    if random_crop and pad > 0:
        ys = rng.integers(0, 2 * pad + 1, n)
        xs = rng.integers(0, 2 * pad + 1, n)
    else:
        ys = xs = np.zeros(n, np.int32)
        pad = 0
    flips = rng.random(n) < 0.5
    return _apply_crop_flip(batch_u8, ys, xs, flips, pad)


class DataLoader:
    """Epoch iterator over in-memory arrays -> {'image','label'} batches."""

    def __init__(
        self,
        images: np.ndarray,
        labels: np.ndarray,
        batch_size: int,
        shuffle: bool = False,
        train_augment: bool = False,
        random_crop: bool = True,
        drop_last: bool = False,
        seed: int = 0,
        raw: bool = False,
    ):
        self.images, self.labels = images, labels
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.train_augment = train_augment
        # raw=True ships uint8 batches untouched — augmentation/normalization
        # happen on-device (data/device_augment.py)
        self.raw = raw
        self.random_crop = random_crop
        self.drop_last = drop_last
        self.seed = seed
        self.epoch = 0
        self.pad = int((4 / 32) * images.shape[1])

    def __len__(self):
        n = len(self.images) // self.batch_size
        if not self.drop_last and len(self.images) % self.batch_size:
            n += 1
        return n

    @property
    def num_examples(self):
        return len(self.images)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.default_rng((self.seed, self.epoch))
        self.epoch += 1
        idx = np.arange(len(self.images))
        if self.shuffle:
            rng.shuffle(idx)
        end = (
            len(idx) - len(idx) % self.batch_size if self.drop_last else len(idx)
        )
        for i in range(0, end, self.batch_size):
            sel = idx[i:i + self.batch_size]
            x = self.images[sel]
            if self.raw:
                pass
            elif self.train_augment:
                x = augment_normalize(x, rng, self.pad, self.random_crop)
            else:
                x = normalize(x)
            yield {"image": x, "label": self.labels[sel]}


class CyclingIterator:
    """Endless batch stream for the trigger set (trainer.py:115-126)."""

    def __init__(self, loader: DataLoader):
        self.loader = loader
        self._it = iter(loader)

    def next(self):
        try:
            return next(self._it)
        except StopIteration:
            self._it = iter(self.loader)
            return next(self._it)


# ---------------------------------------------------------------------------
# preparation entry points (reference API)
# ---------------------------------------------------------------------------

def prepare_dataset(args: Dict) -> Tuple[DataLoader, DataLoader]:
    """(train_loader, test_loader) per the reference's prepare_dataset."""
    is_tl = args.get("transfer_learning", False)
    ds = args["tl_dataset"] if is_tl else args["dataset"]
    bs = args["batch_size"]
    root = args.get("data_root", "data")

    if ds == "synthetic":
        tx, ty, vx, vy = synthetic_dataset(
            num_train=args.get("synthetic_train", 2048),
            num_test=args.get("synthetic_test", 512),
        )
    elif ds in ("cifar10", "cifar100"):
        from deepipr_tpu.data.acquire import locate_cifar

        croot = os.path.join(root, ds)
        # auto-extract a pre-placed cifar-10(0)-python.tar.gz (or fetch it
        # with --download); falls through to load_cifar's placement error
        locate_cifar(croot, ds, allow_download=bool(args.get("download")))
        tx, ty, vx, vy = load_cifar(croot, ds)
    elif ds in ("caltech-101", "caltech-256"):
        from deepipr_tpu.data.acquire import locate_caltech

        nc = 101 if ds == "caltech-101" else 256
        droot = locate_caltech(os.path.join(root, ds), ds,
                               allow_download=bool(args.get("download")))
        if droot is None:
            raise FileNotFoundError(
                f"{ds} not found under {os.path.join(root, ds)}; place the "
                f"extracted class folders or the reference archive there, "
                f"or pass --download (reference dataset.py:89-130)")
        tx, ty, vx, vy = load_caltech(
            droot, nc, split=args.get("caltech_split", "shuffled"))
    elif ds == "imagenet1000":
        # streamed, not loaded: ImageNet train is ~190 GB decoded
        base = os.path.join(root, "ILSVRC2012")
        cache = args.get("imagenet_cache")
        workers = args.get("workers", 16)
        if args.get("multihost"):
            import jax

            num_shards, shard_id = jax.process_count(), jax.process_index()
        else:
            num_shards, shard_id = 1, 0
        draft = bool(args.get("draft", True))
        train_loader = StreamingImageFolder(
            os.path.join(base, "train"), bs, train=not is_tl, shuffle=True,
            drop_last=True, seed=args.get("seed", 0), workers=workers,
            cache_dir=cache, num_shards=num_shards, shard_id=shard_id,
            raw=bool(args.get("device_augment")) and not is_tl, draft=draft,
        )
        test_loader = StreamingImageFolder(
            os.path.join(base, "val"), bs * 2, train=False, workers=workers,
            cache_dir=cache, draft=draft,
        )
        return train_loader, test_loader
    else:
        raise ValueError(f"unknown dataset {ds}")

    raw = bool(args.get("device_augment"))
    train_loader = DataLoader(
        tx, ty, bs, shuffle=True, train_augment=not raw,
        random_crop=not is_tl, drop_last=True, seed=args.get("seed", 0),
        raw=raw,
    )
    test_loader = DataLoader(vx, vy, bs * 2)
    return train_loader, test_loader


def prepare_wm(datapath: str = "data/trigger_set/pics", crop: int = 32,
               shuffle: bool = True, seed: int = 0,
               raw: bool = False, allow_download: bool = False) -> DataLoader:
    """Trigger-set loader: WatermarkNN layout, batch 2, drop_last."""
    from PIL import Image

    labelpath = os.path.join(os.path.dirname(datapath), "labels-cifar.txt")
    if not os.path.exists(labelpath) or not os.path.isdir(datapath):
        # pre-placed trigger_set / WatermarkNN-repo archive (or --download)
        from deepipr_tpu.data.acquire import locate_trigger_set

        found = locate_trigger_set(os.path.dirname(datapath),
                                   allow_download=allow_download)
        if found is not None:
            datapath, labelpath = found
    if not os.path.exists(labelpath):
        raise FileNotFoundError(
            "Trigger set not found. Download it from the WatermarkNN repository "
            f"and place it under {os.path.dirname(datapath)} "
            "(pics/ + labels-cifar.txt, or the repo tarball/zip to "
            "auto-extract); tools/make_trigger_set.py generates an offline "
            "stand-in."
        )
    labels = np.loadtxt(labelpath).astype(np.int32)

    # labels-cifar.txt line i belongs to trigger image i. WatermarkNN ships
    # non-zero-padded names (1.jpg, 2.jpg, ...), where a lexicographic sort
    # would silently pair image 10 with label line 2 — sort numerically when
    # the stems are numbers.
    def order(fn):
        stem = os.path.splitext(fn)[0]
        return (0, int(stem), fn) if stem.isdigit() else (1, 0, fn)

    files = sorted(os.listdir(datapath), key=order)
    if len(files) > len(labels):
        raise ValueError(
            f"trigger set mismatch: {len(files)} images in {datapath} but "
            f"only {len(labels)} labels in {labelpath}"
        )
    xs = []
    for fn in files:
        img = Image.open(os.path.join(datapath, fn)).convert("RGB")
        w, h = img.size
        left, top = (w - crop) // 2, (h - crop) // 2
        img = img.crop((left, top, left + crop, top + crop))
        xs.append(np.asarray(img, np.uint8))
    return DataLoader(
        np.stack(xs), labels[: len(xs)], batch_size=2, shuffle=shuffle,
        drop_last=True, seed=seed, raw=raw,
    )

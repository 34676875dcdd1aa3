"""Dataset acquisition: archive extraction + gated download.

Parity with the reference's Caltech download/untar machinery
(reference dataset.py:14-139): the reference's Caltech101/Caltech256
Dataset classes download `101_ObjectCategories.tar.gz` /
`256_ObjectCategories.tar` into `root` and extract them in place before
indexing `root/<foldername>/<class>/<img>`.

This rebuild's environment is zero-egress, so the network leg is opt-in
(`allow_download=True`); the primary path is a pre-placed archive:

    data/caltech-101/101_ObjectCategories.tar.gz   -> auto-extracted
    data/caltech-101/101_ObjectCategories/...      -> used directly

Extraction is hardened beyond the reference (which `tar.extractall()`s
with no member validation): absolute paths, `..` components, and
link members escaping the destination are rejected.
"""

from __future__ import annotations

import os
import tarfile
import warnings
from dataclasses import dataclass
from typing import Optional


@dataclass(frozen=True)
class ArchiveSpec:
    """One downloadable dataset archive (reference dataset.py:15-17,136-139)."""

    url: str
    filename: str
    foldername: str


ARCHIVES = {
    "caltech-101": ArchiveSpec(
        url="http://www.vision.caltech.edu/Image_Datasets/Caltech101/"
            "101_ObjectCategories.tar.gz",
        filename="101_ObjectCategories.tar.gz",
        foldername="101_ObjectCategories",
    ),
    "caltech-256": ArchiveSpec(
        url="http://www.vision.caltech.edu/Image_Datasets/Caltech256/"
            "256_ObjectCategories.tar",
        filename="256_ObjectCategories.tar",
        foldername="256_ObjectCategories",
    ),
    # torchvision's CIFAR archives (the reference loads CIFAR via
    # torchvision.datasets.CIFAR10/100, dataset.py:262-267, which fetch
    # exactly these files)
    "cifar10": ArchiveSpec(
        url="https://www.cs.toronto.edu/~kriz/cifar-10-python.tar.gz",
        filename="cifar-10-python.tar.gz",
        foldername="cifar-10-batches-py",
    ),
    "cifar100": ArchiveSpec(
        url="https://www.cs.toronto.edu/~kriz/cifar-100-python.tar.gz",
        filename="cifar-100-python.tar.gz",
        foldername="cifar-100-python",
    ),
}

# The WatermarkNN trigger set (reference dataset.py:171-174 points users at
# this repo). GitHub serves the whole repository as a tarball; the trigger
# set lives at <repo>/data/trigger_set/{pics/, labels-cifar.txt}.
WATERMARKNN = ArchiveSpec(
    url="https://github.com/adiyoss/WatermarkNN/archive/refs/heads/"
        "master.tar.gz",
    filename="WatermarkNN.tar.gz",
    foldername="WatermarkNN-master",
)

# archive filenames accepted as a pre-placed trigger set (searched in the
# trigger-set dir and its parent)
_WM_ARCHIVE_NAMES = (
    "trigger_set.tar.gz", "trigger_set.tar", "trigger_set.zip",
    "WatermarkNN.tar.gz", "WatermarkNN.zip", "master.tar.gz",
)


def _check_member(member: tarfile.TarInfo, dest: str) -> None:
    """Reject archive members that would write outside `dest`."""
    target = os.path.realpath(os.path.join(dest, member.name))
    base = os.path.realpath(dest)
    if not (target == base or target.startswith(base + os.sep)):
        raise ValueError(f"unsafe archive member path: {member.name!r}")
    if member.islnk() or member.issym():
        link = os.path.realpath(os.path.join(os.path.dirname(target),
                                             member.linkname))
        if not link.startswith(base + os.sep):
            raise ValueError(f"unsafe archive link: {member.name!r} -> "
                             f"{member.linkname!r}")
    if member.isdev():
        raise ValueError(f"device member in archive: {member.name!r}")


def _check_zip_member(name: str, dest: str) -> None:
    """Reject zip members that would write outside `dest`."""
    target = os.path.realpath(os.path.join(dest, name))
    base = os.path.realpath(dest)
    if not (target == base or target.startswith(base + os.sep)):
        raise ValueError(f"unsafe archive member path: {name!r}")


def extract_archive(archive_path: str, dest: str, *,
                    only_under: str | None = None) -> None:
    """Extract a .tar / .tar.gz / .zip into `dest` (reference
    dataset.py:96-105), validating every member path first.

    `only_under`: when set, extract ONLY members whose path contains this
    substring (e.g. "/data/trigger_set/") — used to avoid unpacking a whole
    WatermarkNN repo checkout when just the trigger set is wanted. Falls
    back to extracting everything if no member matches (a flat archive)."""
    def _keep(name: str) -> bool:
        return only_under is None or only_under in "/" + name.replace(
            os.sep, "/")

    if archive_path.endswith(".zip"):
        import zipfile

        with zipfile.ZipFile(archive_path) as zf:
            names = [n for n in zf.namelist() if _keep(n)] or zf.namelist()
            for name in names:
                _check_zip_member(name, dest)
            zf.extractall(dest, members=names)
        return
    mode = "r:gz" if archive_path.endswith(".gz") else "r"
    with tarfile.open(archive_path, mode) as tar:
        members = tar.getmembers()
        kept = [m for m in members if _keep(m.name)] or members
        for m in kept:
            _check_member(m, dest)
        tar.extractall(dest, members=kept, filter="data")


def download_url(url: str, fpath: str) -> None:
    """Fetch `url` to `fpath`, retrying https->http like the reference
    (dataset.py:107-130). Only called when allow_download=True."""
    from urllib import request

    os.makedirs(os.path.dirname(fpath) or ".", exist_ok=True)
    try:
        print(f"Downloading {url} to {fpath}")
        request.urlretrieve(url, fpath)
    except Exception:
        if url.startswith("https:"):
            alt = url.replace("https:", "http:", 1)
            print(f"Failed download. Trying https -> http instead. "
                  f"Downloading {alt} to {fpath}")
            request.urlretrieve(alt, fpath)
        else:
            raise


def prepare_archive(root: str, name_or_spec, *,
                    allow_download: bool = False) -> str:
    """Ensure `root/<foldername>` exists; return its path.

    Resolution order (mirrors reference dataset.py:89-105 download()):
      1. already extracted -> return it
      2. archive file present at root/<filename> -> extract
      3. allow_download -> download then extract
      4. raise FileNotFoundError with placement instructions

    `name_or_spec`: an ARCHIVES key (e.g. "caltech-101") or an ArchiveSpec.
    """
    spec = (ARCHIVES[name_or_spec] if isinstance(name_or_spec, str)
            else name_or_spec)
    folder = os.path.join(root, spec.foldername)
    if os.path.isdir(folder):
        return folder

    fpath = os.path.join(root, spec.filename)
    if not os.path.exists(fpath):
        if not allow_download:
            raise FileNotFoundError(
                f"{folder} not found and {spec.filename} is not present in "
                f"{root}. Place the archive there (or the extracted "
                f"{spec.foldername}/ tree), or pass --download / "
                f"allow_download=True to fetch {spec.url} "
                f"(requires network egress)."
            )
        download_url(spec.url, fpath)

    extract_archive(fpath, root)
    if not os.path.isdir(folder):
        raise FileNotFoundError(
            f"extracting {fpath} did not produce {folder}; archive layout "
            f"does not match the expected {spec.foldername}/ root")
    return folder


def locate_caltech(root: str, dataset: str, *,
                   allow_download: bool = False) -> Optional[str]:
    """Find (or materialize) the class-folder root for a Caltech dataset.

    `root` is the dataset dir from prepare_dataset (e.g. data/caltech-101).
    Returns the directory whose children are class folders:
      - root itself, if it already holds class dirs (flat layout used by
        the rest of this repo and its tests)
      - root/<foldername>, extracted from an archive if needed (the
        reference's layout, dataset.py:43-48)
    Returns None when nothing can be located without downloading.
    """
    spec = ARCHIVES[dataset]
    if os.path.isdir(root):
        entries = os.listdir(root)
        if spec.foldername in entries and os.path.isdir(
                os.path.join(root, spec.foldername)):
            return os.path.join(root, spec.foldername)
        # a present archive wins over the flat-layout heuristic: a stray
        # directory next to the tarball (e.g. a partially extracted tree
        # from an interrupted run) must not shadow the authoritative archive
        if (spec.filename not in entries
                and any(os.path.isdir(os.path.join(root, e))
                        for e in entries)):
            return root  # flat <class>/<img> layout
    try:
        return prepare_archive(root, spec, allow_download=allow_download)
    except FileNotFoundError:
        if allow_download:
            raise
        return None


def locate_cifar(root: str, name: str, *,
                 allow_download: bool = False) -> Optional[str]:
    """Ensure `root/<batches-folder>` exists for CIFAR-10/100; return `root`.

    `root` is the dataset dir from prepare_dataset (e.g. data/cifar10) —
    the directory load_cifar expects to contain `cifar-10-batches-py/` or
    `cifar-100-python/`. A pre-placed `cifar-10(0)-python.tar.gz` at `root`
    is auto-extracted; `allow_download` fetches it from the torchvision URL
    (reference dataset.py:262-267 delegates the same fetch to torchvision).
    Returns None when nothing can be located without downloading.
    """
    spec = ARCHIVES[name]
    if os.path.isdir(os.path.join(root, spec.foldername)):
        return root
    try:
        prepare_archive(root, spec, allow_download=allow_download)
        return root
    except FileNotFoundError:
        if allow_download:
            raise
        return None


def _find_trigger_set(base: str):
    """Locate pics/ + labels-cifar.txt under `base` (any nesting depth —
    covers both the reference's flat layout and a WatermarkNN repo
    checkout's data/trigger_set/)."""
    direct = (os.path.join(base, "pics"), os.path.join(base, "labels-cifar.txt"))
    if os.path.isdir(direct[0]) and os.path.exists(direct[1]):
        return direct
    hits = []
    for dirpath, dirnames, filenames in os.walk(base):
        if "labels-cifar.txt" in filenames and "pics" in dirnames:
            hits.append(dirpath)
    if hits:
        # deterministic when several nested trigger sets exist: prefer the
        # shallowest, then lexicographic (advisor r4 — walk order is fs-
        # dependent)
        best = min(hits, key=lambda p: (p.count(os.sep), p))
        return (os.path.join(best, "pics"),
                os.path.join(best, "labels-cifar.txt"))
    return None


def _archive_has_trigger_set(fpath: str) -> bool:
    """True iff the archive's member list contains the trigger-set marker
    (a labels-cifar.txt at any depth) — checked WITHOUT extracting."""
    try:
        if fpath.endswith(".zip"):
            import zipfile

            with zipfile.ZipFile(fpath) as zf:
                names = zf.namelist()
        else:
            mode = "r:gz" if fpath.endswith(".gz") else "r"
            with tarfile.open(fpath, mode) as tar:
                names = tar.getnames()
    except Exception:  # unreadable/corrupt archive -> not a trigger set
        return False
    return any(os.path.basename(n) == "labels-cifar.txt" for n in names)


def locate_trigger_set(base: str = "data/trigger_set", *,
                       allow_download: bool = False):
    """Find (or materialize) the WatermarkNN trigger set.

    Returns (pics_dir, labels_path) or None. Resolution order:
      1. pics/ + labels-cifar.txt already under `base` (reference layout,
         dataset.py:168-174), at any nesting depth;
      2. a pre-placed archive in `base` or its parent (trigger_set.tar.gz /
         .zip, or a WatermarkNN repo tarball) — extracted into `base`, then
         searched as in 1;
      3. allow_download: fetch the WatermarkNN repo tarball from GitHub.
    """
    if os.path.isdir(base):
        found = _find_trigger_set(base)
        if found:
            return found
    candidates = []
    for d in (base, os.path.dirname(base) or "."):
        if os.path.isdir(d):
            for fn in sorted(os.listdir(d)):
                if fn in _WM_ARCHIVE_NAMES or (
                        fn.startswith("WatermarkNN")
                        and fn.endswith((".tar.gz", ".tar", ".zip"))):
                    candidates.append(os.path.join(d, fn))
    for fpath in candidates:
        # peek before extracting: a name-matched archive that does not
        # actually contain the trigger set (e.g. an unrelated project's
        # master.tar.gz sitting in the data dir) must not be unpacked into
        # base — and must not be RE-unpacked on every locate call
        if not _archive_has_trigger_set(fpath):
            warnings.warn(
                f"{fpath} looks like a trigger-set archive by name but "
                "contains no pics/ + labels-cifar.txt; ignoring it")
            continue
        os.makedirs(base, exist_ok=True)
        # a WatermarkNN repo tarball carries the whole repo tree; keep only
        # the data/trigger_set/ subtree (advisor r4)
        extract_archive(fpath, base, only_under="/data/trigger_set/")
        found = _find_trigger_set(base)
        if found:
            return found
    if allow_download:
        os.makedirs(base, exist_ok=True)
        fpath = os.path.join(base, WATERMARKNN.filename)
        download_url(WATERMARKNN.url, fpath)
        extract_archive(fpath, base, only_under="/data/trigger_set/")
        return _find_trigger_set(base)
    return None

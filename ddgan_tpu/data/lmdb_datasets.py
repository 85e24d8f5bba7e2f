"""CelebA-HQ LMDB and LSUN datasets.

Reference: datasets_prep/lmdb_datasets.py (CelebA-HQ, 27000/3000 split)
and datasets_prep/lsun.py (torchvision LSUN fork with key caching).
Gated on the optional `lmdb` package (not in this image); construction
raises a clear error when absent, everything else imports fine.
"""

from __future__ import annotations

import io
import os
import pickle
import string
from collections.abc import Iterable

import numpy as np
from PIL import Image

try:
    import lmdb as _lmdb
except ImportError:  # pragma: no cover - gated dependency
    _lmdb = None


def _require_lmdb():
    if _lmdb is None:
        raise ImportError(
            "The 'lmdb' package is required for LMDB datasets (CelebA-HQ/LSUN) "
            "but is not installed in this environment."
        )
    return _lmdb


def num_samples(dataset: str, train: bool) -> int:
    """Hardcoded CelebA split sizes. (lmdb_datasets.py:16-21)"""
    if dataset == "celeba":
        return 27000 if train else 3000
    raise NotImplementedError(f"dataset {dataset} is unknown")


class LMDBDataset:
    """CelebA-HQ LMDB reader, raw or encoded bytes. (lmdb_datasets.py:24-58)"""

    def __init__(self, root, name="", train=True, transform=None, is_encoded=False):
        lmdb_mod = _require_lmdb()
        self.train = train
        self.name = name
        self.transform = transform
        lmdb_path = os.path.join(root, "train.lmdb" if train else "validation.lmdb")
        self.data_lmdb = lmdb_mod.open(
            lmdb_path, readonly=True, max_readers=1, lock=False,
            readahead=False, meminit=False,
        )
        self.is_encoded = is_encoded

    def __getitem__(self, index):
        target = [0]
        with self.data_lmdb.begin(write=False, buffers=True) as txn:
            data = txn.get(str(index).encode())
            if self.is_encoded:
                img = Image.open(io.BytesIO(data)).convert("RGB")
            else:
                img = np.asarray(data, dtype=np.uint8)
                size = int(np.sqrt(len(img) / 3))
                img = Image.fromarray(np.reshape(img, (size, size, 3)), mode="RGB")
        if self.transform is not None:
            img = self.transform(img)
        return img, target

    def __len__(self):
        return num_samples(self.name, self.train)


class LSUNClass:
    """One LSUN category LMDB with a cached key list. (lsun.py:24-60)"""

    def __init__(self, root, transform=None, target_transform=None):
        lmdb_mod = _require_lmdb()
        self.root = root
        self.transform = transform
        self.target_transform = target_transform
        self.env = lmdb_mod.open(
            root, max_readers=1, readonly=True, lock=False,
            readahead=False, meminit=False,
        )
        with self.env.begin(write=False) as txn:
            self.length = txn.stat()["entries"]
        cache_file = "_cache_" + "".join(
            c for c in root if c in string.ascii_letters + string.digits
        )
        cache_path = os.path.join(root, cache_file)
        if os.path.isfile(cache_path):
            with open(cache_path, "rb") as f:
                self.keys = pickle.load(f)
        else:
            with self.env.begin(write=False) as txn:
                self.keys = [key for key in txn.cursor().iternext(keys=True, values=False)]
            with open(cache_path, "wb") as f:
                pickle.dump(self.keys, f)

    def __getitem__(self, index):
        with self.env.begin(write=False) as txn:
            imgbuf = txn.get(self.keys[index])
        img = Image.open(io.BytesIO(imgbuf)).convert("RGB")
        target = None
        if self.transform is not None:
            img = self.transform(img)
        if self.target_transform is not None:
            target = self.target_transform(target)
        return img, target

    def __len__(self):
        return self.length


class LSUN:
    """Multi-category LSUN over per-class LMDBs. (lsun.py:63-170)

    classes: 'train' | 'val' | 'test' | list of '<category>_<split>'.
    """

    CATEGORIES = [
        "bedroom", "bridge", "church_outdoor", "classroom", "conference_room",
        "dining_room", "kitchen", "living_room", "restaurant", "tower",
    ]

    def __init__(self, root, classes="train", transform=None, target_transform=None):
        self.root = root
        self.transform = transform
        self.target_transform = target_transform
        self.classes = self._verify_classes(classes)
        self.dbs = [
            LSUNClass(root=os.path.join(root, f"{c}_lmdb"), transform=transform)
            for c in self.classes
        ]
        self.indices = []
        count = 0
        for db in self.dbs:
            count += len(db)
            self.indices.append(count)
        self.length = count

    def _verify_classes(self, classes):
        if isinstance(classes, str):
            if classes == "test":
                return [classes]
            if classes in ("train", "val"):
                return [f"{c}_{classes}" for c in self.CATEGORIES]
            return [classes]
        if isinstance(classes, Iterable):
            return list(classes)
        raise ValueError(f"invalid classes: {classes!r}")

    def __getitem__(self, index):
        target = 0
        sub = 0
        for ind in self.indices:
            if index < ind:
                break
            target += 1
            sub = ind
        db = self.dbs[target]
        index = index - sub
        img, _ = db[index]
        if self.target_transform is not None:
            target = self.target_transform(target)
        return img, target

    def __len__(self):
        return self.length

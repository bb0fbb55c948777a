"""Validation / test pair datasets.

Reimplements VAL_DATASET_BYTE (reference utils/data_partial.py:63-92): a
bcolz carray of already-normalised float images (N, C, H, W) viewed as
(N/2, 2, C, H, W) pairs plus `{dir}_list.npy` boolean labels, shuffled by a
pair permutation. bcolz isn't installed here, so the reader falls back to
`{dir}.npy` / `{dir}.npz` with identical layout; the storage format is an
ingest detail, the tensor semantics are unchanged.

Divergence (documented): the reference's permutation is *unseeded*
random.shuffle (utils/data_partial.py:72-75, flagged in SURVEY §7 as a bug);
we use a seeded permutation for reproducibility. The permutation does not
affect any reported metric (histograms are order-free).

Also the cross-matching TEST_DATASET (reference utils/data_partial.py:20-58):
a csv `imgs/<name>.csv` of (filename, label) rows, images resized and
normalised with mean .5 / std .5.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterator, Optional, Tuple

import numpy as np


def _load_pair_array(data_dir: str) -> np.ndarray:
    """(N, C, H, W) float array of pair images, bcolz or npy/npz fallback."""
    p = Path(data_dir)
    try:
        import bcolz  # optional; the reference's storage format
        if (p / "meta").exists() or (p / "__attrs__").exists():
            return np.asarray(bcolz.carray(rootdir=str(p), mode="r"))
    except ImportError:
        # first-party rootdir reader (system libblosc via ctypes) — bcolz
        # itself does not install on modern Pythons, its storage does
        # (fr_tpu/data/bcolz_reader.py; VERDICT round-2 missing #3)
        if (p / "meta").is_dir() and (p / "data").is_dir():
            from fr_tpu.data.bcolz_reader import blosc_available, read_carray
            if blosc_available():
                return read_carray(str(p))
    for ext in (".npy", ".npz"):
        f = p.with_suffix(ext) if p.suffix != ext else p
        if Path(str(p) + ext).exists():
            f = Path(str(p) + ext)
        if f.exists():
            arr = np.load(f)
            if isinstance(arr, np.lib.npyio.NpzFile):
                arr = arr[arr.files[0]]
            return np.asarray(arr)
    raise FileNotFoundError(
        f"no pair data at {data_dir} (bcolz dir, .npy or .npz)")


class PairDataset:
    """(num_pairs, 2, H, W, C) float pairs + bool labels, NHWC for TPU."""

    def __init__(self, data_dir: str, img_size: int,
                 shuffle_seed: Optional[int] = 0):
        arr = _load_pair_array(data_dir)
        n, c, h, w = arr.shape
        pairs = arr.reshape(n // 2, 2, c, h, w)
        labels = np.load(f"{data_dir}_list.npy")
        assert pairs.shape[0] == labels.shape[0], \
            "Not match size of patch and label !!!"
        if shuffle_seed is not None:
            perm = np.random.default_rng(shuffle_seed).permutation(len(labels))
            pairs, labels = pairs[perm], labels[perm]
        # NCHW → NHWC (TPU layout)
        self.pairs = np.transpose(pairs, (0, 1, 3, 4, 2)).astype(np.float32)
        self.labels = np.asarray(labels).astype(bool)
        self.img_size = img_size

    def __len__(self) -> int:
        return len(self.labels)

    def batches(self, batch_size: int) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Yield ((b, 2, H, W, C) float, (b,) bool) — resize happens on device
        in the embed path if img_size differs."""
        for s in range(0, len(self), batch_size):
            yield self.pairs[s:s + batch_size], self.labels[s:s + batch_size]


class CrossDataset:
    """Cross-matching image list (reference utils/data_partial.py:20-58)."""

    def __init__(self, data_dir: str, img_size: int):
        import pandas as pd
        name = Path(data_dir).name
        self.img_dir = Path(data_dir) / "imgs"
        info = pd.read_csv(str(self.img_dir / f"{name}.csv"), header=None)
        self.files = np.asarray(info.iloc[:, 0])
        self.labels = np.asarray(info.iloc[:, 1])
        self.img_size = img_size

    def __len__(self) -> int:
        return len(self.files)

    def batches(self, batch_size: int) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        import cv2
        for s in range(0, len(self), batch_size):
            sel = self.files[s:s + batch_size]
            imgs = np.empty((len(sel), self.img_size, self.img_size, 3),
                            np.float32)
            for j, fname in enumerate(sel):
                img = cv2.imread(str(self.img_dir / fname), cv2.IMREAD_COLOR)
                if img is None:
                    raise IOError(f"failed to decode {self.img_dir / fname}")
                img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
                img = cv2.resize(img, (self.img_size, self.img_size),
                                 interpolation=cv2.INTER_LINEAR)
                imgs[j] = (img.astype(np.float32) / 255.0 - 0.5) / 0.5
            yield imgs, self.labels[s:s + batch_size]

"""Packed training corpus: pre-decoded uint8 images in a memory-mapped file.

Production ingest path replacing JPEG-decode-per-step (the reference decodes
with albumentations/cv2 in DataLoader workers every epoch,
utils/data_partial.py:95-164; this host has a single CPU core, so per-step
decode caps throughput far below the TPU's ~2000 imgs/sec). Packing decodes
once offline; training then memory-maps `images.npy` (N, H, W, 3) uint8 and
gathers batches with the native C++ `gather_u8` (fr_tpu/native) — pure
memcpy fan-out, no Python-loop or decode on the hot path.

Layout under <root>/:
    images.npy   (N, H, W, 3) uint8, C-order  (np.lib.format, memmap-able)
    labels.npy   (N,) int32
    classes.json list of class names (index = label)
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Iterator, Tuple

import numpy as np


def pack_image_folder(src_root: str, dst_root: str, img_size: int,
                      log_every: int = 1000) -> int:
    """Convert a CustomImageFolder-layout corpus (<src>/imgs/<class>/*) into
    the packed format. Returns the number of images packed."""
    from fr_tpu.data.folder import ImageFolderIndex, _decode_resize

    index = ImageFolderIndex(src_root)
    dst = Path(dst_root)
    dst.mkdir(parents=True, exist_ok=True)
    n = len(index)
    images = np.lib.format.open_memmap(
        str(dst / "images.npy"), mode="w+", dtype=np.uint8,
        shape=(n, img_size, img_size, 3))
    labels = np.empty(n, np.int32)
    for i, (path, lab) in enumerate(index.samples):
        images[i] = _decode_resize(path, img_size)
        labels[i] = lab
        if log_every and (i + 1) % log_every == 0:
            print(f"packed {i + 1}/{n}")
    images.flush()
    np.save(str(dst / "labels.npy"), labels)
    (dst / "classes.json").write_text(json.dumps(index.classes))
    return n


class PackedTrainLoader:
    """Epoch iterator over a packed corpus: epoch-seeded permutation
    (DistributedSampler.set_epoch equivalent, reference utils/trainer.py:72),
    drop_last batches, native memcpy gather when available."""

    def __init__(self, root: str, batch_size: int, seed: int = 0,
                 process_index: int = 0, process_count: int = 1):
        assert batch_size % process_count == 0, (batch_size, process_count)
        root_p = Path(root)
        self.images = np.load(str(root_p / "images.npy"), mmap_mode="r")
        self.labels = np.load(str(root_p / "labels.npy"))
        classes_file = root_p / "classes.json"
        self.classes = (json.loads(classes_file.read_text())
                        if classes_file.exists() else None)
        self.batch_size = batch_size
        self.seed = seed
        self.process_index = process_index
        self.process_count = process_count

    @property
    def num_classes(self) -> int:
        if self.classes is not None:
            return len(self.classes)
        return int(self.labels.max()) + 1

    def steps_per_epoch(self) -> int:
        return len(self.labels) // self.batch_size

    def epoch(self, epoch: int) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        from fr_tpu import native
        rng = np.random.default_rng(self.seed + epoch)
        order = rng.permutation(len(self.labels))
        bs = self.batch_size
        b_loc = bs // self.process_count
        lo = self.process_index * b_loc
        for s in range(self.steps_per_epoch()):
            sel = np.sort(order[s * bs:(s + 1) * bs])  # sorted → sequential IO
            local = sel[lo:lo + b_loc]  # this process's image slice
            imgs = native.gather_u8_native(self.images, local)
            if imgs is None:
                imgs = np.ascontiguousarray(self.images[local])
            # GLOBAL labels (multi-host contract of shard_batch)
            yield imgs, self.labels[sel].astype(np.int32)

"""Training dataset: class-per-directory image folder.

Reimplements the reference's CustomImageFolder over `<root>/imgs/<class>/*`
(reference utils/data_partial.py:95-164, torchvision DatasetFolder semantics:
classes sorted lexicographically, class_to_idx by sorted order) plus a
threaded, double-buffered host loader that decodes+resizes to fixed-size
uint8 and hands device-resident batches to the on-device augment pipeline.

Per-epoch reshuffling uses an epoch-seeded permutation — the functional
equivalent of DistributedSampler.set_epoch (reference utils/trainer.py:72) —
with drop_last semantics (reference utils/data_partial.py:271-278).
"""

from __future__ import annotations

import os
import queue
import threading
from pathlib import Path
from typing import Iterator, List, Tuple

import numpy as np

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp", ".webp", ".ppm")


class ImageFolderIndex:
    """Scan of <root>/imgs/<class>/* (reference utils/data_partial.py:103-108)."""

    def __init__(self, root: str, subdir: str = "imgs"):
        base = Path(root) / subdir
        if not base.is_dir():
            base = Path(root)  # allow pointing directly at the class dirs
        self.root = str(base)
        classes = sorted(d.name for d in base.iterdir() if d.is_dir())
        if not classes:
            raise FileNotFoundError(f"no class directories under {base}")
        self.classes = classes
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        samples: List[Tuple[str, int]] = []
        for c in classes:
            cdir = base / c
            for f in sorted(os.listdir(cdir)):
                if f.lower().endswith(IMG_EXTENSIONS):
                    samples.append((str(cdir / f), self.class_to_idx[c]))
        if not samples:
            raise FileNotFoundError(f"no images under {base}")
        self.samples = samples

    def __len__(self) -> int:
        return len(self.samples)

    @property
    def num_classes(self) -> int:
        return len(self.classes)


def _decode_resize(path: str, img_size: int) -> np.ndarray:
    import cv2
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise IOError(f"failed to decode {path}")
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    if img.shape[:2] != (img_size, img_size):
        img = cv2.resize(img, (img_size, img_size),
                         interpolation=cv2.INTER_LINEAR)
    return img  # uint8 HWC RGB


class TrainLoader:
    """Epoch iterator of (uint8 images (B,H,W,3), int32 labels (B,)) with a
    background prefetch thread (the reference uses torch DataLoader workers,
    utils/data_partial.py:271-278).

    Multi-host: pass process_index/process_count (the reference's
    DistributedSampler role, utils/data_partial.py:273). batch_size is the
    GLOBAL batch; every process draws the identical epoch-seeded permutation,
    decodes only its contiguous local slice of each global batch, and yields
    (local images (B/P,H,W,3), GLOBAL labels (B,)) — labels come from the
    index, not from decoding, so the full vector is free on every process
    and shard_batch can replicate it without a collective.
    """

    def __init__(self, index: ImageFolderIndex, batch_size: int,
                 img_size: int, seed: int = 0, prefetch: int = 4,
                 process_index: int = 0, process_count: int = 1):
        assert batch_size % process_count == 0, (batch_size, process_count)
        self.index = index
        self.batch_size = batch_size
        self.img_size = img_size
        self.seed = seed
        self.prefetch = prefetch
        self.process_index = process_index
        self.process_count = process_count

    def steps_per_epoch(self) -> int:
        return len(self.index) // self.batch_size  # drop_last=True

    def epoch(self, epoch: int) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        rng = np.random.default_rng(self.seed + epoch)  # set_epoch equivalent
        order = rng.permutation(len(self.index))
        nsteps = self.steps_per_epoch()
        b_loc = self.batch_size // self.process_count
        lo = self.process_index * b_loc
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put(item) -> bool:
            # stop-aware put: never block forever if the consumer abandoned
            # the epoch (exception / interrupt) while the queue is full
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def decode_batch(local):
            paths = [self.index.samples[int(i)][0] for i in local]
            # native threaded libjpeg pool when every file is a JPEG
            # (fr_tpu/native/fr_native.cpp decode_jpegs_rgb); cv2 otherwise
            if all(p.lower().endswith((".jpg", ".jpeg")) for p in paths):
                from fr_tpu import native
                if native.jpeg_available():
                    blobs = [open(p, "rb").read() for p in paths]
                    out = native.decode_jpegs_native(blobs, self.img_size)
                    if out is not None:
                        return out
            imgs = np.empty((len(local), self.img_size, self.img_size, 3),
                            np.uint8)
            for j, i in enumerate(local):
                imgs[j] = _decode_resize(self.index.samples[int(i)][0],
                                         self.img_size)
            return imgs

        def worker():
            try:
                for s in range(nsteps):
                    if stop.is_set():
                        return
                    sel = order[s * self.batch_size:(s + 1) * self.batch_size]
                    # global labels from the index alone (no decode needed)
                    labels = np.array(
                        [self.index.samples[int(i)][1] for i in sel], np.int32)
                    local = sel[lo:lo + b_loc]  # this process's image slice
                    imgs = decode_batch(local)
                    if not put((imgs, labels)):
                        return
                put(None)
            except BaseException as e:  # surface decode errors to the consumer
                put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()


class ArrayTrainLoader:
    """In-memory variant (synthetic data, tests, benchmark corpora).
    Multi-host semantics identical to TrainLoader: local image slice,
    global labels."""

    def __init__(self, images: np.ndarray, labels: np.ndarray,
                 batch_size: int, seed: int = 0,
                 process_index: int = 0, process_count: int = 1):
        assert images.dtype == np.uint8 and images.ndim == 4
        assert batch_size % process_count == 0, (batch_size, process_count)
        self.images = images
        self.labels = labels.astype(np.int32)
        self.batch_size = batch_size
        self.seed = seed
        self.process_index = process_index
        self.process_count = process_count

    def steps_per_epoch(self) -> int:
        return len(self.images) // self.batch_size

    def epoch(self, epoch: int):
        rng = np.random.default_rng(self.seed + epoch)
        order = rng.permutation(len(self.images))
        b_loc = self.batch_size // self.process_count
        lo = self.process_index * b_loc
        for s in range(self.steps_per_epoch()):
            sel = order[s * self.batch_size:(s + 1) * self.batch_size]
            yield self.images[sel[lo:lo + b_loc]], self.labels[sel]

"""Data pipeline: augmentation semantics, folder index, pair datasets."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fr_tpu.data.augment import (
    _hls_to_rgb, _rgb_to_hls, augment_batch, normalize_only,
)
from fr_tpu.data.folder import ArrayTrainLoader, ImageFolderIndex, TrainLoader
from fr_tpu.data.synthetic import synthetic_corpus, write_synthetic_folder

CFG = (80.0, 120.0, 0.5, 0.5, 0.0, 0.05, 0.0, 0.3, 0.5, 0.5, 0.5, 8, 8)


def test_augment_shapes_and_range():
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (8, 24, 24, 3)).astype(np.uint8)
    out = np.asarray(augment_batch(jax.random.key(0), jnp.asarray(imgs), CFG))
    assert out.shape == (8, 24, 24, 3)
    assert out.dtype == np.float32
    # normalised range [-1, 1]
    assert out.min() >= -1.0 - 1e-5 and out.max() <= 1.0 + 1e-5
    assert np.isfinite(out).all()


def test_augment_deterministic_per_key():
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.integers(0, 256, (4, 16, 16, 3)).astype(np.uint8))
    a = np.asarray(augment_batch(jax.random.key(5), imgs, CFG))
    b = np.asarray(augment_batch(jax.random.key(5), imgs, CFG))
    c = np.asarray(augment_batch(jax.random.key(6), imgs, CFG))
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 0  # different key → different augmentation


def test_augment_identity_when_all_off():
    """With all probabilities 0 the pipeline is exactly Normalize(.5, .5)
    (reference utils/data_partial.py:151-156)."""
    cfg = (80.0, 120.0, 0.0, 0.0, 0.0, 0.05, 0.0, 0.3, 0.0, 0.0, 0.0, 8, 8)
    rng = np.random.default_rng(2)
    imgs = rng.integers(0, 256, (4, 16, 16, 3)).astype(np.uint8)
    out = np.asarray(augment_batch(jax.random.key(0), jnp.asarray(imgs), cfg))
    expected = (imgs.astype(np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(out, expected, atol=1e-6)
    np.testing.assert_allclose(np.asarray(normalize_only(jnp.asarray(imgs))),
                               expected, atol=1e-6)


def test_hls_roundtrip():
    rng = np.random.default_rng(3)
    rgb = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)).astype(np.float32))
    h, l, s = _rgb_to_hls(rgb)
    back = np.asarray(_hls_to_rgb(h, l, s))
    np.testing.assert_allclose(back, np.asarray(rgb), atol=1e-5)


def test_image_folder_and_loader(tmp_path):
    write_synthetic_folder(str(tmp_path), n_classes=4, per_class=3,
                           img_size=16)
    index = ImageFolderIndex(str(tmp_path))
    assert index.num_classes == 4
    assert len(index) == 12
    # classes sorted, labels assigned by sorted order (DatasetFolder semantics)
    assert index.classes == sorted(index.classes)

    loader = TrainLoader(index, batch_size=4, img_size=16, seed=0)
    assert loader.steps_per_epoch() == 3  # drop_last
    seen = []
    for imgs, labels in loader.epoch(0):
        assert imgs.shape == (4, 16, 16, 3) and imgs.dtype == np.uint8
        assert labels.shape == (4,)
        seen.append(labels)
    # different epochs shuffle differently
    order0 = np.concatenate(seen)
    order1 = np.concatenate([l for _, l in loader.epoch(1)])
    assert not np.array_equal(order0, order1)


def test_array_loader_epoch_reshuffle():
    imgs, labels = synthetic_corpus(4, 4, 8)
    loader = ArrayTrainLoader(imgs, labels, batch_size=8)
    b0 = list(loader.epoch(0))
    b1 = list(loader.epoch(0))
    for (x0, y0), (x1, y1) in zip(b0, b1):
        np.testing.assert_array_equal(y0, y1)  # same epoch → same order


def test_pair_dataset_npy(tmp_path):
    # emulate the bcolz layout with the npy fallback
    rng = np.random.default_rng(4)
    n_pairs, c, h, w = 6, 3, 8, 8
    arr = rng.standard_normal((n_pairs * 2, c, h, w)).astype(np.float32)
    labels = rng.integers(0, 2, n_pairs).astype(bool)
    base = tmp_path / "lfw"
    np.save(str(base) + ".npy", arr)
    np.save(str(base) + "_list.npy", labels)

    from fr_tpu.data.pairs import PairDataset
    ds = PairDataset(str(base), img_size=8, shuffle_seed=None)
    assert len(ds) == n_pairs
    assert ds.pairs.shape == (n_pairs, 2, 8, 8, 3)  # NHWC
    batches = list(ds.batches(4))
    assert batches[0][0].shape == (4, 2, 8, 8, 3)
    np.testing.assert_array_equal(
        np.concatenate([b[1] for b in batches]), labels)
    # pair i, side j equals arr[2i+j] transposed
    np.testing.assert_allclose(ds.pairs[1, 0],
                               np.transpose(arr[2], (1, 2, 0)))

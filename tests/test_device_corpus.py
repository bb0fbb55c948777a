"""Device-resident corpus loader: sharded gather semantics + trainability.

fr_tpu/data/device_corpus.py uploads the packed corpus to HBM once and
gathers batches on device from per-device index draws (the reference's
DistributedSampler per-rank partition, utils/data_partial.py:273, with zero
image H2D per step).
"""

import numpy as np

import jax

from fr_tpu.data.device_corpus import DeviceCorpusLoader
from fr_tpu.parallel import make_mesh


def _corpus(n=64, hw=8):
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (n, hw, hw, 3)).astype(np.uint8)
    # label i for row i so provenance is checkable from the batch
    return imgs, np.arange(n, dtype=np.int32)


def test_single_device_batches_match_host_rows():
    imgs, labels = _corpus()
    mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    loader = DeviceCorpusLoader(imgs, labels, batch_size=16, mesh=mesh)
    assert loader.steps_per_epoch() == 4
    seen = []
    for bi, bl in loader.epoch(0):
        bi = np.asarray(bi)
        assert bi.shape == (16, 8, 8, 3) and bi.dtype == np.uint8
        np.testing.assert_array_equal(bi, imgs[bl])  # row == its label
        seen.extend(bl.tolist())
    assert sorted(seen) == list(range(64))  # full epoch, no repeats

    # different epoch -> different order (set_epoch semantics)
    order1 = [tuple(bl) for _, bl in loader.epoch(1)]
    order0 = [tuple(bl) for _, bl in loader.epoch(0)]
    assert order0 != order1


def test_multi_device_stripes_and_gather():
    imgs, labels = _corpus(n=64)
    mesh = make_mesh(data=2, model=4)
    loader = DeviceCorpusLoader(imgs, labels, batch_size=16, mesh=mesh)
    n_loc, b_loc = loader.n_loc, loader.b_loc
    assert (n_loc, b_loc) == (8, 2)
    for bi, bl in loader.epoch(3):
        bi = np.asarray(bi)
        np.testing.assert_array_equal(bi, imgs[bl])
        # device d's block of the batch must come from d's stripe
        for d in range(8):
            blk = bl[d * b_loc:(d + 1) * b_loc]
            assert all(d * n_loc <= v < (d + 1) * n_loc for v in blk), (d, blk)


def test_trains_through_task_step():
    """Batches feed training_step directly (device-resident fast path)."""
    from fr_tpu.configs.base import Config
    from fr_tpu.heads.partial_fc import PFCConfig
    from fr_tpu.models.resnet import build_resnet
    from fr_tpu.train.state import init_train_state
    from fr_tpu.train.step import make_train_step

    imgs, labels = _corpus(n=32, hw=16)
    mesh = make_mesh(data=2, model=4)
    loader = DeviceCorpusLoader(imgs, labels % 8, batch_size=16, mesh=mesh)
    conf = Config(network="ResNet18", emd_size=32, n_classes=8,
                  metric="ArcFace", loss_s=30.0, loss_m=0.35,
                  optimizer_name="SGD", optimizer="SGD", wd=5e-4, mom=0.9,
                  mixed_precision=False, sample_rate=1.0)
    enc = build_resnet(conf)
    pfc = PFCConfig(8, 32, mesh.shape["model"], 1.0, "ArcFace", 30.0, 0.35,
                    False, "SGD")
    state = init_train_state(jax.random.key(0), conf, enc, pfc, 16)
    step = make_train_step(conf, mesh, enc, pfc, donate=False)
    for bi, bl in loader.epoch(0):
        xs = jax.numpy.asarray(bi, jax.numpy.float32) / 255.0
        state, m = step(state, xs, bl, 0.05, jax.random.key(1))
        assert np.isfinite(float(m["loss"]))

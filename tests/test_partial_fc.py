"""PartialFC head: parity vs the reference torch implementation (world-size-1
gloo group) and sampling invariants."""

import numpy as np
import pytest

from conftest import add_reference_to_path, init_torch_dist, reference_available

import jax
import jax.numpy as jnp

from fr_tpu.configs.base import Config
from fr_tpu.heads.partial_fc import (
    PFCConfig, dense_partial_fc_loss, remap_labels, sample_columns,
    shard_valid_mask,
)
from fr_tpu.models.common import l2_normalize


def _cfg(**kw):
    base = dict(num_classes=37, embedding_size=16, model_size=1,
                sample_rate=1.0, margin="ArcFace", s=30.0, m=0.35,
                mixed_precision=False, optimizer="SGD")
    base.update(kw)
    return PFCConfig(**base)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_dense_loss_matches_reference_world1():
    """Our dense full-softmax loss == reference PartialFC forward in a
    degenerate world-size-1 process group (the reference's own single-GPU
    mode, reference main/main.py:262 + nets/PartialFC.py)."""
    add_reference_to_path()
    import torch

    init_torch_dist()

    # the reference hardcodes .cuda(); run it on CPU torch by no-op'ing it
    torch.Tensor.cuda = lambda self, *a, **k: self
    from nets.PartialFC import PartialFC as RefPFC

    conf = Config(emd_size=16, sample_rate=1.0, mixed_precision=False,
                  loss_s=30.0, loss_m=0.35)
    ref = RefPFC(conf, num_classes=37)

    rng = np.random.default_rng(0)
    w = (0.01 * rng.standard_normal((37, 16))).astype(np.float32)
    emb = rng.standard_normal((12, 16)).astype(np.float32)
    labels = rng.integers(0, 37, 12).astype(np.int64)

    with torch.no_grad():
        ref.weight_activated.copy_(torch.tensor(w))
    opt = torch.optim.SGD([ref.weight_activated], lr=0.0)
    ref_loss = ref(torch.tensor(emb), torch.tensor(labels), opt).item()

    cfg = _cfg()
    ours = float(dense_partial_fc_loss(cfg, jnp.asarray(emb),
                                       jnp.asarray(labels), jnp.asarray(w)))
    np.testing.assert_allclose(ours, ref_loss, rtol=1e-5)


def test_sampling_invariants():
    cfg = _cfg(num_classes=64, model_size=1, sample_rate=0.25)
    assert cfg.num_sample == 16
    valid = shard_valid_mask(cfg, 0)
    assert bool(valid.all())

    labels = jnp.array([3, 7, 7, 50])
    pos_mask = jnp.zeros(64, bool).at[labels].set(True)
    idx = sample_columns(cfg, jax.random.key(0), pos_mask, valid)
    idx_np = np.asarray(idx)
    # sorted, unique, all positives present
    assert (np.diff(idx_np) > 0).all()
    for lab in [3, 7, 50]:
        assert lab in idx_np

    remapped = remap_labels(cfg, idx, labels, jnp.ones(4, bool))
    assert (np.asarray(idx)[np.asarray(remapped)] == np.asarray(labels)).all()

    # classes not sampled / not owned → -1
    not_owned = remap_labels(cfg, idx, labels, jnp.zeros(4, bool))
    assert (np.asarray(not_owned) == -1).all()


def test_padding_classes_masked():
    """Padded class columns must not leak into the softmax denominator."""
    cfg37 = _cfg(num_classes=37, model_size=1)
    rng = np.random.default_rng(1)
    w37 = rng.standard_normal((37, 16)).astype(np.float32)
    emb = rng.standard_normal((8, 16)).astype(np.float32)
    labels = rng.integers(0, 37, 8)

    # padded to 40 rows with garbage in the pad rows
    cfg40 = PFCConfig(num_classes=37, embedding_size=16, model_size=4,
                      sample_rate=1.0, margin="ArcFace", s=30.0, m=0.35,
                      mixed_precision=False, optimizer="SGD")
    assert cfg40.num_classes_padded == 40
    w40 = np.concatenate([w37, 100 * np.ones((3, 16), np.float32)])

    l37 = float(dense_partial_fc_loss(cfg37, jnp.asarray(emb),
                                      jnp.asarray(labels), jnp.asarray(w37)))
    l40 = float(dense_partial_fc_loss(cfg40, jnp.asarray(emb),
                                      jnp.asarray(labels), jnp.asarray(w40)))
    np.testing.assert_allclose(l37, l40, rtol=1e-6)

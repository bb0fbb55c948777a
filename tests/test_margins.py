"""Margin-transform parity vs the reference torch implementation
(reference nets/ArcFace.py)."""

import numpy as np
import pytest

from conftest import add_reference_to_path, reference_available

import jax.numpy as jnp

from fr_tpu.heads.margins import arcface, cosface, combined_margin


def _rand_logits(rng, b=16, c=32):
    logits = rng.uniform(-1, 1, (b, c)).astype(np.float32)
    labels = rng.integers(0, c, b).astype(np.int64)
    labels[::5] = -1  # rows whose target lives on another shard
    return logits, labels


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
@pytest.mark.parametrize("s,m", [(64.0, 0.5), (30.0, 0.35)])
def test_arcface_matches_reference(s, m):
    add_reference_to_path()
    import torch
    from nets.ArcFace import ArcFace as RefArcFace

    rng = np.random.default_rng(0)
    logits, labels = _rand_logits(rng)

    ref = RefArcFace(s=s, margin=m)(
        torch.tensor(logits.copy()), torch.tensor(labels)).numpy()
    ours = np.asarray(arcface(jnp.asarray(logits), jnp.asarray(labels), s=s, m=m))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_cosface_matches_reference():
    add_reference_to_path()
    import torch
    from nets.ArcFace import CosFace as RefCosFace

    rng = np.random.default_rng(1)
    logits, labels = _rand_logits(rng)
    ref = RefCosFace(s=30.0, m=0.35)(
        torch.tensor(logits.copy()), torch.tensor(labels)).numpy()
    ours = np.asarray(cosface(jnp.asarray(logits), jnp.asarray(labels),
                              s=30.0, m=0.35))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_combined_margin_arcface_form_matches_reference():
    add_reference_to_path()
    import torch
    from nets.ArcFace import CombinedMarginLoss

    rng = np.random.default_rng(2)
    logits, labels = _rand_logits(rng)
    # CombinedMarginLoss indexes labels[index_positive] as (k,1) — mimic its
    # call convention with labels shaped (B,1) like PartialFC passes them.
    ref = CombinedMarginLoss(64.0, 1.0, 0.5, 0.0)(
        torch.tensor(logits.copy()), torch.tensor(labels).view(-1, 1)).numpy()
    ours = np.asarray(combined_margin(jnp.asarray(logits), jnp.asarray(labels),
                                      s=64.0, m1=1.0, m2=0.5, m3=0.0))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_arcface_easy_margin_matches_reference():
    """conf.easy_margin=True path (reference nets/ArcFace.py:72,81-82)."""
    add_reference_to_path()
    import torch
    from nets.ArcFace import ArcFace as RefArcFace

    rng = np.random.default_rng(3)
    logits, labels = _rand_logits(rng)
    ref_mod = RefArcFace(s=30.0, margin=0.35)
    ref_mod.easy_margin = True
    ref = ref_mod(torch.tensor(logits.copy()), torch.tensor(labels)).numpy()
    ours = np.asarray(arcface(jnp.asarray(logits), jnp.asarray(labels),
                              s=30.0, m=0.35, easy_margin=True))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_easy_margin_threads_through_pfc_config():
    """PFCConfig.easy_margin must reach the margin fn (VERDICT missing #3)."""
    from fr_tpu.heads.partial_fc import PFCConfig

    cfg = PFCConfig(num_classes=8, embedding_size=4, model_size=1,
                    easy_margin=True)
    # A negative target cosine takes the identity fallback under easy_margin
    # (would be target − sinmm under the hard margin).
    logits = jnp.array([[-0.5, 0.2]], jnp.float32)
    out = cfg.margin_fn()(logits, jnp.array([0]))
    np.testing.assert_allclose(float(out[0, 0]), -0.5 * cfg.s, rtol=1e-6)


def test_arcface_hard_margin_fallback():
    # cosθ below cos(π−m) must take the monotone fallback branch.
    logits = jnp.array([[-0.99, 0.5]], jnp.float32)
    labels = jnp.array([0])
    out = arcface(logits, labels, s=1.0, m=0.5)
    expected = -0.99 - np.sin(np.pi - 0.5) * 0.5
    np.testing.assert_allclose(float(out[0, 0]), expected, rtol=1e-6)
    # non-target column only scaled
    np.testing.assert_allclose(float(out[0, 1]), 0.5, rtol=1e-6)


def test_margin_skips_unowned_rows():
    logits = jnp.array([[0.3, 0.4]], jnp.float32)
    out = arcface(logits, jnp.array([-1]), s=2.0, m=0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(logits) * 2.0, rtol=1e-6)

"""Fused Pallas margin-softmax-CE kernel vs the jnp (XLA) path — forward and
gradients, dense and sharded (interpret mode on the CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fr_tpu.heads.partial_fc import PFCConfig, shard_softmax_ce
from fr_tpu.models.common import l2_normalize
from fr_tpu.ops.fused_pfc import fused_margin_softmax_ce


def _cfg(use_fused, margin="ArcFace", tiles=(8, 128)):
    return PFCConfig(num_classes=300, embedding_size=16, model_size=1,
                     sample_rate=1.0, margin=margin, s=30.0, m=0.35,
                     mixed_precision=False, optimizer="SGD",
                     use_fused=use_fused, fused_tiles=tiles)


@pytest.mark.parametrize("margin", ["ArcFace", "CosFace"])
@pytest.mark.parametrize("n,k", [(16, 300), (10, 130)])  # incl. ragged tiles
def test_fused_matches_jnp_dense(margin, n, k):
    rng = np.random.default_rng(0)
    emb = l2_normalize(jnp.asarray(
        rng.standard_normal((n, 16)).astype(np.float32)))
    w = jnp.asarray(0.05 * rng.standard_normal((k, 16)).astype(np.float32))
    labels = jnp.asarray(rng.integers(-1, k, n).astype(np.int32))
    col_valid = jnp.asarray(np.arange(k) < k - 3)  # 3 masked pad columns

    cfg_ref = _cfg(False, margin)
    cfg_fused = _cfg(True, margin)

    def loss_ref(e, ww):
        return shard_softmax_ce(cfg_ref, e, labels, ww, col_valid, None).mean()

    def loss_fused(e, ww):
        return fused_margin_softmax_ce(
            l2_normalize(e), l2_normalize(ww), labels, col_valid, cfg_fused,
            None, cfg_fused.fused_tiles).mean()

    lr_, (ge_r, gw_r) = jax.value_and_grad(loss_ref, argnums=(0, 1))(emb, w)
    lf_, (ge_f, gw_f) = jax.value_and_grad(loss_fused, argnums=(0, 1))(emb, w)

    np.testing.assert_allclose(float(lf_), float(lr_), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ge_f), np.asarray(ge_r),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_r),
                               rtol=2e-4, atol=1e-6)


def test_fused_train_step_matches_jnp_step():
    """Whole train step with use_fused=True equals the jnp-path step on a
    (2,4) mesh (covers the sharded psum/pmax glue and the custom VJP under
    shard_map)."""
    from fr_tpu.configs.base import Config
    from fr_tpu.parallel import make_mesh
    from fr_tpu.train.state import init_train_state
    from fr_tpu.train.step import make_train_step, shard_batch
    from test_train_step import TinyEncoder, NCLS, EMB, IMG

    conf = Config(network="Tiny", emd_size=EMB, n_classes=NCLS,
                  metric="ArcFace", loss_s=30.0, loss_m=0.35,
                  optimizer_name="SGD", optimizer="SGD", wd=5e-4, mom=0.9,
                  eps=1e-8, betas=(0.9, 0.999), mixed_precision=False,
                  sample_rate=0.5)
    rng = np.random.default_rng(1)
    weight = (0.01 * rng.standard_normal(
        (NCLS, EMB))).astype(np.float32)

    mesh = make_mesh(data=2, model=4)

    def build(use_fused):
        pfc = PFCConfig(NCLS, EMB, 4, 0.5, "ArcFace", 30.0, 0.35, False,
                        "SGD", use_fused=use_fused, fused_tiles=(8, 8))
        enc = TinyEncoder()
        state = init_train_state(jax.random.key(7), conf, enc, pfc, IMG)
        wp = np.zeros((pfc.num_classes_padded, EMB), np.float32)
        wp[:NCLS] = weight
        state = state.replace(pfc=state.pfc.replace(weight=jnp.asarray(wp)))
        return state, make_train_step(conf, mesh, enc, pfc, donate=False)

    x = rng.standard_normal((16, IMG, IMG, 3)).astype(np.float32)
    y = rng.integers(0, NCLS, 16).astype(np.int32)
    xs, ys = shard_batch(mesh, x, y)
    key = jax.random.key(2)

    s_ref, step_ref = build(False)
    s_fused, step_fused = build(True)
    s_ref, m_ref = step_ref(s_ref, xs, ys, 0.05, key)
    s_fused, m_fused = step_fused(s_fused, xs, ys, 0.05, key)

    np.testing.assert_allclose(float(m_fused["loss"]), float(m_ref["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_fused["grad_norm"]),
                               float(m_ref["grad_norm"]), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(s_fused.pfc.weight),
                               np.asarray(s_ref.pfc.weight),
                               rtol=2e-4, atol=1e-6)
    for a, b in zip(jax.tree.leaves(s_fused.params),
                    jax.tree.leaves(s_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)

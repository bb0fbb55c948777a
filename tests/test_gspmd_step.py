"""GSPMD (pjit) train step vs the shard_map step: identical math and
sampling RNG → identical results when every device sees the same local batch
(then sync-BN == local-BN)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fr_tpu.parallel import make_mesh
from fr_tpu.train.state import init_train_state
from fr_tpu.train.step import make_gspmd_train_step, make_train_step, shard_batch
from test_train_step import TinyEncoder, NCLS, EMB, IMG, _conf, _pfc_cfg


@pytest.mark.parametrize("optimizer,sample_rate", [("SGD", 1.0),
                                                   ("SGD", 0.5),
                                                   ("AdamW", 0.5)])
def test_gspmd_matches_shard_map(optimizer, sample_rate):
    conf = _conf(optimizer, sample_rate=sample_rate)
    rng = np.random.default_rng(0)
    weight = (0.01 * rng.standard_normal((NCLS, EMB))).astype(np.float32)

    mesh = make_mesh(data=2, model=4)
    pfc = _pfc_cfg(conf, 4)
    enc = TinyEncoder()

    def fresh_state():
        st = init_train_state(jax.random.key(7), conf, enc, pfc, IMG)
        wp = np.zeros((pfc.num_classes_padded, EMB), np.float32)
        wp[:NCLS] = weight
        return st.replace(pfc=st.pfc.replace(weight=jnp.asarray(wp)))

    b_loc = 2
    x = rng.standard_normal((b_loc, IMG, IMG, 3)).astype(np.float32)
    y = rng.integers(0, NCLS, b_loc).astype(np.int32)
    xg = np.tile(x, (8, 1, 1, 1))
    yg = np.tile(y, 8)
    xs, ys = shard_batch(mesh, xg, yg)
    key = jax.random.key(3)

    sm = make_train_step(conf, mesh, enc, pfc, donate=False)
    gs = make_gspmd_train_step(conf, mesh, enc, pfc, donate=False)

    s1, m1 = sm(fresh_state(), xs, ys, 0.05, key)
    s2, m2 = gs(fresh_state(), xs, ys, 0.05, key)

    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]),
                               rtol=2e-5)
    np.testing.assert_allclose(float(m2["grad_norm"]), float(m1["grad_norm"]),
                               rtol=2e-4)
    np.testing.assert_allclose(np.asarray(s2.pfc.weight)[:NCLS],
                               np.asarray(s1.pfc.weight)[:NCLS],
                               rtol=2e-4, atol=2e-6)
    for a, b in zip(jax.tree.leaves(s2.params), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_gspmd_descends_on_sharded_batch():
    conf = _conf("SGD", sample_rate=0.5)
    rng = np.random.default_rng(1)
    mesh = make_mesh(data=2, model=4)
    pfc = _pfc_cfg(conf, 4)
    enc = TinyEncoder()
    state = init_train_state(jax.random.key(0), conf, enc, pfc, IMG)
    step = make_gspmd_train_step(conf, mesh, enc, pfc, donate=False)
    x = rng.standard_normal((16, IMG, IMG, 3)).astype(np.float32)
    y = rng.integers(0, NCLS, 16).astype(np.int32)
    xs, ys = shard_batch(mesh, x, y)
    losses = []
    for _ in range(10):
        state, m = step(state, xs, ys, 0.5, jax.random.key(2))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] and np.isfinite(losses).all()

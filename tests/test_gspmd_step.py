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


def test_gspmd_sampler_vmap_matches_loop_and_emits_one_rng_program():
    """The GSPMD sampler vmaps fold_in over shard indices (VERDICT round-2
    #7): values must equal the per-shard Python loop exactly, and the jaxpr
    must hold ONE RNG program regardless of mesh size."""
    import re

    k0 = jax.random.key(42)
    nl = 64

    def vmapped(M):
        return jax.vmap(lambda m: jax.random.uniform(
            jax.random.fold_in(k0, m), (nl,)))(jnp.arange(M))

    for M in (2, 8):
        loop = jnp.stack([jax.random.uniform(jax.random.fold_in(k0, m), (nl,))
                          for m in range(M)])
        np.testing.assert_array_equal(np.asarray(vmapped(M)),
                                      np.asarray(loop))

    def n_rng_eqns(M):
        s = str(jax.make_jaxpr(lambda: vmapped(M))())
        return len(re.findall(r"threefry|random_bits|rng_bit", s))

    assert n_rng_eqns(2) == n_rng_eqns(32)


def test_embed_global_batch_pads_ragged_tail():
    """embed_global_batch pads the flat batch to the device count and cuts
    the result back (multi-host eval path, VERDICT round-2 #5; single-process
    here — the 2-process path is exercised by tests/test_multihost.py)."""
    from fr_tpu.train.step import embed_global_batch

    mesh = make_mesh(data=4, model=2)
    calls = []

    def fake_embed(params, batch_stats, xs):
        calls.append(xs.shape)
        return jnp.sum(xs, axis=(1, 2, 3), keepdims=False)[:, None] * jnp.ones((1, 4))

    flat = np.random.default_rng(0).standard_normal((10, 4, 4, 3)).astype(np.float32)
    out = embed_global_batch(mesh, fake_embed, None, None, flat)
    assert out.shape == (10, 4)
    assert calls[0][0] % mesh.devices.size == 0 and calls[0][0] >= 10
    expect = flat.sum(axis=(1, 2, 3))[:, None] * np.ones((1, 4))
    np.testing.assert_allclose(out, expect, rtol=1e-4)

"""Checkpointing: orbax full-state save/restore with exact resume, encoder
export/import round-trip, and reference .pth import."""

import numpy as np
import pytest

from conftest import add_reference_to_path, reference_available

import jax
import jax.numpy as jnp

from fr_tpu.ckpt import (
    export_encoder, latest_step, load_encoder, restore_train_state,
    save_train_state,
)
from fr_tpu.configs.base import Config
from fr_tpu.heads.partial_fc import PFCConfig
from fr_tpu.parallel import make_mesh
from fr_tpu.train.state import init_train_state
from fr_tpu.train.step import make_train_step, shard_batch
from test_train_step import TinyEncoder, NCLS, EMB, IMG, _conf, _pfc_cfg


def test_full_state_roundtrip_and_resume(tmp_path):
    conf = _conf("SGD", sample_rate=0.5)
    mesh = make_mesh(data=2, model=4)
    pfc = _pfc_cfg(conf, 4)
    enc = TinyEncoder()
    state = init_train_state(jax.random.key(0), conf, enc, pfc, IMG)
    step = make_train_step(conf, mesh, enc, pfc, donate=False)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((16, IMG, IMG, 3)).astype(np.float32)
    y = rng.integers(0, NCLS, 16).astype(np.int32)
    xs, ys = shard_batch(mesh, x, y)
    key = jax.random.key(1)

    # 3 steps, checkpoint, 2 more steps → must equal restore + same 2 steps
    for _ in range(3):
        state, _ = step(state, xs, ys, 0.05, key)
    save_train_state(str(tmp_path), state, 3)
    assert latest_step(str(tmp_path)) == 3

    cont = state
    for _ in range(2):
        cont, m_direct = step(cont, xs, ys, 0.05, key)

    restored = restore_train_state(str(tmp_path), state)
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for _ in range(2):
        restored, m_resumed = step(restored, xs, ys, 0.05, key)

    np.testing.assert_allclose(float(m_resumed["loss"]),
                               float(m_direct["loss"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(cont.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(restored.pfc.weight),
                                  np.asarray(cont.pfc.weight))


def test_restore_migrates_sample_block_padding(tmp_path):
    """A checkpoint saved under one sample_block can be restored under
    another: num_classes_padded scales with sample_block (ADVICE r3), so the
    pfc head tables differ only in their masked/unsampled padding tail —
    restore_train_state pads/truncates that tail instead of failing."""
    conf = _conf("SGD", sample_rate=0.5)
    mesh = make_mesh(data=2, model=4)
    enc = TinyEncoder()

    pfc1 = _pfc_cfg(conf, 4)                       # sample_block=1: pad 40
    state1 = init_train_state(jax.random.key(0), conf, enc, pfc1, IMG)
    step1 = make_train_step(conf, mesh, enc, pfc1, donate=False)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((16, IMG, IMG, 3)).astype(np.float32)
    y = rng.integers(0, NCLS, 16).astype(np.int32)
    xs, ys = shard_batch(mesh, x, y)
    for _ in range(3):
        state1, _ = step1(state1, xs, ys, 0.05, jax.random.key(1))
    save_train_state(str(tmp_path), state1, 3)

    import dataclasses
    pfc4 = dataclasses.replace(_pfc_cfg(conf, 4), sample_block=4)  # pad 48
    assert pfc4.num_classes_padded != pfc1.num_classes_padded
    state4 = init_train_state(jax.random.key(9), conf, enc, pfc4, IMG)
    step4 = make_train_step(conf, mesh, enc, pfc4, donate=False)
    # one step so the abstract state carries the step's mesh shardings
    state4, _ = step4(state4, xs, ys, 0.05, jax.random.key(2))
    restored = restore_train_state(str(tmp_path), state4)
    assert restored.pfc.weight.shape == state4.pfc.weight.shape
    # every real class row survives bit-exactly; the new tail is zeros
    np.testing.assert_array_equal(np.asarray(restored.pfc.weight)[:NCLS],
                                  np.asarray(state1.pfc.weight)[:NCLS])
    np.testing.assert_array_equal(
        np.asarray(restored.pfc.weight)[pfc1.num_classes_padded:], 0.0)
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(state1.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the migrated state trains (finite loss) under the new sample_block
    restored, m = step4(restored, xs, ys, 0.05, jax.random.key(2))
    assert np.isfinite(float(m["loss"]))

    # truncation direction: block=4 checkpoint back into a block=1 state
    save_train_state(str(tmp_path / "b4"), restored, 4)
    back = restore_train_state(str(tmp_path / "b4"),
                               init_train_state(jax.random.key(3), conf,
                                                enc, pfc1, IMG))
    np.testing.assert_array_equal(np.asarray(back.pfc.weight)[:NCLS],
                                  np.asarray(restored.pfc.weight)[:NCLS])

    # non-pfc mismatches still fail loudly
    from fr_tpu.ckpt.checkpoint import _migrate_pfc_padding
    bad = jax.tree.map(np.asarray, state1)
    bad = bad.replace(params=jax.tree.map(
        lambda a: np.zeros((a.shape[0] + 1,) + a.shape[1:], a.dtype)
        if a.ndim else a, bad.params))
    with pytest.raises(ValueError, match="shape mismatch"):
        from flax import serialization
        _migrate_pfc_padding(serialization.to_state_dict(bad), state1)


def test_encoder_export_import_roundtrip(tmp_path):
    from fr_tpu.models.resnet import build_resnet
    conf = Config(network="ResNet18", emd_size=64, mixed_precision=False)
    enc = build_resnet(conf)
    v = enc.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), train=False)
    path = str(tmp_path / "5_epoch_encoder.npz")
    export_encoder(path, jax.tree.map(np.asarray, v["params"]),
                   jax.tree.map(np.asarray, v["batch_stats"]), 5, "ResNet18")
    params, stats, meta = load_encoder(path, "ResNet18")
    assert meta == {"epoch": 5, "name": "ResNet18"}
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(v["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(stats), jax.tree.leaves(v["batch_stats"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_reference_pth_import(tmp_path):
    """Load a reference-format `{epoch}_epoch_encoder.pth` (incl. the DDP
    'module.' prefix, reference model/FR_PartialFC.py:76-90)."""
    add_reference_to_path()
    import torch
    from nets.resnet import ResNet18 as RefResNet18

    torch.manual_seed(0)
    ref = RefResNet18(Config(emd_size=512))
    sd = {f"module.{k}": v for k, v in ref.state_dict().items()}
    path = str(tmp_path / "100_epoch_encoder.pth")
    torch.save({"model_state_dict": sd, "epoch": 100, "name": "ResNet18"},
               path)

    params, stats, meta = load_encoder(path, "ResNet18")
    # spot-check: stem conv kernel transferred and transposed
    k = np.asarray(params["Conv_0"]["Conv_0"]["kernel"])
    ref_k = ref.state_dict()["conv1.weight"].numpy()
    np.testing.assert_array_equal(k, np.transpose(ref_k, (2, 3, 1, 0)))

"""shard_map train step: multi-device vs single-device numerical equivalence,
sampling path, and loss descent — on the 8-virtual-CPU-device mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from fr_tpu.configs.base import Config
from fr_tpu.heads.partial_fc import PFCConfig, dense_partial_fc_loss
from fr_tpu.models.common import BatchNorm, Conv, Dense
from fr_tpu.parallel.mesh import make_mesh
from fr_tpu.train.state import init_train_state
from fr_tpu.train.step import make_train_step, shard_batch

EMB = 16
NCLS = 37
IMG = 8


class TinyEncoder(nn.Module):
    """Small conv encoder with BN so batch-stat plumbing is exercised."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(8, kernel=3, stride=2)(x)
        x = BatchNorm()(x, use_running_average=not train)
        x = nn.relu(x)
        x = x.mean(axis=(1, 2))
        return Dense(EMB)(x)


def _conf(optimizer="SGD", sample_rate=1.0):
    conf = Config(
        network="Tiny", emd_size=EMB, n_classes=NCLS, metric="ArcFace",
        loss_s=30.0, loss_m=0.35, optimizer_name=optimizer, optimizer=optimizer,
        wd=5e-4, mom=0.9, eps=1e-8, betas=(0.9, 0.999),
        mixed_precision=False, sample_rate=sample_rate,
    )
    return conf


def _pfc_cfg(conf, model_size):
    return PFCConfig(
        num_classes=conf.n_classes, embedding_size=conf.emd_size,
        model_size=model_size, sample_rate=conf.sample_rate,
        margin=conf.metric, s=conf.loss_s, m=conf.loss_m,
        mixed_precision=conf.mixed_precision, optimizer=conf.optimizer_name)


def _make(conf, data, model, weight):
    mesh = make_mesh(data=data, model=model,
                     devices=jax.devices()[: data * model])
    pfc_cfg = _pfc_cfg(conf, model)
    enc = TinyEncoder()
    state = init_train_state(jax.random.key(7), conf, enc, pfc_cfg, IMG)
    w_pad = np.zeros((pfc_cfg.num_classes_padded, EMB), np.float32)
    w_pad[:NCLS] = weight
    state = state.replace(pfc=state.pfc.replace(
        weight=jnp.asarray(w_pad),
        slots=jax.tree.map(jnp.zeros_like, state.pfc.slots)))
    step = make_train_step(conf, mesh, enc, pfc_cfg, donate=False)
    return mesh, pfc_cfg, state, step


@pytest.mark.parametrize("optimizer", ["SGD", "AdamW"])
@pytest.mark.parametrize("data,model", [(1, 8), (2, 4), (8, 1)])
def test_multidevice_step_matches_single_device(optimizer, data, model):
    """Full train step on (data×model) mesh == single-device step when every
    device sees the same local batch (local BN stats then coincide)."""
    conf = _conf(optimizer)
    rng = np.random.default_rng(0)
    weight = (0.01 * rng.standard_normal((NCLS, EMB))).astype(np.float32)
    b_loc = 4
    x = rng.standard_normal((b_loc, IMG, IMG, 3)).astype(np.float32)
    y = rng.integers(0, NCLS, b_loc).astype(np.int32)

    _, _, state1, step1 = _make(conf, 1, 1, weight)
    mesh, _, stateN, stepN = _make(conf, data, model, weight)

    n_dev = data * model
    key = jax.random.key(3)
    s1, m1 = step1(state1, jnp.asarray(x), jnp.asarray(y), 0.05, key)
    xN, yN = shard_batch(mesh, np.tile(x, (n_dev, 1, 1, 1)), np.tile(y, n_dev))
    sN, mN = stepN(stateN, xN, yN, 0.05, key)

    np.testing.assert_allclose(float(m1["loss"]), float(mN["loss"]),
                               rtol=2e-5)
    # unclipped gradient norm is scale-sensitive: catches any grad
    # over/under-counting that parameter comparisons can mask via clipping
    np.testing.assert_allclose(float(m1["grad_norm"]), float(mN["grad_norm"]),
                               rtol=2e-4)
    for p1, pN in zip(jax.tree.leaves(s1.params), jax.tree.leaves(sN.params)):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(pN),
                                   rtol=2e-4, atol=2e-6)
    # head weight: compare real (non-pad) rows
    w1 = np.asarray(s1.pfc.weight)[:NCLS]
    wN = np.asarray(sN.pfc.weight)[:NCLS]
    np.testing.assert_allclose(w1, wN, rtol=2e-4, atol=2e-6)
    for b1, bN in zip(jax.tree.leaves(s1.batch_stats),
                      jax.tree.leaves(sN.batch_stats)):
        np.testing.assert_allclose(np.asarray(b1), np.asarray(bN),
                                   rtol=2e-4, atol=2e-6)


def test_loss_matches_dense_oracle():
    """The sharded full-softmax loss equals the dense single-device oracle on
    a genuinely sharded (non-replicated) batch."""
    conf = _conf("SGD")
    rng = np.random.default_rng(1)
    weight = (0.01 * rng.standard_normal((NCLS, EMB))).astype(np.float32)
    mesh, pfc_cfg, state, step = _make(conf, 2, 4, weight)

    n_dev = 8
    bs = 2 * n_dev
    x = rng.standard_normal((bs, IMG, IMG, 3)).astype(np.float32)
    y = rng.integers(0, NCLS, bs).astype(np.int32)

    # oracle: dense loss with the same local-BN forward. Each device holds 2
    # samples; local BN stats = per-2-sample stats. Emulate by running the
    # encoder per shard.
    enc = TinyEncoder()
    embs = []
    for d in range(n_dev):
        xb = x[2 * d: 2 * d + 2]
        emb, _ = enc.apply({"params": state.params,
                            "batch_stats": state.batch_stats},
                           jnp.asarray(xb), train=True, mutable=["batch_stats"])
        embs.append(np.asarray(emb))
    emb_all = jnp.asarray(np.concatenate(embs))
    cfg_dense = PFCConfig(
        num_classes=NCLS, embedding_size=EMB, model_size=1, sample_rate=1.0,
        margin="ArcFace", s=30.0, m=0.35, mixed_precision=False,
        optimizer="SGD")
    oracle = float(dense_partial_fc_loss(
        cfg_dense, emb_all, jnp.asarray(y),
        state.pfc.weight[:NCLS]))

    xN, yN = shard_batch(mesh, x, y)
    _, metrics = step(state, xN, yN, 0.05, jax.random.key(0))
    np.testing.assert_allclose(float(metrics["loss"]), oracle, rtol=2e-5)


def test_sampled_training_descends():
    """sample_rate < 1: loss decreases over steps and non-positive class rows
    outside any sampled set stay untouched."""
    conf = _conf("SGD", sample_rate=0.4)
    rng = np.random.default_rng(2)
    weight = (0.01 * rng.standard_normal((NCLS, EMB))).astype(np.float32)
    mesh, pfc_cfg, state, step = _make(conf, 2, 4, weight)
    assert pfc_cfg.sampling

    bs = 16
    x = rng.standard_normal((bs, IMG, IMG, 3)).astype(np.float32)
    y = rng.integers(0, NCLS, bs).astype(np.int32)
    xN, yN = shard_batch(mesh, x, y)

    losses = []
    for i in range(12):
        state, metrics = step(state, xN, yN, 0.5, jax.random.key(9))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_sampled_step_grads_match_dense_oracle():
    """One sampled SGD step's head-weight delta equals a dense-oracle SGD step
    over the same sampled columns (white-box: replicates the step's RNG)."""
    import jax.numpy as jnp
    from jax import lax
    from fr_tpu.heads.partial_fc import (
        sample_columns, shard_valid_mask, shard_softmax_ce)
    from fr_tpu.models.common import l2_normalize

    conf = _conf("SGD", sample_rate=0.4)
    rng = np.random.default_rng(5)
    weight = (0.01 * rng.standard_normal((NCLS, EMB))).astype(np.float32)
    data, model = 2, 4
    mesh, pfc_cfg, state, step = _make(conf, data, model, weight)

    bs = 16
    x = rng.standard_normal((bs, IMG, IMG, 3)).astype(np.float32)
    y = rng.integers(0, NCLS, bs).astype(np.int32)
    xN, yN = shard_batch(mesh, x, y)
    key = jax.random.key(11)

    new_state, metrics = step(state, xN, yN, 0.05, key)

    # --- oracle: replicate sampling per shard, then dense loss over the
    # sampled global columns with the same local-BN embeddings.
    nl, ns = pfc_cfg.num_local, pfc_cfg.num_sample
    enc = TinyEncoder()
    embs = []
    b_loc = bs // (data * model)
    for d in range(data * model):
        xb = x[b_loc * d: b_loc * (d + 1)]
        emb, _ = enc.apply({"params": state.params,
                            "batch_stats": state.batch_stats},
                           jnp.asarray(xb), train=True, mutable=["batch_stats"])
        embs.append(np.asarray(emb))
    emb_all = l2_normalize(jnp.asarray(np.concatenate(embs)))

    from fr_tpu.train.step import STREAM_SAMPLE, stream_key
    k0 = stream_key(key, STREAM_SAMPLE, state.step)
    all_idx, all_cols, all_valid = [], [], []
    for m in range(model):
        valid = shard_valid_mask(pfc_cfg, m)
        loc = y - m * nl
        owned = (loc >= 0) & (loc < nl)
        pos = np.zeros(nl, bool)
        pos[loc[owned]] = True
        idx = np.asarray(sample_columns(
            pfc_cfg, jax.random.fold_in(k0, m), jnp.asarray(pos), valid))
        all_idx.append(idx + m * nl)
        all_valid.append(np.asarray(valid)[idx])
    gidx = np.concatenate(all_idx)
    col_valid = np.concatenate(all_valid)
    # global label → sampled-column position, or -1
    col_of = {int(g): i for i, g in enumerate(gidx)}
    label_cols = np.array([col_of.get(int(lab), -1) for lab in y], np.int32)

    w_pad = np.asarray(state.pfc.weight)
    w_act = w_pad[gidx]

    def oracle_loss(w_rows):
        per = shard_softmax_ce(pfc_cfg, emb_all, jnp.asarray(label_cols),
                               w_rows, jnp.asarray(col_valid), None)
        return per.mean()

    oloss, og = jax.value_and_grad(oracle_loss)(jnp.asarray(w_act))
    np.testing.assert_allclose(float(metrics["loss"]), float(oloss), rtol=2e-5)

    # oracle SGD row update
    og = np.asarray(og)
    new_rows = w_act - 0.05 * (og + conf.wd * w_act)  # zero momentum buffers
    expected = w_pad.copy()
    expected[gidx] = new_rows
    np.testing.assert_allclose(np.asarray(new_state.pfc.weight), expected,
                               rtol=2e-4, atol=1e-6)


def test_full_softmax_training_descends_adamw():
    conf = _conf("AdamW", sample_rate=1.0)
    rng = np.random.default_rng(3)
    weight = (0.01 * rng.standard_normal((NCLS, EMB))).astype(np.float32)
    mesh, _, state, step = _make(conf, 1, 8, weight)

    bs = 16
    x = rng.standard_normal((bs, IMG, IMG, 3)).astype(np.float32)
    y = rng.integers(0, NCLS, bs).astype(np.int32)
    xN, yN = shard_batch(mesh, x, y)
    losses = []
    for i in range(12):
        state, metrics = step(state, xN, yN, 1e-2, jax.random.key(4))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_spmd_auto_mode_picks_a_lowering(tmp_path, capsys):
    """--spmd_mode auto on a multi-device mesh: first training_step
    benchmarks both lowerings on the real batch, logs the decision, and
    training proceeds with the winner (VERDICT round-1 next #8)."""
    from fr_tpu.configs.base import Config
    from fr_tpu.parallel import make_mesh
    from fr_tpu.train.task import FaceRecognitionTask

    conf = Config(network="ResNet18", emd_size=32, n_classes=16,
                  metric="ArcFace", loss_s=30.0, loss_m=0.35, loss="PartialFC",
                  optimizer_name="SGD", optimizer="SGD", wd=5e-4, mom=0.9,
                  mixed_precision=False, sample_rate=1.0, img_size=32,
                  spmd_mode="auto", num_epoch=10, valid_freq=5,
                  train_dataset="synthetic", min_level=1, max_level=3,
                  b=16, lr=0.05, lr_scheduler="CosineAnnealingWarmupRestarts",
                  warmup_steps=5, min_lr=5e-5, gamma=1.0, cycle_mult=1.0)
    mesh = make_mesh(data=2, model=4)
    task = FaceRecognitionTask(conf, logger=None, stage="train", mesh=mesh,
                               augment=False)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((16, 32, 32, 3)).astype(np.float32)
    y = rng.integers(0, 16, 16).astype(np.int32)
    out1 = task.training_step((x, y))
    out2 = task.training_step((x, y))
    assert np.isfinite(float(np.asarray(out1["loss"])))
    assert np.isfinite(float(np.asarray(out2["loss"])))
    logged = capsys.readouterr().out
    assert "[spmd auto]" in logged and "-> using" in logged

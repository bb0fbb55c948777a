"""Block-aligned sampled-row kernels (fr_tpu/ops/sparse_rows.py) and the
sample_block>1 training path (VERDICT round-2 #1).

Kernel parity runs the REAL Pallas kernels under interpret mode against the
take/put oracle (the real Mosaic lowering is covered by scripts/tpu_smoke.py
and was measured bit-exact on v5e, scripts/sparse_rows_probe3.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fr_tpu.configs.base import Config
from fr_tpu.heads.partial_fc import PFCConfig, sample_groups
from fr_tpu.ops.sparse_rows import (expand_group_index, grouped_gather,
                                    grouped_update)
from fr_tpu.parallel import make_mesh
from fr_tpu.train.optim import pfc_row_update
from fr_tpu.train.state import init_train_state
from fr_tpu.train.step import make_train_step, shard_batch

D = 128


def _conf(optimizer="SGD"):
    return Config(network="ResNet18", emd_size=D, n_classes=100,
                  metric="ArcFace", loss_s=30.0, loss_m=0.35,
                  optimizer_name=optimizer, optimizer=optimizer,
                  wd=5e-4, mom=0.9, betas=(0.9, 0.999), eps=1e-8,
                  mixed_precision=False, img_size=16)


@pytest.mark.parametrize("block", [4, 8])
def test_grouped_gather_interpret_matches_take(block):
    rng = np.random.default_rng(0)
    c, ng = 64, 5
    table = jnp.asarray(rng.standard_normal((c, D)).astype(np.float32))
    gidx = jnp.asarray(np.sort(rng.choice(c // block, ng,
                                          replace=False)).astype(np.int32))
    got = grouped_gather(table, gidx, block, interpret=True)
    idx = expand_group_index(gidx, block)
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(jnp.take(table, idx, axis=0)))


@pytest.mark.parametrize("optimizer", ["SGD", "AdamW"])
@pytest.mark.parametrize("block", [4, 8])
def test_grouped_update_interpret_matches_put_rows(optimizer, block):
    """Update equivalence vs the put_rows path (the VERDICT #1 parity
    criterion): the Pallas in-place kernel must equal pfc_row_update's
    take→update→scatter for the identical expanded index set."""
    conf = _conf(optimizer)
    rng = np.random.default_rng(1)
    c, ng = 64, 5
    s = ng * block
    w = jnp.asarray(rng.standard_normal((c, D)).astype(np.float32))
    if optimizer == "SGD":
        slots = {"momentum": jnp.asarray(
            rng.standard_normal((c, D)).astype(np.float32))}
    else:
        slots = {"exp_avg": jnp.asarray(
            rng.standard_normal((c, D)).astype(np.float32)),
            "exp_avg_sq": jnp.asarray(
            np.abs(rng.standard_normal((c, D))).astype(np.float32))}
    gidx = jnp.asarray(np.sort(rng.choice(c // block, ng,
                                          replace=False)).astype(np.int32))
    g = jnp.asarray(rng.standard_normal((s, D)).astype(np.float32))
    lr = jnp.float32(0.05)
    count = jnp.asarray(3, jnp.int32)

    idx = expand_group_index(gidx, block)
    w_ref, slots_ref = pfc_row_update(optimizer, conf, w, slots, idx, g,
                                      lr, count)
    w_k, slots_k = grouped_update(optimizer, conf, w, slots, gidx, g, lr,
                                  count, block, interpret=True)
    # interpret mode on CPU differs by FMA contraction order (~2e-7); the
    # real Mosaic lowering measured bit-exact vs this oracle on v5e
    # (scripts/sparse_rows_probe3.py correctness pass)
    np.testing.assert_allclose(np.asarray(w_k), np.asarray(w_ref),
                               rtol=1e-5, atol=1e-6)
    for k in slots_ref:
        np.testing.assert_allclose(np.asarray(slots_k[k]),
                                   np.asarray(slots_ref[k]),
                                   rtol=1e-5, atol=1e-6)


def test_sample_groups_properties():
    """Positives' groups always sampled; indices sorted unique; padding-only
    groups never drawn; num_sample a whole number of groups."""
    cfg = PFCConfig(num_classes=100, embedding_size=D, model_size=1,
                    sample_rate=0.5, margin="ArcFace", s=30.0, m=0.35,
                    mixed_precision=False, optimizer="SGD", sample_block=8)
    assert cfg.num_classes_padded % 8 == 0
    assert cfg.num_sample % 8 == 0
    from fr_tpu.heads.partial_fc import shard_group_masks

    nl = cfg.num_local
    labels = jnp.asarray([0, 17, 55, 99], jnp.int32)
    loc = labels  # model_size=1 → class_start 0
    owned = (loc >= 0) & (loc < nl)
    gpos, gvalid = shard_group_masks(cfg, jnp.int32(0), loc, owned)
    # group masks match their row-granular definitions
    valid_rows = np.arange(nl) < cfg.num_classes
    np.testing.assert_array_equal(np.asarray(gvalid),
                                  valid_rows.reshape(-1, 8).any(1))
    pos_rows = np.zeros(nl, bool)
    pos_rows[np.asarray(labels)] = True
    np.testing.assert_array_equal(np.asarray(gpos),
                                  pos_rows.reshape(-1, 8).any(1))
    for seed in range(5):
        gidx = np.asarray(sample_groups(cfg, jax.random.key(seed), gpos,
                                        gvalid))
        assert gidx.shape == (cfg.num_sample_groups,)
        assert (np.diff(gidx) > 0).all()                 # sorted unique
        for lab in np.asarray(labels):
            assert lab // 8 in gidx                      # positive's group in
        # groups made only of padding rows are excluded
        assert np.asarray(gvalid)[gidx].all()


@pytest.mark.parametrize("optimizer", ["SGD", "AdamW"])
def test_block_sampled_training_descends(optimizer):
    """End-to-end train step with sample_block=4 on an (2,4) CPU mesh (the
    kernels take their jnp twins off-TPU; sampling/remap/update wiring is
    the real path)."""
    conf = _conf(optimizer)
    conf.sample_rate = 0.5
    cfg = PFCConfig(num_classes=conf.n_classes, embedding_size=D,
                    model_size=4, sample_rate=0.5, margin="ArcFace",
                    s=30.0, m=0.35, mixed_precision=False,
                    optimizer=optimizer, sample_block=4)
    assert cfg.sampling and cfg.sample_block == 4
    mesh = make_mesh(data=2, model=4)
    from fr_tpu.models import build_encoder
    enc = build_encoder(conf)
    state = init_train_state(jax.random.key(0), conf, enc, cfg, conf.img_size)
    step = make_train_step(conf, mesh, enc, cfg, donate=False)

    rng = np.random.default_rng(0)
    templates = rng.standard_normal(
        (conf.n_classes, conf.img_size, conf.img_size, 3)).astype(np.float32)
    losses = []
    for i in range(12):
        y = rng.integers(0, conf.n_classes, 16).astype(np.int32)
        x = (templates[y] + 0.1 * rng.standard_normal(
            (16, conf.img_size, conf.img_size, 3))).astype(np.float32)
        xs, ys = shard_batch(mesh, x, y)
        state, m = step(state, xs, ys, 0.01, jax.random.key(i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < losses[0]


def test_gspmd_matches_shard_map_block_sampling():
    """Both lowerings draw the identical grouped sample sets and produce the
    same loss/updates (same RNG stream; every device sees the same local
    batch so sync-BN == local BN)."""
    from fr_tpu.train.state import init_train_state as init_state
    from fr_tpu.train.step import make_gspmd_train_step

    conf = _conf("SGD")
    conf.sample_rate = 0.5
    cfg = PFCConfig(num_classes=conf.n_classes, embedding_size=D,
                    model_size=4, sample_rate=0.5, margin="ArcFace",
                    s=30.0, m=0.35, mixed_precision=False, optimizer="SGD",
                    sample_block=4)
    mesh = make_mesh(data=2, model=4)
    from fr_tpu.models import build_encoder
    enc = build_encoder(conf)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, conf.img_size, conf.img_size, 3)
                            ).astype(np.float32)
    y = rng.integers(0, conf.n_classes, 2).astype(np.int32)
    xg = np.tile(x, (8, 1, 1, 1))
    yg = np.tile(y, 8)
    xs, ys = shard_batch(mesh, xg, yg)

    results = []
    for builder in (make_train_step, make_gspmd_train_step):
        state = init_state(jax.random.key(7), conf, enc, cfg, conf.img_size)
        step = builder(conf, mesh, enc, cfg, donate=False)
        state, m = step(state, xs, ys, 0.05, jax.random.key(1))
        results.append((float(m["loss"]),
                        np.asarray(state.pfc.weight)))
    np.testing.assert_allclose(results[0][0], results[1][0], rtol=2e-5)
    np.testing.assert_allclose(results[0][1], results[1][1],
                               rtol=2e-4, atol=2e-6)


def test_block_sampling_matches_per_row_verification_accuracy():
    """Training quality under the block-sampled distribution: 40 steps from
    identical init on identical batches, block=2 vs the reference-exact
    per-row sampling, then the exact reference pair-verification procedure
    on both — accuracies must agree closely (the only semantic change is
    within-group negative correlation, ROUND3_NOTES.md)."""
    from fr_tpu.eval.verification import (pair_score, performance_acc,
                                          performance_roc)
    from fr_tpu.train.step import make_embed_step

    IMG, C, B, STEPS = 56, 32, 16, 40
    rng = np.random.default_rng(0)
    templates = rng.integers(0, 256, (C, IMG, IMG, 3)).astype(np.int32)

    def batch(i):
        r = np.random.default_rng(100 + i)
        y = r.integers(0, 16, B).astype(np.int32)   # within group capacity
        x = np.clip(templates[y] + r.integers(-70, 71, (B, IMG, IMG, 3)),
                    0, 255)
        return (x.astype(np.float32) / 255.0 - 0.5) / 0.5, y

    n_pairs = 400
    pr = np.random.default_rng(7)
    y1 = pr.integers(0, C, n_pairs)
    same = pr.integers(0, 2, n_pairs).astype(bool)
    y2 = np.where(same, y1, (y1 + 1 + pr.integers(0, C - 1, n_pairs)) % C)
    flat = np.empty((2 * n_pairs, IMG, IMG, 3), np.float32)
    flat[0::2] = (np.clip(templates[y1] + pr.integers(
        -70, 71, (n_pairs, IMG, IMG, 3)), 0, 255) / 255.0 - 0.5) / 0.5
    flat[1::2] = (np.clip(templates[y2] + pr.integers(
        -70, 71, (n_pairs, IMG, IMG, 3)), 0, 255) / 255.0 - 0.5) / 0.5

    accs = {}
    for block in (1, 2):
        conf = _conf("SGD")
        conf.n_classes = C
        conf.img_size = IMG
        conf.sample_rate = 0.75
        cfg = PFCConfig(num_classes=C, embedding_size=D, model_size=4,
                        sample_rate=0.75, margin="ArcFace", s=30.0, m=0.35,
                        mixed_precision=False, optimizer="SGD",
                        sample_block=block)
        assert cfg.sampling
        mesh = make_mesh(data=2, model=4)
        from fr_tpu.models import build_encoder
        enc = build_encoder(conf)
        state = init_train_state(jax.random.key(3), conf, enc, cfg, IMG)
        step = make_train_step(conf, mesh, enc, cfg, donate=False)
        for i in range(STEPS):
            x, y = batch(i)
            xs, ys = shard_batch(mesh, x, y)
            state, m = step(state, xs, ys, 0.05, jax.random.key(i))
        assert np.isfinite(float(m["loss"]))
        embed = make_embed_step(conf, mesh, enc)
        emb = np.asarray(embed(state.params, state.batch_stats,
                               jnp.asarray(flat)))
        hg, hi, scores = pair_score(emb[0::2], emb[1::2], same)
        _, eer_th = performance_roc(hg, hi, min_level=1, max_level=3)
        accs[block] = performance_acc(scores, same, eer_th)

    # both sampling distributions must learn comparably well
    assert accs[1] > 75.0 and accs[2] > 75.0, accs
    assert abs(accs[1] - accs[2]) <= 3.0, accs

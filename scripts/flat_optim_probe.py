"""Probe: flat-master-params optimizer path vs the per-leaf tree path.

VERDICT round-2 #3(b): the R100 step carries ~3.8 ms of ~600 per-param VMEM
staging copies plus 1.9 ms of optimizer update over 318 fused leaves.
Hypothesis: storing the f32 master params + momentum as ONE flat vector
(unravel views feed the encoder; grads re-flattened per step; clip +
SGD-momentum as single fused ops over 65 M elements) removes the per-leaf
fixed costs. This probe A/Bs the two step formulations on the real chip
with identical math (R100, C=86,690, r=0.3, b=256, bf16).

python scripts/flat_optim_probe.py [batch]
"""

import os
import sys
import time

import numpy as np

os.makedirs("/root/.jax_cache", exist_ok=True)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
from jax.flatten_util import ravel_pytree  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fr_tpu.configs import load_config  # noqa: E402
from fr_tpu.heads.partial_fc import (PFCConfig, remap_labels,  # noqa: E402
                                     sample_columns, shard_softmax_ce,
                                     shard_valid_mask)
from fr_tpu.models import build_encoder  # noqa: E402
from fr_tpu.models.common import l2_normalize  # noqa: E402
from fr_tpu.parallel import make_mesh  # noqa: E402
from fr_tpu.train import init_train_state, make_train_step  # noqa: E402
from fr_tpu.train.optim import pfc_row_update, take_rows  # noqa: E402
from fr_tpu.train.step import STREAM_DROPOUT, STREAM_SAMPLE, \
    shard_batch, stream_key  # noqa: E402


def timed(name, fn, state, xs, ys, lr, key, iters=20):
    state, m = fn(state, xs, ys, lr, key)
    float(np.asarray(m["loss"]))
    state, m = fn(state, xs, ys, lr, key)
    float(np.asarray(m["loss"]))
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = fn(state, xs, ys, lr, key)
    final = float(np.asarray(m["loss"]))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:40s} {dt:8.2f} ms/step   (loss {final:.4f})", flush=True)
    return dt


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    conf = load_config("ms1m_arcface_122", network="ResNet100")
    conf.n_classes = 86690
    conf.mixed_precision = True
    conf.sample_rate = 0.3
    mesh = make_mesh()
    pfc_cfg = PFCConfig(
        num_classes=conf.n_classes, embedding_size=conf.emd_size,
        model_size=1, sample_rate=0.3, margin=conf.metric, s=conf.loss_s,
        m=conf.loss_m, mixed_precision=True, optimizer="SGD")
    encoder = build_encoder(conf)
    state = jax.jit(lambda k: init_train_state(
        k, conf, encoder, pfc_cfg, conf.img_size))(jax.random.key(0))
    rng = np.random.default_rng(0)
    x = rng.standard_normal((batch, conf.img_size, conf.img_size, 3)
                            ).astype(np.float32)
    y = rng.integers(0, conf.n_classes, batch).astype(np.int32)
    xs, ys = shard_batch(mesh, x, y)
    key = jax.random.key(1)

    # snapshot BEFORE the baseline donates the buffers
    flat0, unravel = ravel_pytree(jax.device_get(state.params))
    print(f"flat master params: {flat0.size} elems "
          f"({flat0.size * 4 / 1e6:.0f} MB)", flush=True)

    # ---- baseline: the production step
    base = make_train_step(conf, mesh, encoder, pfc_cfg)
    timed("baseline tree-leaf optimizer", base, state, xs, ys,
          jnp.float32(0.05), key)

    # ---- flat variant
    num_local = pfc_cfg.num_local
    valid = shard_valid_mask(pfc_cfg, jnp.int32(0))

    def flat_step_impl(fstate, images, labels, lr, key):
        flatp, mom_flat, batch_stats, pfc, step_no = fstate
        k_drop = stream_key(key, STREAM_DROPOUT, step_no, 0)
        loc = labels
        owned = (loc >= 0) & (loc < num_local)
        pos = jnp.zeros((num_local,), jnp.int32).at[
            jnp.where(owned, loc, 0)].max(owned.astype(jnp.int32)) > 0
        k = stream_key(key, STREAM_SAMPLE, step_no, 0)
        idx = sample_columns(pfc_cfg, k, pos, valid)
        col_valid = valid[idx]
        w_rows = take_rows(pfc["weight"], idx)
        label_cols = remap_labels(pfc_cfg, idx, loc, owned)

        def loss_fn(fp, w_act):
            params = unravel(fp)
            emb, updates = encoder.apply(
                {"params": params, "batch_stats": batch_stats},
                images, train=True, mutable=["batch_stats"],
                rngs={"dropout": k_drop})
            emb = l2_normalize(emb.astype(jnp.float32))
            per = shard_softmax_ce(pfc_cfg, emb, label_cols, w_act,
                                   col_valid, None)
            return per.mean(), updates.get("batch_stats", {})

        (loss, new_bs), (gflat, g_rows) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(flatp, w_rows)

        # clip-5 + SGD-momentum on the flat vectors (torch semantics)
        total = jnp.sqrt(jnp.sum(jnp.square(gflat)))
        coef = jnp.minimum(5.0 / (total + 1e-6), 1.0)
        g = gflat * coef + conf.wd * flatp
        mom2 = conf.mom * mom_flat + g
        new_flat = flatp - lr * mom2

        new_w, new_slots = pfc_row_update(
            "SGD", conf, pfc["weight"], {"momentum": pfc["momentum"]}, idx,
            g_rows, lr, step_no + 1)
        return ((new_flat, mom2, new_bs,
                 {"weight": new_w, "momentum": new_slots["momentum"]},
                 step_no + 1),
                {"loss": loss})

    flat_jit = jax.jit(flat_step_impl, donate_argnums=(0,))

    # fresh state: the baseline run above donated (and thus deleted) the
    # original buffers
    state = jax.jit(lambda k: init_train_state(
        k, conf, encoder, pfc_cfg, conf.img_size))(jax.random.key(0))
    fstate = (jnp.asarray(flat0), jnp.zeros_like(flat0), state.batch_stats,
              {"weight": state.pfc.weight,
               "momentum": state.pfc.slots["momentum"]},
              jnp.zeros((), jnp.int32))
    timed("flat master params optimizer", flat_jit, fstate, xs, ys,
          jnp.float32(0.05), key)


if __name__ == "__main__":
    main()

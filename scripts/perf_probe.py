"""Roofline-gap probe: time the pieces of the R100 train step on the chip.

Times (value-fetch synchronised):
  1. encoder forward only
  2. encoder forward + backward (grads wrt params)
  3. head loss fwd+bwd at the bench class count
  4. optimizer (clip + SGD over all leaves)
  5. the full train step
and prints achieved TFLOPs vs the analytic cost for 1/2/5.

Usage: python scripts/perf_probe.py [batch] (from /root/repo; real TPU)
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fr_tpu.configs import load_config  # noqa: E402
from fr_tpu.heads.partial_fc import PFCConfig  # noqa: E402
from fr_tpu.models import build_encoder  # noqa: E402
from fr_tpu.models.common import l2_normalize  # noqa: E402
from fr_tpu.parallel import make_mesh  # noqa: E402
from fr_tpu.train import init_train_state, make_train_step  # noqa: E402
from fr_tpu.train.step import shard_batch  # noqa: E402
from fr_tpu.utils.flops import count_flops  # noqa: E402


def fetch(out):
    """Sync by VALUE FETCH of one scalar-ish leaf (block_until_ready returns
    early on the axon runtime)."""
    leaf = jax.tree.leaves(out)[0]
    return np.asarray(leaf).ravel()[0]


def timeit(fn, n=10):
    fetch(fn())
    fetch(fn())
    t0 = time.perf_counter()
    for _ in range(n - 1):
        fn()
    fetch(fn())
    return (time.perf_counter() - t0) / n


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    network = os.environ.get("PROBE_NETWORK", "ResNet100")
    n_classes = int(os.environ.get("PROBE_CLASSES", "86690"))

    conf = load_config("ms1m_arcface_122", network=network)
    conf.n_classes = n_classes
    conf.mixed_precision = True
    conf.sample_rate = 0.3

    mesh = make_mesh()
    pfc_cfg = PFCConfig(
        num_classes=n_classes, embedding_size=conf.emd_size,
        model_size=1, sample_rate=0.3, margin=conf.metric, s=conf.loss_s,
        m=conf.loss_m, mixed_precision=True, optimizer=conf.optimizer_name)

    encoder = build_encoder(conf)
    state = jax.jit(lambda k: init_train_state(
        k, conf, encoder, pfc_cfg, conf.img_size))(jax.random.key(0))
    rng = np.random.default_rng(0)
    x = rng.standard_normal((batch, conf.img_size, conf.img_size, 3)
                            ).astype(np.float32)
    y = rng.integers(0, n_classes, batch).astype(np.int32)
    xs, ys = shard_batch(mesh, x, y)

    params, stats = state.params, state.batch_stats
    fwd_flops = count_flops(
        lambda p, b, im: encoder.apply({"params": p, "batch_stats": b},
                                       im, train=False), params, stats, xs)
    print(f"analytic encoder fwd flops/step: {fwd_flops/1e12:.3f} TF")

    # 1. forward only (train-mode BN, like the step)
    @jax.jit
    def fwd(p, b, im):
        out, _ = encoder.apply({"params": p, "batch_stats": b}, im,
                               train=True, mutable=["batch_stats"])
        return jnp.sum(l2_normalize(out.astype(jnp.float32)))

    t = timeit(lambda: fwd(params, stats, xs))
    print(f"fwd: {t*1e3:8.2f} ms  {fwd_flops/t/1e12:6.1f} TF/s")

    # 2. forward+backward (sum-of-embeddings scalar loss: pure encoder cost)
    @jax.jit
    def fwdbwd(p, b, im):
        def loss(p_):
            out, _ = encoder.apply({"params": p_, "batch_stats": b}, im,
                                   train=True, mutable=["batch_stats"])
            return jnp.sum(l2_normalize(out.astype(jnp.float32)))
        l, g = jax.value_and_grad(loss)(p)
        # consume the grads so the backward is not dead-code-eliminated
        gsum = sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(g))
        return l + 0.0 * gsum

    t2 = timeit(lambda: fwdbwd(params, stats, xs))
    print(f"fwd+bwd: {t2*1e3:8.2f} ms  {3*fwd_flops/t2/1e12:6.1f} TF/s "
          f"(bwd-only {(t2-t)*1e3:.2f} ms, {2*fwd_flops/(t2-t)/1e12:.1f} TF/s)")

    # 3. head only: loss fwd+bwd on fixed embeddings
    emb = jnp.asarray(rng.standard_normal((batch, conf.emd_size)),
                      jnp.float32)
    from fr_tpu.heads.partial_fc import (remap_labels, sample_columns,
                                         shard_softmax_ce, shard_valid_mask)
    from fr_tpu.train.optim import take_rows
    valid = shard_valid_mask(pfc_cfg, 0)

    @jax.jit
    def head(w, e, lab, key):
        pos = jnp.zeros((pfc_cfg.num_local,), jnp.int32).at[
            jnp.where(lab < pfc_cfg.num_local, lab, 0)].max(1) > 0
        idx = sample_columns(pfc_cfg, key, pos, valid)
        cols = remap_labels(pfc_cfg, idx, lab, lab >= 0)

        def loss(w_):
            rows = take_rows(w_, idx)
            return shard_softmax_ce(pfc_cfg, e, cols, rows,
                                    valid[idx], None).mean()
        l, g = jax.value_and_grad(loss)(w)
        return l + 0.0 * jnp.sum(g)

    w = state.pfc.weight
    t3 = timeit(lambda: head(w, emb, ys, jax.random.key(2)))
    print(f"head fwd+bwd+sample: {t3*1e3:8.2f} ms")

    # 4. optimizer only
    from fr_tpu.train.optim import clip_by_global_norm, encoder_update

    @jax.jit
    def optim(p, slots):
        g = jax.tree.map(lambda a: a * 1e-3, p)
        g, gn = clip_by_global_norm(g, 5.0)
        newp, news = encoder_update("SGD", conf, p, g, slots,
                                    jnp.float32(0.05), jnp.int32(1))
        return newp, news

    t4 = timeit(lambda: optim(params, state.opt_slots))
    print(f"optimizer(clip+sgd {len(jax.tree.leaves(params))} leaves):"
          f" {t4*1e3:8.2f} ms")

    # 5. full step
    step = make_train_step(conf, mesh, encoder, pfc_cfg, donate=False)
    key = jax.random.key(1)

    def run():
        s2, m = step(state, xs, ys, jnp.float32(0.05), key)
        return m["loss"]

    t5 = timeit(run)
    print(f"full step: {t5*1e3:8.2f} ms  "
          f"({batch/t5:.0f} imgs/s, {3*fwd_flops/t5/1e12:.1f} enc-TF/s)")
    print(f"unaccounted (step - fwdbwd - head - opt): "
          f"{(t5-t2-t3-t4)*1e3:.2f} ms")


if __name__ == "__main__":
    main()

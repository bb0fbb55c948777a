"""Dispatch-overhead probe: the SAME train step executed (a) one dispatch per
step from Python, vs (b) lax.scan over K device-staged batches inside one
jit. The difference isolates per-dispatch overhead (tunnel RPC + host work)
from true device step time — and (b) is itself the candidate optimization:
multi-step dispatch amortizes host overhead to zero.

    python scripts/scan_probe.py [batch] [K]
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
from jax import lax  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fr_tpu.configs import load_config  # noqa: E402
from fr_tpu.heads.partial_fc import PFCConfig  # noqa: E402
from fr_tpu.models import build_encoder  # noqa: E402
from fr_tpu.parallel import make_mesh  # noqa: E402
from fr_tpu.train import init_train_state, make_train_step  # noqa: E402
from fr_tpu.train.step import shard_batch  # noqa: E402


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_classes = 86690

    conf = load_config("ms1m_arcface_122", network="ResNet100")
    conf.n_classes = n_classes
    conf.mixed_precision = True
    conf.sample_rate = 0.3
    mesh = make_mesh()
    pfc_cfg = PFCConfig(
        num_classes=n_classes, embedding_size=conf.emd_size, model_size=1,
        sample_rate=0.3, margin=conf.metric, s=conf.loss_s, m=conf.loss_m,
        mixed_precision=True, optimizer=conf.optimizer_name)
    encoder = build_encoder(conf)
    state = jax.jit(lambda k: init_train_state(
        k, conf, encoder, pfc_cfg, conf.img_size))(jax.random.key(0))

    rng = np.random.default_rng(0)
    x = rng.standard_normal((batch, conf.img_size, conf.img_size, 3)
                            ).astype(np.float32)
    y = rng.integers(0, n_classes, batch).astype(np.int32)
    xs, ys = shard_batch(mesh, x, y)

    # (a) per-step dispatch (the current bench loop)
    step = make_train_step(conf, mesh, encoder, pfc_cfg, donate=False)
    key = jax.random.key(1)
    lr = jnp.float32(0.05)
    _, m = step(state, xs, ys, lr, key)
    float(np.asarray(m["loss"]))
    _, m = step(state, xs, ys, lr, key)
    float(np.asarray(m["loss"]))
    n = 20
    t0 = time.perf_counter()
    for _ in range(n - 1):
        _, m = step(state, xs, ys, lr, key)
    _, m = step(state, xs, ys, lr, key)
    float(np.asarray(m["loss"]))
    ta = (time.perf_counter() - t0) / n
    print(f"per-step dispatch: {ta*1e3:8.2f} ms/step "
          f"({batch/ta:.0f} imgs/s)")

    # (b) lax.scan over K staged batches in ONE dispatch
    body = step.device_body

    xs_k = jnp.broadcast_to(xs, (K,) + xs.shape)
    ys_k = jnp.broadcast_to(ys, (K,) + ys.shape)

    @jax.jit
    def multi(state, xs_k, ys_k, lr, key):
        def f(st, inp):
            xb, yb = inp
            st, metrics = body(st, xb, yb, lr, key)
            return st, metrics["loss"]
        st, losses = lax.scan(f, state, (xs_k, ys_k))
        return st, losses

    _, losses = multi(state, xs_k, ys_k, lr, key)
    float(np.asarray(losses[-1]))
    _, losses = multi(state, xs_k, ys_k, lr, key)
    float(np.asarray(losses[-1]))
    nrep = max(1, 20 // K)
    t0 = time.perf_counter()
    for _ in range(nrep - 1):
        multi(state, xs_k, ys_k, lr, key)
    _, losses = multi(state, xs_k, ys_k, lr, key)
    float(np.asarray(losses[-1]))
    tb = (time.perf_counter() - t0) / (nrep * K)
    print(f"scan({K})  dispatch: {tb*1e3:8.2f} ms/step "
          f"({batch/tb:.0f} imgs/s)")
    print(f"per-dispatch overhead implied: {(ta-tb)*1e3:.2f} ms")


if __name__ == "__main__":
    main()

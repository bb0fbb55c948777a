"""Reproducer for the shard_map-vs-jit lowering pathology (VERDICT #8).

Runs the IDENTICAL single-device program — a small conv net fwd+bwd+update —
three ways and times each:
  1. plain jit
  2. shard_map over a 1-device mesh (manual sharding mode)
  3. jit over a 1-device mesh with sharding constraints (GSPMD)

On the round-1 stack (axon TPU), (2) measured ~60x slower than (1): XLA:TPU
loses key fusions when the program enters manual-sharding mode. This is why
fr_tpu's make_train_step takes the plain-jit path at mesh size 1 and why
--spmd_mode auto benchmarks both lowerings on multi-chip meshes before
committing (fr_tpu/train/task.py _auto_step). Decision record:
ROUND2_NOTES.md "SPMD lowering decision".

    python scripts/spmd_lowering_probe.py   (repo root; TPU or CPU)
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
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def make_net(key, width=128, depth=8):
    ks = jax.random.split(key, depth)
    return [jax.random.normal(k, (3, 3, width, width), jnp.bfloat16) * 0.05
            for k in ks]


def apply_net(ws, x):
    for w in ws:
        x = lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jax.nn.relu(x)
    return x


def loss_fn(ws, x):
    return jnp.sum(apply_net(ws, x).astype(jnp.float32))


def train(ws, x):
    l, g = jax.value_and_grad(loss_fn)(ws, x)
    ws = [w - 0.01 * gw.astype(w.dtype) for w, gw in zip(ws, g)]
    return l, ws


def timeit(fn, *args, n=10):
    out = fn(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / n


def main():
    key = jax.random.key(0)
    ws = make_net(key)
    x = jax.random.normal(jax.random.key(1), (64, 28, 28, 128), jnp.bfloat16)
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1), ("data",))

    t_jit = timeit(jax.jit(train), ws, x)
    print(f"plain jit:          {t_jit*1e3:9.2f} ms")

    mapped = shard_map(train, mesh=mesh, in_specs=(P(), P("data")),
                       out_specs=(P(), P()))
    t_sm = timeit(jax.jit(mapped), ws, x)
    print(f"shard_map (manual): {t_sm*1e3:9.2f} ms   "
          f"({t_sm/t_jit:.1f}x vs jit)")

    def gspmd(ws, x):
        x = lax.with_sharding_constraint(x, NamedSharding(mesh, P("data")))
        return train(ws, x)

    t_gs = timeit(jax.jit(gspmd), ws, x)
    print(f"jit + GSPMD:        {t_gs*1e3:9.2f} ms   "
          f"({t_gs/t_jit:.1f}x vs jit)")


if __name__ == "__main__":
    main()

"""Probe v3: fused grouped (block-aligned) sampled-row update.

v2 conclusions: exact per-row blocks cost ~0.2-0.35 µs per grid step
(A1 grid=S = 42 ms), so per-row Pallas access cannot beat XLA on this
toolchain; ALIGNED GROUPS of rows are the TPU-native layout. This probe
measures the production candidate: one kernel updating weight AND momentum
groups in place (input_output_aliases), grid = sampled-group count.

  read  w[gidx[i]] (block, D), m[gidx[i]] (block, D), g (block, D)
  m2 = mom·m + (g + wd·w) ; w2 = w − lr·m2         (SGD torch semantics)
  write w2, m2 back to the same HBM offsets        (aliased, in-place)

Correctness at small C (vs put_rows oracle), timing at WebFace42M scale.
"""

import functools
import os
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

C = int(os.environ.get("PROBE_C", str(2_059_904)))     # multiple of 32
S = int(os.environ.get("PROBE_S", str(204_800)))
D = int(os.environ.get("PROBE_D", "512"))
ITERS = int(os.environ.get("PROBE_ITERS", "10"))
WD, MOM = 5e-4, 0.9


def make_grouped_update(C, S, D, block):
    ng = S // block

    def kern(gidx_ref, w_ref, m_ref, g_ref, lr_ref, wo_ref, mo_ref):
        g = g_ref[...] + WD * w_ref[...]
        m2 = MOM * m_ref[...] + g
        wo_ref[...] = w_ref[...] - lr_ref[0] * m2
        mo_ref[...] = m2

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def run(w, m, gidx, g, lr):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(ng,),
            in_specs=[pl.BlockSpec((block, D), lambda i, gi: (gi[i], 0)),
                      pl.BlockSpec((block, D), lambda i, gi: (gi[i], 0)),
                      pl.BlockSpec((block, D), lambda i, gi: (i, 0)),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=[pl.BlockSpec((block, D), lambda i, gi: (gi[i], 0)),
                       pl.BlockSpec((block, D), lambda i, gi: (gi[i], 0))],
        )
        return pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((C, D), jnp.float32)] * 2,
            input_output_aliases={1: 0, 2: 1},
        )(gidx, w, m, g, jnp.reshape(lr, (1,)))
    return run


def oracle(w, m, idx, g, lr):
    wr = w[idx]
    mr = m[idx]
    gg = g + WD * wr
    m2 = MOM * mr + gg
    return w.at[idx].set(wr - lr * m2), m.at[idx].set(m2)


def correctness(block):
    c, s = 4096, 512
    rng = np.random.default_rng(3)
    gidx = np.sort(rng.choice(c // block, s // block,
                              replace=False)).astype(np.int32)
    idx = (gidx[:, None] * block + np.arange(block)).reshape(-1)
    w = rng.standard_normal((c, D)).astype(np.float32)
    m = rng.standard_normal((c, D)).astype(np.float32)
    g = rng.standard_normal((s, D)).astype(np.float32)
    lr = np.float32(0.05)
    we, me = oracle(jnp.asarray(w), jnp.asarray(m), idx, jnp.asarray(g), lr)
    run = make_grouped_update(c, s, D, block)
    wg, mg = run(jnp.asarray(w), jnp.asarray(m), jnp.asarray(gidx),
                 jnp.asarray(g), jnp.asarray(lr))
    err_w = float(jnp.max(jnp.abs(wg - we)))
    err_m = float(jnp.max(jnp.abs(mg - me)))
    print(f"block={block:3d} correctness: max|dw|={err_w:.2e} "
          f"max|dm|={err_m:.2e}", flush=True)
    assert err_w == 0.0 and err_m == 0.0, (err_w, err_m)


def timing(block):
    rng = np.random.default_rng(0)
    gidx = jnp.asarray(np.sort(rng.choice(
        C // block, S // block, replace=False)).astype(np.int32))
    g = jnp.asarray(rng.standard_normal((S, D)).astype(np.float32))
    lr = jnp.float32(0.05)
    run = make_grouped_update(C, S, D, block)

    w = jnp.zeros((C, D), jnp.float32)
    m = jnp.zeros((C, D), jnp.float32)
    w, m = run(w, m, gidx, g, lr)
    float(jnp.sum(w[:1]))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        w, m = run(w, m, gidx, g, lr)
    float(jnp.sum(w[:1]))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"grouped w+m update block={block:3d}            {dt:8.2f} ms",
          flush=True)
    del w, m


def xla_baseline():
    rng = np.random.default_rng(0)
    idx = jnp.asarray(np.sort(rng.choice(C, S, replace=False)
                              ).astype(np.int32))
    g = jnp.asarray(rng.standard_normal((S, D)).astype(np.float32))
    lr = jnp.float32(0.05)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def run(w, m, idx, g, lr):
        return oracle(w, m, idx, g, lr)

    w = jnp.zeros((C, D), jnp.float32)
    m = jnp.zeros((C, D), jnp.float32)
    w, m = run(w, m, idx, g, lr)
    float(jnp.sum(w[:1]))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        w, m = run(w, m, idx, g, lr)
    float(jnp.sum(w[:1]))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"XLA w+m gather+update+scatter (donated)       {dt:8.2f} ms",
          flush=True)
    del w, m


if __name__ == "__main__":
    for b in (8, 16, 32):
        correctness(b)
    xla_baseline()
    for b in (8, 16, 32):
        timing(b)

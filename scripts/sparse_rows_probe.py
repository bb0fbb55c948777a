"""Probe: sparse-row gather/scatter cost on the real chip (VERDICT r2 #1).

The WebFace42M-scale head (C=2,059,906, r=0.1 → S=205,990 sampled rows of
512 f32) spends ~46 ms/step in XLA's sampled-row lowering: two 15.6 ms
scatter-updates (full 4.2 GB copy-through) + 4.3 ms gathers — 8-16× over
the ~1.3 ms random-2KB-row HBM floor (ROUND2_NOTES §2.06M profile).

This probe measures the candidate Pallas designs against the XLA baselines:
  1. XLA take (sorted unique)                      [baseline]
  2. XLA .at[idx].set donated                      [baseline]
  3. Pallas gather, dynamic-index BlockSpec grid=S (pipelined (1,D) blocks)
  4. Pallas gather, manual per-row DMA, G rows/program
  5. Pallas update (w-only SGD row update), aliased output, dynamic
     BlockSpec out
  6. Pallas update, manual per-row DMA read+write, aliased, G rows/program

The decision variable is the per-descriptor DMA issue cost (205,990 rows =
205,990+ descriptors/step): per ROUND2_NOTES it decides between per-row
copies and coalesced runs.

Usage: python scripts/sparse_rows_probe.py  (repo root, real TPU)
Env: PROBE_C, PROBE_S, PROBE_D, PROBE_ITERS
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

C = int(os.environ.get("PROBE_C", str(2_059_906)))
S = int(os.environ.get("PROBE_S", str(204_800)))
D = int(os.environ.get("PROBE_D", "512"))
ITERS = int(os.environ.get("PROBE_ITERS", "10"))


def timeit(name, fn, *args, iters=ITERS):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    # value fetch = true sync on axon
    s = jax.tree.leaves(out)[0]
    float(jnp.sum(s[:1]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0][:1]))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:55s} {dt:8.2f} ms")
    return dt


def time_update(name, fn, w0, *args, iters=ITERS):
    """Donating update benchmark: chain the output back as the next input
    (shapes match), so donation stays legal across iterations."""
    w = jnp.array(w0)
    w = fn(w, *args)     # compile + warm (donates the copy)
    float(jnp.sum(w[:1]))
    t0 = time.perf_counter()
    for _ in range(iters):
        w = fn(w, *args)
    float(jnp.sum(w[:1]))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:55s} {dt:8.2f} ms")
    check = float(jnp.sum(w[:1]))
    del w
    return dt, check


def main():
    rng = np.random.default_rng(0)
    idx_np = np.sort(rng.choice(C, S, replace=False)).astype(np.int32)
    idx = jnp.asarray(idx_np)
    w = jnp.asarray(rng.standard_normal((C, D)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((S, D)).astype(np.float32))
    lr = jnp.float32(0.05)

    checks = {}

    # ---- 1. XLA gather baseline
    @jax.jit
    def xla_take(w, idx):
        return jnp.take(w, idx, axis=0, unique_indices=True,
                        indices_are_sorted=True)
    timeit("xla take", xla_take, w, idx)
    checks["gather"] = float(jnp.sum(xla_take(w, idx)[:8]))

    # ---- 2. XLA scatter-update baseline (donated)
    @functools.partial(jax.jit, donate_argnums=(0,))
    def xla_update(w, idx, g, lr):
        rows = jnp.take(w, idx, axis=0, unique_indices=True,
                        indices_are_sorted=True)
        return w.at[idx].set(rows - lr * g, unique_indices=True,
                             indices_are_sorted=True)
    time_update("xla gather+update+scatter (donated)",
                xla_update, w, idx, g, lr)

    # ---- 3. Pallas gather via dynamic-index BlockSpec
    def gather_bs_kernel(idx_ref, row_ref, out_ref):
        out_ref[...] = row_ref[...]

    @jax.jit
    def pallas_gather_bs(w, idx):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(S,),
            in_specs=[pl.BlockSpec((1, D), lambda i, idx: (idx[i], 0))],
            out_specs=pl.BlockSpec((1, D), lambda i, idx: (i, 0)),
        )
        return pl.pallas_call(
            gather_bs_kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((S, D), jnp.float32),
        )(idx, w)
    try:
        timeit("pallas gather blockspec (1,D) grid=S", pallas_gather_bs, w, idx)
        got = float(jnp.sum(pallas_gather_bs(w, idx)[:8]))
        print(f"    check: {got:.4f} vs {checks['gather']:.4f}")
    except Exception as e:
        print(f"pallas gather blockspec FAILED: {type(e).__name__}: {e}"[:300])

    # ---- 4. Pallas gather, manual per-row DMA, G rows per program
    def make_gather_manual(G):
        def kern(idx_ref, table_ref, out_ref, scratch, sems):
            i = pl.program_id(0)
            for j in range(G):
                r = idx_ref[i * G + j]
                pltpu.make_async_copy(table_ref.at[r], scratch.at[j],
                                      sems.at[j]).start()
            for j in range(G):
                r = idx_ref[i * G + j]
                pltpu.make_async_copy(table_ref.at[r], scratch.at[j],
                                      sems.at[j]).wait()
            out_ref[...] = scratch[...]

        @jax.jit
        def run(w, idx):
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(S // G,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec((G, D), lambda i, idx: (i, 0)),
                scratch_shapes=[pltpu.VMEM((G, D), jnp.float32),
                                pltpu.SemaphoreType.DMA((G,))],
            )
            return pl.pallas_call(
                kern, grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((S, D), jnp.float32),
            )(idx, w)
        return run

    for G in (8, 32, 128):
        try:
            fn = make_gather_manual(G)
            timeit(f"pallas gather manual DMA G={G}", fn, w, idx)
            got = float(jnp.sum(fn(w, idx)[:8]))
            print(f"    check: {got:.4f} vs {checks['gather']:.4f}")
        except Exception as e:
            print(f"pallas gather manual G={G} FAILED: "
                  f"{type(e).__name__}: {e}"[:300])

    # ---- 5. Pallas update via dynamic BlockSpec + aliased output
    def upd_bs_kernel(idx_ref, w_ref, g_ref, lr_ref, out_ref):
        out_ref[...] = w_ref[...] - lr_ref[0] * g_ref[...]

    @functools.partial(jax.jit, donate_argnums=(0,))
    def pallas_update_bs(w, idx, g, lr):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(S,),
            in_specs=[pl.BlockSpec((1, D), lambda i, idx: (idx[i], 0)),
                      pl.BlockSpec((1, D), lambda i, idx: (i, 0)),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((1, D), lambda i, idx: (idx[i], 0)),
        )
        return pl.pallas_call(
            upd_bs_kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((C, D), jnp.float32),
            input_output_aliases={1: 0},
        )(idx, w, g, jnp.reshape(lr, (1,)))
    try:
        time_update("pallas update blockspec aliased grid=S",
                    pallas_update_bs, w, idx, g, lr)
    except Exception as e:
        print(f"pallas update blockspec FAILED: {type(e).__name__}: {e}"[:300])

    # ---- 6. Pallas update, manual DMA read+write, aliased
    def make_update_manual(G):
        def kern(idx_ref, w_hbm, g_ref, lr_ref, out_hbm, scratch, sin, sout):
            i = pl.program_id(0)
            for j in range(G):
                r = idx_ref[i * G + j]
                pltpu.make_async_copy(w_hbm.at[r], scratch.at[j],
                                      sin.at[j]).start()
            for j in range(G):
                r = idx_ref[i * G + j]
                pltpu.make_async_copy(w_hbm.at[r], scratch.at[j],
                                      sin.at[j]).wait()
            scratch[...] = scratch[...] - lr_ref[0] * g_ref[...]
            for j in range(G):
                r = idx_ref[i * G + j]
                pltpu.make_async_copy(scratch.at[j], out_hbm.at[r],
                                      sout.at[j]).start()
            for j in range(G):
                r = idx_ref[i * G + j]
                pltpu.make_async_copy(scratch.at[j], out_hbm.at[r],
                                      sout.at[j]).wait()

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(w, idx, g, lr):
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(S // G,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                          pl.BlockSpec((G, D), lambda i, idx: (i, 0)),
                          pl.BlockSpec(memory_space=pltpu.SMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
                scratch_shapes=[pltpu.VMEM((G, D), jnp.float32),
                                pltpu.SemaphoreType.DMA((G,)),
                                pltpu.SemaphoreType.DMA((G,))],
            )
            return pl.pallas_call(
                kern, grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((C, D), jnp.float32),
                input_output_aliases={1: 0},
                compiler_params=pltpu.CompilerParams(has_side_effects=True),
            )(idx, w, g, jnp.reshape(lr, (1,)))
        return run

    for G in (8, 32, 128):
        try:
            fn = make_update_manual(G)
            time_update(f"pallas update manual DMA G={G} aliased",
                        fn, w, idx, g, lr)
        except Exception as e:
            print(f"pallas update manual G={G} FAILED: "
                  f"{type(e).__name__}: {e}"[:300])


if __name__ == "__main__":
    main()

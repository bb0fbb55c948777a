"""Probe v2: sparse-row access via dynamic-index BlockSpecs (legal tiles).

Probe v1 (scripts/sparse_rows_probe.py) established on this stack:
  * XLA take: 7.84 ms; XLA gather+update+scatter donated: 34.34 ms
    (S=204,800 rows of 512 f32 from C=2,059,906).
  * (1, 512) blocks are rejected (last two dims must be divisible by (8,128)
    or equal the array dims).
  * manual in-kernel make_async_copy from an ANY-space ref crashes the axon
    remote-compile helper (HTTP 500) — unusable on this toolchain.

v2 designs, all pure BlockSpec pipelining (no manual DMA):
  A1: table viewed (C, 4, 128); block (1, 4, 128) = exactly one row; grid=S.
  A2: same + G duplicated table args per grid step (grid=S/G) to amortise
      per-step pipeline overhead (gather only — writes can't dup-alias).
  B:  aligned-GROUP access: (8, 512) blocks of 8 consecutive rows
      (grid=S/8) — the block-sampling layout ceiling.
  U1: exact update, (1, 4, 128) blocks, aliased output, grid=S.
  UB: group update, (8, 512) blocks, aliased output, grid=S/8.
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
SUB = 4
LANE = D // SUB


def timeit(name, fn, *args, iters=ITERS):
    out = fn(*args)
    s = jax.tree.leaves(out)[0]
    float(jnp.sum(s[:1]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0][:1]))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:55s} {dt:8.2f} ms", flush=True)
    return dt


def time_update(name, fn, w0, *args, iters=ITERS):
    w = jnp.array(w0)
    w = fn(w, *args)
    float(jnp.sum(w.reshape(-1)[:1]))
    t0 = time.perf_counter()
    for _ in range(iters):
        w = fn(w, *args)
    float(jnp.sum(w.reshape(-1)[:1]))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:55s} {dt:8.2f} ms", flush=True)
    del w
    return dt


def main():
    rng = np.random.default_rng(0)
    idx_np = np.sort(rng.choice(C, S, replace=False)).astype(np.int32)
    idx = jnp.asarray(idx_np)
    w3 = jnp.asarray(rng.standard_normal((C, SUB, LANE)).astype(np.float32))
    g3 = jnp.asarray(rng.standard_normal((S, SUB, LANE)).astype(np.float32))
    lr = jnp.float32(0.05)

    ref_head = None

    # ---- A1: exact gather, one row per grid step
    def copy_kernel(idx_ref, row_ref, out_ref):
        out_ref[...] = row_ref[...]

    @jax.jit
    def gather_a1(w3, idx):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(S,),
            in_specs=[pl.BlockSpec((1, SUB, LANE),
                                   lambda i, idx: (idx[i], 0, 0))],
            out_specs=pl.BlockSpec((1, SUB, LANE), lambda i, idx: (i, 0, 0)),
        )
        return pl.pallas_call(
            copy_kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((S, SUB, LANE), jnp.float32),
        )(idx, w3)
    try:
        timeit("A1 gather (1,4,128) grid=S", gather_a1, w3, idx)
        ref_head = float(jnp.sum(gather_a1(w3, idx)[:8]))
        expect = float(jnp.sum(jnp.take(w3, idx[:8], axis=0)))
        print(f"    check: {ref_head:.4f} vs {expect:.4f}")
    except Exception as e:
        print(f"A1 FAILED: {type(e).__name__}: {e}"[:300], flush=True)

    # ---- A2: exact gather, G dup args per step
    def make_gather_a2(G):
        def kern(idx_ref, *refs):
            rows = refs[:G]
            out_ref = refs[G]
            for j in range(G):
                out_ref[j, :, :] = rows[j][0]

        @jax.jit
        def run(w3, idx):
            in_specs = [
                pl.BlockSpec((1, SUB, LANE),
                             lambda i, idx, j=j: (idx[i * G + j], 0, 0))
                for j in range(G)
            ]
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(S // G,),
                in_specs=in_specs,
                out_specs=pl.BlockSpec((G, SUB, LANE),
                                       lambda i, idx: (i, 0, 0)),
            )
            return pl.pallas_call(
                kern, grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((S, SUB, LANE), jnp.float32),
            )(idx, *([w3] * G))
        return run

    for G in (4, 8):
        try:
            fn = make_gather_a2(G)
            timeit(f"A2 gather dup-args G={G}", fn, w3, idx)
            got = float(jnp.sum(fn(w3, idx)[:8]))
            print(f"    check: {got:.4f} vs {ref_head}")
        except Exception as e:
            print(f"A2 G={G} FAILED: {type(e).__name__}: {e}"[:300],
                  flush=True)

    # ---- B: aligned-group gather (8 consecutive rows per block)
    w2 = w3.reshape(C, D)
    gidx = jnp.asarray(np.sort(rng.choice(C // 8, S // 8,
                                          replace=False)).astype(np.int32))

    @jax.jit
    def gather_b(w2, gidx):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(S // 8,),
            in_specs=[pl.BlockSpec((8, D), lambda i, gidx: (gidx[i], 0))],
            out_specs=pl.BlockSpec((8, D), lambda i, gidx: (i, 0)),
        )
        return pl.pallas_call(
            lambda idx_ref, row_ref, out_ref: out_ref.__setitem__(
                ..., row_ref[...]),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((S, D), jnp.float32),
        )(gidx, w2)
    try:
        timeit("B  gather aligned groups (8,512)", gather_b, w2, gidx)
    except Exception as e:
        print(f"B FAILED: {type(e).__name__}: {e}"[:300], flush=True)

    # ---- U1: exact update, aliased, grid=S
    def upd_kernel(idx_ref, w_ref, g_ref, out_ref):
        out_ref[...] = w_ref[...] - 0.05 * g_ref[...]

    @functools.partial(jax.jit, donate_argnums=(0,))
    def update_u1(w3, idx, g3):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(S,),
            in_specs=[pl.BlockSpec((1, SUB, LANE),
                                   lambda i, idx: (idx[i], 0, 0)),
                      pl.BlockSpec((1, SUB, LANE),
                                   lambda i, idx: (i, 0, 0))],
            out_specs=pl.BlockSpec((1, SUB, LANE),
                                   lambda i, idx: (idx[i], 0, 0)),
        )
        return pl.pallas_call(
            upd_kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((C, SUB, LANE), jnp.float32),
            input_output_aliases={1: 0},
        )(idx, w3, g3)
    try:
        time_update("U1 update exact (1,4,128) aliased grid=S",
                    update_u1, w3, idx, g3)
    except Exception as e:
        print(f"U1 FAILED: {type(e).__name__}: {e}"[:300], flush=True)

    # ---- UB: group update, aliased, grid=S/8
    g2 = g3.reshape(S, D)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def update_ub(w2, gidx, g2):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(S // 8,),
            in_specs=[pl.BlockSpec((8, D), lambda i, gidx: (gidx[i], 0)),
                      pl.BlockSpec((8, D), lambda i, gidx: (i, 0))],
            out_specs=pl.BlockSpec((8, D), lambda i, gidx: (gidx[i], 0)),
        )
        return pl.pallas_call(
            upd_kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((C, D), jnp.float32),
            input_output_aliases={1: 0},
        )(gidx, w2, g2)
    try:
        time_update("UB update aligned groups (8,512) aliased",
                    update_ub, w2, gidx, g2)
    except Exception as e:
        print(f"UB FAILED: {type(e).__name__}: {e}"[:300], flush=True)


if __name__ == "__main__":
    main()

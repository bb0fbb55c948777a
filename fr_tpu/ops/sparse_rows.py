"""Sparse (sampled) head-row access kernels for the PartialFC class table.

Why this exists (VERDICT round-2 #1): at WebFace42M scale (C=2,059,906
identities, r=0.1 → ~206k sampled rows of 512 f32 per step) XLA:TPU lowers
the sampled-row machinery far above the data's HBM cost — measured on v5e
(scripts/sparse_rows_probe*.py, ROUND3_NOTES.md):

  XLA take (gather)                        7.8 ms
  XLA gather+update+scatter, one table    34.3 ms   (full 4.2 GB copy-through
                                                     even donated)

Probe findings that shape the design:
  * (1, D) blocks are illegal (block last-2 dims must divide (8, 128) or
    equal the array dims) and a (1, 4, 128) one-row view costs ~0.2 µs of
    grid-step overhead per ROW (42 ms at S=205k) — per-row access cannot
    win on this toolchain.
  * manual in-kernel make_async_copy from an ANY-space ref crashes the axon
    remote-compile helper.
  * ALIGNED GROUPS of rows as (block, D) dynamic-index BlockSpecs are fast:
    Pallas pipelines the block DMAs, and input_output_aliases makes the
    update a true in-place sparse write (no 4.2 GB copy-through).

So the TPU-native layout is block-aligned sampling (PFCConfig.sample_block):
negatives are drawn as aligned groups of `block` consecutive class rows
(uniform marginal inclusion probability for every negative; positives force
their whole group in), and these kernels move only the sampled groups:

  grouped_gather(table, gidx, block)       → (ng·block, D) activated rows
  grouped_update_{sgd,adamw}(...)          → weight/slot groups updated
                                             IN PLACE (aliased outputs)

Exact per-row sampling (sample_block=1, the reference's semantics,
nets/PartialFC.py:108-116) keeps the jnp take/put path — XLA's lowering is
the best available for arbitrary rows.

Off-TPU these functions fall back to jnp twins with identical semantics
(the kernels are also runnable under interpret=True for tests).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fr_tpu.ops.fused_pfc import _align_vma, _out_vma


def _use_kernel() -> bool:
    return jax.default_backend() == "tpu"


def expand_group_index(gidx: jnp.ndarray, block: int) -> jnp.ndarray:
    """(ng,) sorted group ids → (ng·block,) sorted unique row ids."""
    return (gidx[:, None] * block + jnp.arange(block)[None, :]).reshape(-1)


# ---------------------------------------------------------------------------
# Gather
# ---------------------------------------------------------------------------

def _gather_kernel(gidx_ref, rows_ref, out_ref):
    out_ref[...] = rows_ref[...]


def grouped_gather(table: jnp.ndarray, gidx: jnp.ndarray, block: int,
                   interpret: bool = False) -> jnp.ndarray:
    """Gather ng aligned groups of `block` rows: (ng·block, D)."""
    C, D = table.shape
    ng = gidx.shape[0]
    assert C % block == 0, (C, block)
    if not (_use_kernel() or interpret):
        return jnp.take(table, expand_group_index(gidx, block), axis=0,
                        unique_indices=True, indices_are_sorted=True)
    table, = _align_vma(table)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(ng,),
        in_specs=[pl.BlockSpec((block, D), lambda i, gi: (gi[i], 0))],
        out_specs=pl.BlockSpec((block, D), lambda i, gi: (i, 0)),
    )
    out = pl.pallas_call(
        _gather_kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ng * block, D), table.dtype,
                                       vma=_out_vma(table, gidx)),
        interpret=interpret,
    )(gidx, table)
    return out


# ---------------------------------------------------------------------------
# Fused in-place sampled-group optimizer updates (torch semantics,
# matching fr_tpu/train/optim.py row_sgd_update / row_adamw_update)
# ---------------------------------------------------------------------------

def grouped_update_sgd(weight: jnp.ndarray, slots: Dict[str, jnp.ndarray],
                       gidx: jnp.ndarray, grad_rows: jnp.ndarray, lr,
                       wd: float, mom: float, block: int,
                       interpret: bool = False
                       ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """g ← g + wd·w ; buf ← mom·buf + g ; w ← w − lr·buf on the sampled
    groups only, written back in place (aliased outputs — the full class
    table is never copied)."""
    C, D = weight.shape
    ng = gidx.shape[0]
    if not (_use_kernel() or interpret):
        idx = expand_group_index(gidx, block)
        w = jnp.take(weight, idx, axis=0, unique_indices=True,
                     indices_are_sorted=True)
        b = jnp.take(slots["momentum"], idx, axis=0, unique_indices=True,
                     indices_are_sorted=True)
        g = grad_rows + wd * w
        b = mom * b + g
        w = w - lr * b
        return (weight.at[idx].set(w, unique_indices=True,
                                   indices_are_sorted=True),
                {"momentum": slots["momentum"].at[idx].set(
                    b, unique_indices=True, indices_are_sorted=True)})

    def kern(gi_ref, w_ref, m_ref, g_ref, lr_ref, wo_ref, mo_ref):
        g = g_ref[...].astype(jnp.float32) + wd * w_ref[...]
        m2 = mom * m_ref[...] + g
        wo_ref[...] = w_ref[...] - lr_ref[0] * m2
        mo_ref[...] = m2

    weight, mslot, grad_rows = _align_vma(weight, slots["momentum"],
                                          grad_rows.astype(jnp.float32))
    vma = _out_vma(weight, mslot, grad_rows)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(ng,),
        in_specs=[pl.BlockSpec((block, D), lambda i, gi: (gi[i], 0)),
                  pl.BlockSpec((block, D), lambda i, gi: (gi[i], 0)),
                  pl.BlockSpec((block, D), lambda i, gi: (i, 0)),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[pl.BlockSpec((block, D), lambda i, gi: (gi[i], 0)),
                   pl.BlockSpec((block, D), lambda i, gi: (gi[i], 0))],
    )
    new_w, new_m = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((C, D), jnp.float32, vma=vma)] * 2,
        input_output_aliases={1: 0, 2: 1},
        interpret=interpret,
    )(gidx, weight, mslot, grad_rows,
      jnp.reshape(jnp.asarray(lr, jnp.float32), (1,)))
    return new_w, {"momentum": new_m}


def grouped_update_adamw(weight: jnp.ndarray, slots: Dict[str, jnp.ndarray],
                         gidx: jnp.ndarray, grad_rows: jnp.ndarray, lr,
                         wd: float, b1: float, b2: float, eps: float,
                         count, block: int, interpret: bool = False
                         ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Sampled-group AdamW with the shared head step counter
    (torch semantics of fr_tpu/train/optim.py row_adamw_update)."""
    C, D = weight.shape
    ng = gidx.shape[0]
    t = count.astype(jnp.float32)
    bc1 = 1.0 - b1 ** t
    bc2 = 1.0 - b2 ** t
    if not (_use_kernel() or interpret):
        idx = expand_group_index(gidx, block)
        take = functools.partial(jnp.take, axis=0, unique_indices=True,
                                 indices_are_sorted=True)
        w = take(weight, idx) * (1.0 - lr * wd)
        m = b1 * take(slots["exp_avg"], idx) + (1.0 - b1) * grad_rows
        v = (b2 * take(slots["exp_avg_sq"], idx)
             + (1.0 - b2) * jnp.square(grad_rows))
        w = w - (lr / bc1) * m / (jnp.sqrt(v) / jnp.sqrt(bc2) + eps)
        put = lambda a, vals: a.at[idx].set(  # noqa: E731
            vals, unique_indices=True, indices_are_sorted=True)
        return put(weight, w), {"exp_avg": put(slots["exp_avg"], m),
                                "exp_avg_sq": put(slots["exp_avg_sq"], v)}

    def kern(gi_ref, w_ref, m_ref, v_ref, g_ref, sc_ref,
             wo_ref, mo_ref, vo_ref):
        lr_ = sc_ref[0]
        bc1_ = sc_ref[1]
        bc2_ = sc_ref[2]
        g = g_ref[...].astype(jnp.float32)
        w = w_ref[...] * (1.0 - lr_ * wd)
        m2 = b1 * m_ref[...] + (1.0 - b1) * g
        v2 = b2 * v_ref[...] + (1.0 - b2) * jnp.square(g)
        wo_ref[...] = w - (lr_ / bc1_) * m2 / (jnp.sqrt(v2)
                                               / jnp.sqrt(bc2_) + eps)
        mo_ref[...] = m2
        vo_ref[...] = v2

    weight, ea, eas, grad_rows = _align_vma(
        weight, slots["exp_avg"], slots["exp_avg_sq"],
        grad_rows.astype(jnp.float32))
    vma = _out_vma(weight, ea, eas, grad_rows)
    scalars = jnp.stack([jnp.asarray(lr, jnp.float32),
                         bc1.astype(jnp.float32), bc2.astype(jnp.float32)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(ng,),
        in_specs=[pl.BlockSpec((block, D), lambda i, gi: (gi[i], 0)),
                  pl.BlockSpec((block, D), lambda i, gi: (gi[i], 0)),
                  pl.BlockSpec((block, D), lambda i, gi: (gi[i], 0)),
                  pl.BlockSpec((block, D), lambda i, gi: (i, 0)),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[pl.BlockSpec((block, D), lambda i, gi: (gi[i], 0)),
                   pl.BlockSpec((block, D), lambda i, gi: (gi[i], 0)),
                   pl.BlockSpec((block, D), lambda i, gi: (gi[i], 0))],
    )
    new_w, new_m, new_v = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((C, D), jnp.float32, vma=vma)] * 3,
        input_output_aliases={1: 0, 2: 1, 3: 2},
        interpret=interpret,
    )(gidx, weight, ea, eas, grad_rows, scalars)
    return new_w, {"exp_avg": new_m, "exp_avg_sq": new_v}


def grouped_update(optimizer: str, conf, weight, slots, gidx, grad_rows,
                   lr, count, block: int, interpret: bool = False):
    """Dispatch mirror of fr_tpu/train/optim.py pfc_row_update."""
    if optimizer == "SGD":
        return grouped_update_sgd(weight, slots, gidx, grad_rows, lr,
                                  conf.wd, conf.mom, block,
                                  interpret=interpret)
    if optimizer == "AdamW":
        b1, b2 = conf.betas
        return grouped_update_adamw(weight, slots, gidx, grad_rows, lr,
                                    conf.wd, b1, b2, conf.eps, count, block,
                                    interpret=interpret)
    raise ValueError(optimizer)


# ---------------------------------------------------------------------------
# GSPMD partitioning (round 5, VERDICT r4 #4): class-sharded grouped
# gather/update for the pjit lowering.
# ---------------------------------------------------------------------------
#
# Under gspmd the head table is sharded P('model', None) and the per-shard
# group indices arrive as (M, num_sample_groups) rows. These kernels are
# shard-local along the class axis by construction (each shard's groups
# index its own rows), so a custom_partitioning wrapper with compound-
# factor sharding rules — weight dim0 = (m l), output dim0 = (m s b) —
# lets GSPMD run the SAME pallas kernels per shard instead of the XLA
# take_along_axis/scatter path the pjit program previously kept
# (train/step.py make_gspmd_train_step). On a single device JAX inlines
# the wrapper (the kernels run directly, input_output_aliases intact); on
# a CPU mesh the per-shard lowering runs the jnp twins, which partition-
# tests the rules without TPU hardware.

def _local_group_flat(gidx2d: jnp.ndarray, nl: int, block: int
                      ) -> jnp.ndarray:
    """(m, s) per-shard-row LOCAL group ids → (m·s,) group ids into the
    (m·nl, D) table slice this function sees (global table OR one shard —
    the math is scale-invariant, which is what makes the wrapper's
    lower_fn identical to the unpartitioned fallback)."""
    m = gidx2d.shape[0]
    ngl = nl // block
    return (gidx2d + jnp.arange(m, dtype=gidx2d.dtype)[:, None] * ngl
            ).reshape(-1)


def _sh_gather_impl(weight, gidx2d, block):
    m = gidx2d.shape[0]
    nl = weight.shape[0] // m
    return grouped_gather(weight, _local_group_flat(gidx2d, nl, block),
                          block)


def _sh_sgd_impl(weight, mslot, gidx2d, grad_rows, lr, block, wd, mom):
    m = gidx2d.shape[0]
    nl = weight.shape[0] // m
    gflat = _local_group_flat(gidx2d, nl, block)
    new_w, slots = grouped_update_sgd(weight, {"momentum": mslot}, gflat,
                                      grad_rows, lr, wd, mom, block)
    return new_w, slots["momentum"]


def _sh_adamw_impl(weight, ea, eas, gidx2d, grad_rows, lr, count, block,
                   wd, b1, b2, eps):
    m = gidx2d.shape[0]
    nl = weight.shape[0] // m
    gflat = _local_group_flat(gidx2d, nl, block)
    new_w, slots = grouped_update_adamw(
        weight, {"exp_avg": ea, "exp_avg_sq": eas}, gflat, grad_rows, lr,
        wd, b1, b2, eps, count, block)
    return new_w, slots["exp_avg"], slots["exp_avg_sq"]


@functools.lru_cache(maxsize=None)
def _gather_cp(nl: int, block: int):
    from fr_tpu.ops.fused_window_attn import _make_cp
    return _make_cp(
        _sh_gather_impl, in_dims=(0, 0), out_dims=(0,),
        rule="(m l) d, m s -> (m s b) d", n_static=1,
        factor_sizes={"l": nl, "b": block})


@functools.lru_cache(maxsize=None)
def _sgd_cp(nl: int, block: int):
    from fr_tpu.ops.fused_window_attn import _make_cp
    return _make_cp(
        _sh_sgd_impl, in_dims=(0, 0, 0, 0, None), out_dims=(0, 0),
        rule="(m l) d, (m l) d, m s, (m s b) d, -> (m l) d, (m l) d",
        n_static=3, factor_sizes={"l": nl, "b": block})


@functools.lru_cache(maxsize=None)
def _adamw_cp(nl: int, block: int):
    from fr_tpu.ops.fused_window_attn import _make_cp
    return _make_cp(
        _sh_adamw_impl, in_dims=(0, 0, 0, 0, 0, None, None),
        out_dims=(0, 0, 0),
        rule="(m l) d, (m l) d, (m l) d, m s, (m s b) d, , "
             "-> (m l) d, (m l) d, (m l) d",
        n_static=5, factor_sizes={"l": nl, "b": block})


def sharded_grouped_gather(weight: jnp.ndarray, gidx2d: jnp.ndarray,
                           block: int) -> jnp.ndarray:
    """GSPMD grouped gather: weight (M·nl, D) sharded P('model', None),
    gidx2d (M, s) LOCAL group ids per shard row → (M·s·block, D) sharded
    on dim 0."""
    nl = weight.shape[0] // gidx2d.shape[0]
    return _gather_cp(nl, block)(weight, gidx2d, block)


def sharded_grouped_update(optimizer: str, conf, weight, slots, gidx2d,
                           grad_rows, lr, count, block: int):
    """GSPMD grouped in-place update (dispatch mirror of grouped_update,
    class-sharded operands)."""
    nl = weight.shape[0] // gidx2d.shape[0]
    lr = jnp.asarray(lr, jnp.float32)
    if optimizer == "SGD":
        new_w, new_m = _sgd_cp(nl, block)(
            weight, slots["momentum"], gidx2d,
            grad_rows.astype(jnp.float32), lr, block, conf.wd, conf.mom)
        return new_w, {"momentum": new_m}
    if optimizer == "AdamW":
        b1, b2 = conf.betas
        new_w, new_m, new_v = _adamw_cp(nl, block)(
            weight, slots["exp_avg"], slots["exp_avg_sq"], gidx2d,
            grad_rows.astype(jnp.float32), lr,
            jnp.asarray(count, jnp.int32), block, conf.wd, b1, b2,
            conf.eps)
        return new_w, {"exp_avg": new_m, "exp_avg_sq": new_v}
    raise ValueError(optimizer)

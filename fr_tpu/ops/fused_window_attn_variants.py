"""Retired window-attention kernel designs — measured negatives kept whole.

Every design here was built, parity-tested against the jnp oracle (real
Mosaic lowering AND interpreter), timed on the chip, and measured SLOWER
than the shipping kernels in fr_tpu/ops/fused_window_attn.py. They are
kept importable — with their tests — because each negative is part of the
measured design record (ROUND2..5_NOTES.md) and because a future
Mosaic/XLA version could flip a sign; none of them runs on any shipping
dispatch path.

Contents (measurement provenance in each section comment):

- **Spatial variant** (`fused_window_attention_spatial`): windowing
  absorbed into the kernel's BlockSpec indexing. Lost to XLA's partition
  transpose + the windows-API kernel (50.1 vs 42.2 ms/step AlterNet50
  b=128, ROUND2_NOTES.md); several shapes also hit Mosaic shape-cast
  limits. Gated by swin_common.SPATIAL_KERNEL_CONFIGS (empty).
- **Grid-axis head grouping** (`_pkg_fwd`/`_pkg_bwd`): the packed
  kernel's head GROUP as a grid dimension. Fixes the unrolled group
  loop's scoped-VMEM stacking but still loses to both per-head and full
  pack at every N=49 shape (sw3 g4 1.52 vs 0.77 ms f+b, ROUND4_NOTES.md).
  Engages only when a caller explicitly requests an aligned head_group.
- **Entry-fused packed kernel** (`fused_window_attention_packed_qkv`):
  the qkv projection GEMM inside the attention kernel so qkv never exists
  in HBM. Measured negative end-to-end in all three backward variants
  (AlterNet50 37.1-37.7 vs 34.6 ms — the relayout copies it removes were
  already latency-hidden; ROUND4_NOTES.md).

All shared machinery (packed recompute/VJP group math, block picking,
segment constants, vma plumbing) is imported from the live module — the
dependency is one-directional (variants -> live; the live module only
references this one lazily, at dispatch sites that require an explicit
opt-in).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fr_tpu.ops.fused_window_attn import (
    _ATTN_COMPILER_PARAMS,
    _align_vma,
    _bwd_jnp,
    _heads_fwd,
    _interpret,
    _match_cotangent_vma,
    _nobatch,
    _norm,
    _pk_bwd_groups,
    _pk_bwd_one_group,
    _pk_bwd_rule,
    _pk_constants,
    _pk_fwd_groups,
    _pk_pack_params,
    _pk_pick_block,
    _pk_recompute,
    _vma_union,
)

# ---------------------------------------------------------------------------
# Spatial variant: windowing absorbed into the kernel's BlockSpec indexing.
# ---------------------------------------------------------------------------
#
# The windows-API kernel above still leaves window_partition/window_reverse
# as materialised XLA transposes around every call (measured ~10 ms/step of
# copies on AlterNet50 b=128 after v1). Since the qkv and output projections
# are position-independent they commute with windowing, so the projections
# run on the (B, H, W, C) layout and this kernel slices windows straight out
# of HBM: grid (B/g, nWy), block (g, ws, W, 3C) — a row of windows for g
# images; the (ws, nWx) shuffle happens in VMEM where relayouts are cheap.


def _window_block(x, g, nWx, ws, last):
    """(g, ws, nWx·ws, last) → (g·nWx, ws·ws, last), matching
    window_partition's (img, wx) window order and row-major token order."""
    x = x.reshape(g, ws, nWx, ws, last)
    x = x.transpose(0, 2, 1, 3, 4)
    return x.reshape(g * nWx, ws * ws, last)


def _unwindow_block(w, g, nWx, ws, last):
    """Inverse of _window_block: (g·nWx, ws·ws, last) → (g, ws, nWx·ws, last)."""
    w = w.reshape(g, nWx, ws, ws, last)
    w = w.transpose(0, 2, 1, 3, 4)
    return w.reshape(g, ws, nWx * ws, last)


def _sp_fwd_body(qkv_ref, scale_ref, bias_ref, mask_ref, out_ref,
                 num_heads, compute, ws):
    blk = qkv_ref[:]                     # (g, ws, W, 3C)
    g_img, _, Wimg, C3 = blk.shape
    nWx = Wimg // ws
    C = C3 // 3
    hd = C // num_heads
    N = ws * ws
    qkv = _window_block(blk, g_img, nWx, ws, C3)
    scale = scale_ref[0]
    bias16 = bias_ref[:]
    mask = mask_ref[:] if mask_ref is not None else None
    Wn = g_img * nWx
    for h in range(num_heads):
        o = h * hd
        qh = qkv[:, :, o:o + hd].astype(jnp.float32)
        kh = qkv[:, :, C + o:C + o + hd].astype(jnp.float32)
        vh = qkv[:, :, 2 * C + o:2 * C + o + hd]
        qn, _, _ = _norm(qh)
        kn, _, _ = _norm(kh)
        s = lax.dot_general(qn.astype(compute), kn.astype(compute),
                            (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
        s = s * scale[h] + bias16[h][None]
        if mask is not None:
            s = (s.reshape(g_img, nWx, N, N) + mask[None]).reshape(Wn, N, N)
        p = jax.nn.softmax(s, axis=-1)
        o_h = lax.dot_general(p.astype(compute), vh,
                              (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
        out_ref[:, :, :, o:o + hd] = _unwindow_block(o_h, g_img, nWx, ws, hd)


def _sp_bwd_body(qkv_ref, scale_ref, bias_ref, mask_ref, g_ref,
                 dqkv_ref, dscale_ref, dbias_ref, num_heads, compute, ws):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _init():
        dscale_ref[:] = jnp.zeros_like(dscale_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    blk = qkv_ref[:]
    g_img, _, Wimg, C3 = blk.shape
    nWx = Wimg // ws
    C = C3 // 3
    hd = C // num_heads
    N = ws * ws
    Wn = g_img * nWx
    qkv = _window_block(blk, g_img, nWx, ws, C3)
    gwin = _window_block(g_ref[:], g_img, nWx, ws, C)
    scale = scale_ref[0]
    bias16 = bias_ref[:]
    mask = mask_ref[:] if mask_ref is not None else None

    dt = dqkv_ref.dtype
    dscales = []
    for h in range(num_heads):
        o = h * hd
        qh = qkv[:, :, o:o + hd].astype(jnp.float32)
        kh = qkv[:, :, C + o:C + o + hd].astype(jnp.float32)
        vh = qkv[:, :, 2 * C + o:2 * C + o + hd]
        qn, qr, qa = _norm(qh)
        kn, kr, ka = _norm(kh)
        qnc = qn.astype(compute)
        knc = kn.astype(compute)
        s_raw = lax.dot_general(qnc, knc, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        s = s_raw * scale[h] + bias16[h][None]
        if mask is not None:
            s = (s.reshape(g_img, nWx, N, N) + mask[None]).reshape(Wn, N, N)
        p = jax.nn.softmax(s, axis=-1)
        pc = p.astype(compute)

        g_h = gwin[:, :, o:o + hd]
        dp = lax.dot_general(g_h.astype(compute), vh,
                             (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
        dv = lax.dot_general(pc, g_h.astype(compute),
                             (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dbias_ref[h] += jnp.sum(ds, axis=0)
        dscales.append(jnp.sum(ds * s_raw))
        dsc = (ds * scale[h]).astype(compute)
        dqn = lax.dot_general(dsc, knc, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
        dkn = lax.dot_general(dsc, qnc, (((1,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
        dq = qr * (dqn - jnp.where(
            qa, qn * jnp.sum(dqn * qn, axis=-1, keepdims=True), 0.0))
        dk = kr * (dkn - jnp.where(
            ka, kn * jnp.sum(dkn * kn, axis=-1, keepdims=True), 0.0))
        dqkv_ref[:, :, :, o:o + hd] = _unwindow_block(
            dq.astype(dt), g_img, nWx, ws, hd)
        dqkv_ref[:, :, :, C + o:C + o + hd] = _unwindow_block(
            dk.astype(dt), g_img, nWx, ws, hd)
        dqkv_ref[:, :, :, 2 * C + o:2 * C + o + hd] = _unwindow_block(
            dv.astype(dt), g_img, nWx, ws, hd)

    dscale_ref[:] += jnp.stack(dscales).reshape(1, num_heads)


def _sp_pick_g(B, nWx, N):
    """Images per program: ~512-1024 window tokens per block (the measured
    sweet spot, see _pick_block)."""
    target = max(1, 1024 // max(1, nWx * N))
    g = 1
    while g * 2 <= target and B % (g * 2) == 0:
        g *= 2
    return g


def _sp_specs(g, ws, Wimg, C3, num_heads, has_mask, nWx, N):
    in_specs = [
        pl.BlockSpec((g, ws, Wimg, C3), lambda i, j: (i, j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, num_heads), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((num_heads, N, N), lambda i, j: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if has_mask:
        in_specs.append(pl.BlockSpec((nWx, N, N), lambda i, j: (j, 0, 0),
                                     memory_space=pltpu.VMEM))
    return in_specs


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_window_attention_spatial(qkv, scale, bias16, num_heads, ws,
                                   mask=None):
    """qkv (B, H, W, 3C) compute-dtype (pre-shifted for SW-MSA); scale
    (heads,) f32; bias16 (heads, N, N) f32; mask (nWy·nWx, N, N) f32 or
    None. Returns (B, H, W, C) f32 — window partition, attention and window
    reverse in one kernel."""
    return _sp_fwd(qkv, scale, bias16, num_heads, ws, mask)


def _sp_jnp(qkv, scale, bias16, num_heads, ws, mask):
    """Off-TPU twin: window via reshape/transpose then the windows-API
    jnp twin."""
    B, H, Wimg, C3 = qkv.shape
    N = ws * ws
    x = qkv.reshape(B, H // ws, ws, Wimg // ws, ws, C3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, N, C3)
    out = _heads_fwd(x, scale, bias16, mask, num_heads, qkv.dtype)
    C = C3 // 3
    out = out.reshape(B, H // ws, Wimg // ws, ws, ws, C)
    return out.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, Wimg, C)


def _sp_fwd(qkv, scale, bias16, num_heads, ws, mask):
    if _interpret():
        return _sp_jnp(qkv, scale, bias16, num_heads, ws, mask)
    B, H, Wimg, C3 = qkv.shape
    C = C3 // 3
    N = ws * ws
    nWx = Wimg // ws
    nWy = H // ws
    has_mask = mask is not None
    g = _sp_pick_g(B, nWx, N)
    grid = (B // g, nWy)

    args = [qkv, jnp.reshape(scale, (1, num_heads)), bias16]
    if has_mask:
        args.append(mask)
    args = _align_vma(*args)
    vma = _vma_union(*args)
    compute = qkv.dtype

    if has_mask:
        def kernel(q, s, b, m, o):
            _sp_fwd_body(q, s, b, m, o, num_heads, compute, ws)
    else:
        def kernel(q, s, b, o):
            _sp_fwd_body(q, s, b, None, o, num_heads, compute, ws)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=_sp_specs(g, ws, Wimg, C3, num_heads, has_mask, nWx, N),
        out_specs=pl.BlockSpec((g, ws, Wimg, C), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Wimg, C), jnp.float32,
                                       vma=vma),
        compiler_params=_ATTN_COMPILER_PARAMS,
    )(*args)


def _sp_fwd_rule(qkv, scale, bias16, num_heads, ws, mask):
    out = _sp_fwd(qkv, scale, bias16, num_heads, ws, mask)
    return out, (qkv, scale, bias16, mask)


def _sp_bwd_rule(num_heads, ws, residuals, g):
    qkv, scale, bias16, mask = residuals
    has_mask = mask is not None

    if _interpret():
        B, H, Wimg, C3 = qkv.shape
        N = ws * ws
        x = qkv.reshape(B, H // ws, ws, Wimg // ws, ws, C3)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, N, C3)
        C = C3 // 3
        gw = g.reshape(B, H // ws, ws, Wimg // ws, ws, C)
        gw = gw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, N, C)
        dx, dscale, dbias = _bwd_jnp(x, scale, bias16, mask,
                                     gw.astype(jnp.float32), num_heads)
        dx = dx.reshape(B, H // ws, Wimg // ws, ws, ws, C3)
        dqkv = dx.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, Wimg, C3)
        dscale = _match_cotangent_vma(dscale, scale)
        dbias = _match_cotangent_vma(dbias, bias16)
        return (dqkv, dscale, dbias,
                jnp.zeros_like(mask) if has_mask else None)

    B, H, Wimg, C3 = qkv.shape
    C = C3 // 3
    N = ws * ws
    nWx = Wimg // ws
    nWy = H // ws
    gq = _sp_pick_g(B, nWx, N)
    grid = (B // gq, nWy)
    compute = qkv.dtype

    args = [qkv, jnp.reshape(scale, (1, num_heads)), bias16]
    if has_mask:
        args.append(mask)
    args.append(g.astype(jnp.float32))
    args = _align_vma(*args)
    vma = _vma_union(*args)

    if has_mask:
        def kernel(q, s, b, m, gg, dq, dsc, db):
            _sp_bwd_body(q, s, b, m, gg, dq, dsc, db, num_heads, compute, ws)
    else:
        def kernel(q, s, b, gg, dq, dsc, db):
            _sp_bwd_body(q, s, b, None, gg, dq, dsc, db, num_heads, compute,
                         ws)
    in_specs = _sp_specs(gq, ws, Wimg, C3, num_heads, has_mask, nWx, N)
    in_specs.append(pl.BlockSpec((gq, ws, Wimg, C), lambda i, j: (i, j, 0, 0),
                                 memory_space=pltpu.VMEM))
    dqkv, dscale, dbias = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((gq, ws, Wimg, C3), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_heads), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_heads, N, N), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Wimg, C3), compute, vma=vma),
            jax.ShapeDtypeStruct((1, num_heads), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((num_heads, N, N), jnp.float32, vma=vma),
        ],
        compiler_params=_ATTN_COMPILER_PARAMS,
    )(*args)

    dscale = _match_cotangent_vma(dscale.reshape(num_heads), scale)
    dbias = _match_cotangent_vma(dbias, bias16)
    dmask = jnp.zeros_like(mask) if has_mask else None
    return (dqkv, dscale, dbias, dmask)


fused_window_attention_spatial.defvjp(_sp_fwd_rule, _sp_bwd_rule)


# Grid-axis head grouping: ng = heads/hg > 1 with the GROUP as a grid
# dimension instead of an unrolled in-body loop. The unrolled loop measured
# a loss at every N=49 shape because Mosaic does not share scoped-VMEM
# stack across the unrolled group bodies — every group's score tensors
# accumulate on top of the repeat buffers, forcing tiny window blocks
# (ROUND4_NOTES.md head-grouped table). With grid (nwb, ng) each program
# holds ONE group's buffers and the pipeline overlaps groups:
#   - q/k/v arrive as three dup-arg views of qkv with group-offset lane
#     index maps, so total input traffic is qkv exactly once;
#   - the dqkv output block covers all 3C lanes at (i, 0, 0) and is
#     retained across the ng CONSECUTIVE group steps (group = fast axis),
#     each step filling its own channel slices — no concat afterwards;
#   - dscale/dbias come out as per-program partials (no cross-step
#     accumulation ordering constraints) and are summed outside.
# Requires Cg = C/ng to be lane-aligned (a multiple of 128) so the q/k/v
# views are legal blocks.
#
# MEASURED (real v5e, scripts/attn_kernel_probe.py, ROUND4_NOTES.md): the
# grid-axis variant fixes the VMEM stacking of the unrolled loop (parity
# clean, relerr ≤ 7.5e-3) but still LOSES to both the per-head kernel and
# the full pack at every N=49 shape — sw3 g4 1.52 vs per-head 0.77 ms
# f+b, sw4 g4 0.83 vs 0.58 — the per-group head-repeat buffers price does
# not amortise at hg·N < 288 lanes. It therefore never runs on a shipping
# dispatch (pick_head_group returns full-pack or per-head only); it
# replaces the unrolled loop whenever a caller explicitly requests an
# aligned head_group, and stays as tested machinery for future shapes.
# (the live module's _pkg_use gate decides when these kernels engage; the
# historical _PK_GROUP_GRID constant lived here before the round-5 split)


def _pkg_fwd_body(q_ref, k_ref, v_ref, scalep_ref, biasp_ref, mask_ref,
                  hm_ref, blockC_ref, segsum_ref, segC_ref, out_ref,
                  hg, compute):
    mask = mask_ref[:] if mask_ref is not None else None
    hm_c = hm_ref[:].astype(compute)
    (_, _, _, _, _, _, _, _, _, vrep, _, e, denom) = _pk_recompute(
        q_ref[:], k_ref[:], v_ref[:], scalep_ref[0], biasp_ref[0], mask,
        hm_c, blockC_ref[:], segsum_ref[:], hg, compute)
    out = lax.dot_general(e.astype(compute), vrep,
                          (((2,), (1,)), ((0,), (0,))),
                          preferred_element_type=jnp.float32)
    invC = _nobatch(1.0 / denom, segC_ref[:])
    out_ref[:] = (out * invC).astype(out_ref.dtype)


def _pkg_bwd_body(q_ref, k_ref, v_ref, scalep_ref, biasp_ref, mask_ref,
                  hm_ref, blockC_ref, segsum_ref, segexp_ref, g_ref,
                  dqkv_ref, dscalep_ref, dbiasp_ref, ng, hg, compute):
    gi = pl.program_id(1)
    mask = mask_ref[:] if mask_ref is not None else None
    hm = hm_ref[:]
    dq, dk, dv, dbias_p, dscale_p = _pk_bwd_one_group(
        q_ref[:], k_ref[:], v_ref[:], scalep_ref[0], biasp_ref[0], mask,
        hm, hm.astype(compute), blockC_ref[:], segsum_ref[:],
        segexp_ref[:], g_ref[:], hg, compute)
    dt = dqkv_ref.dtype
    C = dqkv_ref.shape[2] // 3
    Cg = C // ng
    # static per-group channel offsets via predicated writes (ng is 2-4;
    # dynamic lane-offset stores are not a Mosaic guarantee)
    for t in range(ng):
        @pl.when(gi == t)
        def _(t=t):
            o = t * Cg
            dqkv_ref[:, :, o:o + Cg] = dq.astype(dt)
            dqkv_ref[:, :, C + o:C + o + Cg] = dk.astype(dt)
            dqkv_ref[:, :, 2 * C + o:2 * C + o + Cg] = dv.astype(dt)
    dscalep_ref[0] = dscale_p
    dbiasp_ref[0] = dbias_p


def _pkg_specs(wb, N, C, ng, hg, has_mask, nW):
    """in_specs for the grid-axis grouped kernels: grid (nwb, ng), q/k/v as
    three group-sliced views of the (B_, N, 3C) qkv array."""
    gN = hg * N
    Cg = C // ng
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i, gi: (0,) * len(shape), memory_space=pltpu.VMEM)

    def qview(off):
        return pl.BlockSpec((wb, N, Cg),
                            lambda i, gi, off=off: (i, 0, off * ng + gi),
                            memory_space=pltpu.VMEM)

    specs = [
        qview(0), qview(1), qview(2),
        pl.BlockSpec((1, 1, gN), lambda i, gi: (gi, 0, 0),
                     memory_space=pltpu.VMEM),       # scalep
        pl.BlockSpec((1, N, gN), lambda i, gi: (gi, 0, 0),
                     memory_space=pltpu.VMEM),       # biasp
    ]
    if has_mask:
        specs.append(const((nW, N, gN)))
    specs += [const((gN, Cg)), const((Cg, Cg)), const((gN, hg))]
    return specs


def _pkg_fwd(qkv, scalep, biasp, maskp, num_heads, n_win_per_img,
             block_rows, interpret, out_dtype, hg):
    B_, N, C3 = qkv.shape
    C = C3 // 3
    ng = num_heads // hg
    Cg = C // ng
    compute = qkv.dtype
    has_mask = maskp is not None
    hm, blockC, segsum, _, segC = (jnp.asarray(a) for a in
                                   _pk_constants(hg, N, Cg))
    wb = _pk_pick_block(B_, N, n_win_per_img, Cg, hg,
                        target_rows=block_rows, hg=hg)
    grid = (B_ // wb, ng)
    args = [qkv, qkv, qkv, scalep, biasp] + \
        ([maskp] if has_mask else []) + [hm, blockC, segsum, segC]
    args = _align_vma(*args)
    vma = _vma_union(*args)
    if has_mask:
        def kernel(q, k, v, sc, b, m, *rest):
            _pkg_fwd_body(q, k, v, sc, b, m, *rest, hg, compute)
    else:
        def kernel(q, k, v, sc, b, *rest):
            _pkg_fwd_body(q, k, v, sc, b, None, *rest, hg, compute)
    in_specs = _pkg_specs(wb, N, C, ng, hg, has_mask, n_win_per_img)
    in_specs.append(pl.BlockSpec((hg, Cg), lambda i, gi: (0, 0),
                                 memory_space=pltpu.VMEM))      # segC
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((wb, N, Cg), lambda i, gi: (i, 0, gi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B_, N, C), out_dtype, vma=vma),
        compiler_params=_ATTN_COMPILER_PARAMS,
        interpret=interpret,
    )(*args)


def _pkg_bwd(qkv, scalep, biasp, maskp, g, num_heads, n_win_per_img,
             block_rows, interpret, hg):
    B_, N, C3 = qkv.shape
    C = C3 // 3
    ng = num_heads // hg
    Cg = C // ng
    gN = hg * N
    compute = qkv.dtype
    has_mask = maskp is not None
    hm, blockC, segsum, segexp, _ = (jnp.asarray(a) for a in
                                     _pk_constants(hg, N, Cg))
    wb = _pk_pick_block(B_, N, n_win_per_img, Cg, hg,
                        target_rows=block_rows, hg=hg)
    nwb = B_ // wb
    grid = (nwb, ng)
    args = [qkv, qkv, qkv, scalep, biasp] + \
        ([maskp] if has_mask else []) + [hm, blockC, segsum, segexp, g]
    args = _align_vma(*args)
    vma = _vma_union(*args)
    if has_mask:
        def kernel(q, k, v, sc, b, m, *rest):
            _pkg_bwd_body(q, k, v, sc, b, m, *rest, ng, hg, compute)
    else:
        def kernel(q, k, v, sc, b, *rest):
            _pkg_bwd_body(q, k, v, sc, b, None, *rest, ng, hg, compute)
    in_specs = _pkg_specs(wb, N, C, ng, hg, has_mask, n_win_per_img)
    in_specs.append(pl.BlockSpec((hg, gN), lambda i, gi: (0, 0),
                                 memory_space=pltpu.VMEM))      # segexp
    in_specs.append(pl.BlockSpec((wb, N, Cg), lambda i, gi: (i, 0, gi),
                                 memory_space=pltpu.VMEM))      # g
    dqkv, dscale_parts, dbias_parts = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((wb, N, C3), lambda i, gi: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, gN), lambda i, gi: (i * ng + gi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, gN), lambda i, gi: (i * ng + gi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B_, N, C3), compute, vma=vma),
            jax.ShapeDtypeStruct((nwb * ng, 1, gN), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((nwb * ng, N, gN), jnp.float32, vma=vma),
        ],
        compiler_params=_ATTN_COMPILER_PARAMS,
        interpret=interpret,
    )(*args)
    dscalep = jnp.sum(dscale_parts.reshape(nwb, ng, 1, gN), axis=0)
    dbiasp = jnp.sum(dbias_parts.reshape(nwb, ng, N, gN), axis=0)
    return dqkv, dscalep, dbiasp



# ---------------------------------------------------------------------------
# Entry-fused packed variant (v3): the qkv projection GEMM lives INSIDE the
# kernel. Measured motivation (ROUND4_NOTES.md, fresh AlterNet50 XPlane):
# with the projection outside, the (B_, N, 3C) qkv tensor round-trips HBM in
# a GEMM-preferred {2,0,1} layout and XLA inserts transpose-rate
# (~130 GB/s) relayout copies before every kernel call — ~1.75 ms/step of
# copies plus the qkv write+read itself, and the remat replay doubles the
# copies in the backward. Two XLA-side fixes measured negative (remat off:
# 34.99 ms; 2-D reshaped dots: 35.61 ms vs 34.64 baseline), so the fix is
# structural: take x (B_, N, C) + the (C, 3C) projection weights, compute
# qkv on the MXU in-kernel (M = wb·N rows — fill-efficient), and in the
# backward emit dx directly while accumulating dW/dbias across grid steps
# (same sequential-grid accumulation the dscale/dbias outputs already use).
# The qkv tensor then never exists in HBM in either direction.
# ---------------------------------------------------------------------------


# Backward strategy for the entry-fused op: True (shipping) = fwd-only
# entry fusion with the v2 qkv-input backward kernel behind an XLA qkv
# recompute; False = the all-in-kernel backward (dx/dW/dbias inside) —
# measured negative end-to-end, kept for re-measurement (ROUND4_NOTES.md).
_PKX_HYBRID_BWD = True


def _pkx_qkv(x_ref, w_ref, b_ref, compute):
    """In-kernel qkv projection: (wb, N, C) · (C, 3C) + (1, 3C) → compute
    dtype, f32 MXU accumulation (matches the XLA dot it replaces). The dot
    runs on the flattened (wb·N, C) view so it is ONE fill-efficient
    M = wb·N matmul rather than wb unrolled M = N ones."""
    x = x_ref[:]
    W, N, C = x.shape
    qkv32 = lax.dot_general(x.reshape(W * N, C), w_ref[:].astype(compute),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    qkv32 = qkv32.reshape(W, N, 3 * C)
    return (qkv32 + b_ref[:].astype(jnp.float32)[None]).astype(compute)


def _pkx_fwd_body(x_ref, w_ref, b_ref, scalep_ref, biasp_ref, mask_ref,
                  hm_ref, blockC_ref, segsum_ref, segC_ref, out_ref,
                  num_heads, hg, compute):
    qkv = _pkx_qkv(x_ref, w_ref, b_ref, compute)
    mask = mask_ref[:] if mask_ref is not None else None
    _pk_fwd_groups(qkv, scalep_ref, biasp_ref, mask, hm_ref,
                   blockC_ref, segsum_ref, segC_ref, out_ref,
                   num_heads, hg, compute)


def _pkx_bwd_body(x_ref, w_ref, wT_ref, b_ref, scalep_ref, biasp_ref,
                  mask_ref, hm_ref, blockC_ref, segsum_ref, segexp_ref,
                  g_ref, dx_ref, dw_ref, db_ref, dscalep_ref, dbiasp_ref,
                  num_heads, hg, compute):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dscalep_ref[:] = jnp.zeros_like(dscalep_ref)
        dbiasp_ref[:] = jnp.zeros_like(dbiasp_ref)
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    qkv = _pkx_qkv(x_ref, w_ref, b_ref, compute)
    W, N, C3 = qkv.shape
    C = C3 // 3
    ng = num_heads // hg
    mask = mask_ref[:] if mask_ref is not None else None
    parts = {}

    def store(gi, o, Cg, dq, dk, dv):
        parts[gi] = (dq, dk, dv)

    _pk_bwd_groups(qkv, scalep_ref, biasp_ref, mask, hm_ref, blockC_ref,
                   segsum_ref, segexp_ref, g_ref[:], dscalep_ref, dbiasp_ref,
                   store, num_heads, hg, compute)
    # assemble the full f32 dqkv in registers, then chain through the
    # projection: dx = dqkv · Wᵀ, dW += xᵀ · dqkv, dbias += Σ dqkv
    dqkv32 = jnp.concatenate(
        [parts[gi][j] for j in range(3) for gi in range(ng)], axis=2)
    dqkv_c = dqkv32.astype(compute)
    dx = _nobatch(dqkv_c, wT_ref[:].astype(compute))  # (W, N, C) f32
    dx_ref[:] = dx.astype(dx_ref.dtype)
    x2 = x_ref[:].reshape(W * N, C)
    d2 = dqkv_c.reshape(W * N, C3)
    dw_ref[:] += lax.dot_general(x2, d2, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    db_ref[:] += jnp.sum(dqkv32.reshape(W * N, C3), axis=0, keepdims=True)


def _pkx_jnp(x, w, b, scale, bias16, mask, num_heads):
    """Off-TPU twin: the exact qkv formulation the kernel uses (f32 MXU
    accumulation + f32 bias add, cast to compute) feeding the packed
    oracle."""
    compute = x.dtype
    qkv32 = lax.dot_general(x, w.astype(compute),
                            (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    qkv = (qkv32 + b.astype(jnp.float32)).astype(compute)
    return qkv, _heads_fwd(qkv, scale, bias16, mask, num_heads, compute)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 8, 9, 10, 11))
def fused_window_attention_packed_qkv(x: jnp.ndarray, w: jnp.ndarray,
                                      b: jnp.ndarray, scale: jnp.ndarray,
                                      bias16: jnp.ndarray, num_heads: int,
                                      n_win_per_img: int,
                                      mask: Optional[jnp.ndarray] = None,
                                      block_rows: int = 1024,
                                      interpret: bool = False,
                                      out_dtype=None,
                                      head_group: int = 0) -> jnp.ndarray:
    """Entry-fused packed window attention: x (B_, N, C) compute-dtype
    windows + qkv projection weights w (C, 3C) f32 / bias b (3C,) f32 →
    (B_, N, C) out_dtype. Everything from the qkv GEMM to the pre-proj
    activations runs in one kernel; backward returns (dx, dW, dbias,
    dscale, dbias16) with dW/dbias accumulated across sequential grid
    steps. Semantics match fused_window_attention_packed(x·w + b, ...)
    (reference AlterNet_SwinV2_FAN.py:252-302 — the qkv Linear at :265
    plus the cosine attention it feeds)."""
    return _pkx_fwd(x, w, b, scale, bias16, num_heads, n_win_per_img, mask,
                    block_rows, interpret, out_dtype, head_group)


def _pkx_fwd(x, w, b, scale, bias16, num_heads, n_win_per_img, mask,
             block_rows, interpret=False, out_dtype=None, head_group=0):
    B_, N, C = x.shape
    hg = head_group or num_heads
    assert num_heads % hg == 0 and C % num_heads == 0
    compute = x.dtype
    out_dtype = out_dtype or jnp.float32
    if _interpret() and not interpret:
        return _pkx_jnp(x, w, b, scale, bias16, mask,
                        num_heads)[1].astype(out_dtype)
    has_mask = mask is not None
    Cg = C * hg // num_heads
    hm, blockC, segsum, _, segC = (jnp.asarray(a) for a in
                                   _pk_constants(hg, N, Cg))
    scalep, biasp, maskp = _pk_pack_params(scale, bias16, mask, num_heads,
                                           N, hg)
    wb = _pk_pick_block(B_, N, n_win_per_img, C, num_heads,
                        target_rows=block_rows, hg=hg, qkv_fused=True)
    grid = (B_ // wb,)
    b2 = b.reshape(1, 3 * C)
    args = [x, w, b2, scalep, biasp] + ([maskp] if has_mask else []) + \
        [hm, blockC, segsum, segC]
    args = _align_vma(*args)
    vma = _vma_union(*args)
    if has_mask:
        def kernel(xr, wr, br, sc, bp, m, *rest):
            _pkx_fwd_body(xr, wr, br, sc, bp, m, *rest, num_heads, hg,
                          compute)
    else:
        def kernel(xr, wr, br, sc, bp, *rest):
            _pkx_fwd_body(xr, wr, br, sc, bp, None, *rest, num_heads, hg,
                          compute)
    in_specs = _pkx_specs(wb, N, C, num_heads, hg, has_mask, n_win_per_img)
    in_specs.append(pl.BlockSpec((hg, Cg), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM))     # segC
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((wb, N, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B_, N, C), out_dtype, vma=vma),
        compiler_params=_ATTN_COMPILER_PARAMS,
        interpret=interpret,
    )(*args)


def _pkx_specs(wb, N, C, num_heads, hg, has_mask, nW):
    """in_specs for the entry-fused kernel: x block + projection params +
    the packed-attention constants of _pk_specs."""
    ng = num_heads // hg
    gN = hg * N
    Cg = C // ng
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    specs = [
        pl.BlockSpec((wb, N, C), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        const((C, 3 * C)),       # w
        const((1, 3 * C)),       # bias
        const((ng, 1, gN)),      # scalep
        const((ng, N, gN)),      # biasp
    ]
    if has_mask:
        specs.append(const((nW, N, gN)))
    specs += [const((gN, Cg)), const((Cg, Cg)), const((gN, hg))]
    return specs


def _pkx_fwd_rule(x, w, b, scale, bias16, num_heads, n_win_per_img, mask,
                  block_rows, interpret, out_dtype, head_group):
    out = _pkx_fwd(x, w, b, scale, bias16, num_heads, n_win_per_img, mask,
                   block_rows, interpret, out_dtype, head_group)
    return out, (x, w, b, scale, bias16, mask)


def _pkx_bwd_rule(num_heads, n_win_per_img, block_rows, interpret, out_dtype,
                  head_group, residuals, g):
    x, w, b, scale, bias16, mask = residuals
    B_, N, C = x.shape
    hg = head_group or num_heads
    ng = num_heads // hg
    gN = hg * N
    compute = x.dtype
    has_mask = mask is not None

    if _interpret() and not interpret:
        # chain the packed jnp backward through the projection
        def f(x_, w_, b_, scale_, bias16_):
            qkv, out = _pkx_jnp(x_, w_, b_, scale_, bias16_, mask, num_heads)
            return out.astype(out_dtype or jnp.float32)
        dx, dw, db, dscale, dbias = jax.vjp(f, x, w, b, scale, bias16)[1](g)
        dscale = _match_cotangent_vma(dscale, scale)
        dbias = _match_cotangent_vma(dbias, bias16)
        return (dx, dw, db, dscale, dbias,
                jnp.zeros_like(mask) if has_mask else None)

    if _PKX_HYBRID_BWD:
        # Fwd-only entry fusion (the shipping configuration): recompute qkv
        # with an XLA GEMM (latency-hidden, layout-flexible) feeding the v2
        # qkv-input backward kernel, then chain dx/dW/dbias as XLA dots.
        # The all-in-kernel backward above measured NEGATIVE on the full
        # step (AlterNet50 37.11 vs 34.64 ms — the dx/dW dots serialise
        # against the attention chain inside the kernel body; ROUND4_NOTES)
        # and is kept behind _PKX_HYBRID_BWD=False for re-measurement.
        qkv32 = lax.dot_general(x, w.astype(compute),
                                (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        qkv = (qkv32 + b.astype(jnp.float32)).astype(compute)
        dqkv, dscale, dbias, _ = _pk_bwd_rule(
            num_heads, n_win_per_img, block_rows, interpret, out_dtype,
            head_group, False, (qkv, scale, bias16, mask, None), g)
        dqkv_c = dqkv.astype(compute)
        dx = lax.dot_general(dqkv_c, w.astype(compute).transpose(1, 0),
                             (((2,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32
                             ).astype(compute)
        x2 = x.reshape(B_ * N, C)
        d2 = dqkv_c.reshape(B_ * N, 3 * C)
        dw = lax.dot_general(x2, d2, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
        db = jnp.sum(dqkv.astype(jnp.float32).reshape(B_ * N, 3 * C), axis=0)
        dw = _match_cotangent_vma(dw, w)
        db = _match_cotangent_vma(db, b)
        dmask = jnp.zeros_like(mask) if has_mask else None
        return (dx, dw, db, dscale, dbias, dmask)

    Cg = C // ng
    hm, blockC, segsum, segexp, _ = (jnp.asarray(a) for a in
                                     _pk_constants(hg, N, Cg))
    scalep, biasp, maskp = _pk_pack_params(scale, bias16, mask, num_heads,
                                           N, hg)
    wb = _pk_pick_block(B_, N, n_win_per_img, C, num_heads,
                        target_rows=block_rows, hg=hg, qkv_fused=True)
    grid = (B_ // wb,)
    g = g if g.dtype == compute else g.astype(jnp.float32)
    b2 = b.reshape(1, 3 * C)
    wT = w.transpose(1, 0)
    args = [x, w, wT, b2, scalep, biasp] + ([maskp] if has_mask else []) + \
        [hm, blockC, segsum, segexp, g]
    args = _align_vma(*args)
    vma = _vma_union(*args)
    if has_mask:
        def kernel(xr, wr, wtr, br, sc, bp, m, *rest):
            _pkx_bwd_body(xr, wr, wtr, br, sc, bp, m, *rest, num_heads, hg,
                          compute)
    else:
        def kernel(xr, wr, wtr, br, sc, bp, *rest):
            _pkx_bwd_body(xr, wr, wtr, br, sc, bp, None, *rest, num_heads,
                          hg, compute)
    in_specs = _pkx_specs(wb, N, C, num_heads, hg, has_mask, n_win_per_img)
    in_specs.insert(2, pl.BlockSpec((3 * C, C), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM))  # wT
    in_specs.append(pl.BlockSpec((hg, gN), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM))     # segexp
    in_specs.append(pl.BlockSpec((wb, N, C), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM))     # g
    dx, dw, db2, dscalep, dbiasp = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((wb, N, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ng, 1, gN), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ng, N, gN), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B_, N, C), compute, vma=vma),
            jax.ShapeDtypeStruct((C, 3 * C), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((1, 3 * C), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((ng, 1, gN), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((ng, N, gN), jnp.float32, vma=vma),
        ],
        compiler_params=_ATTN_COMPILER_PARAMS,
        interpret=interpret,
    )(*args)

    dscale = jnp.sum(dscalep.reshape(num_heads, N), axis=1)
    dbias = dbiasp.reshape(ng, N, hg, N).transpose(0, 2, 1, 3).reshape(
        num_heads, N, N)
    dw = _match_cotangent_vma(dw, w)
    db = _match_cotangent_vma(db2.reshape(3 * C), b)
    dscale = _match_cotangent_vma(dscale, scale)
    dbias = _match_cotangent_vma(dbias, bias16)
    dmask = jnp.zeros_like(mask) if has_mask else None
    return (dx, dw, db, dscale, dbias, dmask)


fused_window_attention_packed_qkv.defvjp(_pkx_fwd_rule, _pkx_bwd_rule)


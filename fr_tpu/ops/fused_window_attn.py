"""Fused SwinV2 cosine window-attention Pallas kernel.

XLA lowers the per-head window attention (reference
nets/AlterNet_SwinV2_FAN.py:252-300 — cosine attention over 36-token
windows with 32-wide heads) into per-head batched GEMMs whose operand
layouts force materialised relayout copies and f32 score-tensor HBM round
trips: measured 13.5 ms/step of pure copies plus >20 ms of attention
fusions on the AlterNet50 b=128 step where the attention GEMMs themselves
are ~1.4 GFLOP (ROUND2_NOTES.md AlterNet profile).

This kernel fuses everything BETWEEN the two dense GEMMs that XLA already
runs well (the qkv projection and the output projection stay outside):

    per head: L2-normalise q,k  →  cosine scores (MXU, batched over
    windows) → · clamped-logit-scale + CPB bias (+ SW-MSA mask) →
    f32 softmax → probs · v (MXU) → head concat

per block of windows, entirely in VMEM — the (B_, heads, N, N) score
tensor never exists in HBM. The backward (custom VJP) recomputes scores
and softmax from the saved qkv block (flash-attention-style) and emits
dqkv plus accumulated dscale / dbias grads; the scale/bias/CPB-MLP chain
outside continues under normal AD via the returned cotangents.

Semantics match fr_tpu/models/swin_common.py WindowAttention exactly:
eps-guarded l2_normalize (models/common.py), bf16 MXU inputs with f32
accumulation when mixed precision, f32 softmax, additive -100 SW-MSA mask
(reference nets/AlterNet_SwinV2_FAN.py:375-397).

shard_map-compatible via the same vma plumbing as fused_pfc.py; off-TPU
the kernels run in interpret mode so CPU meshes exercise identical code.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-12  # l2_normalize guard (models/common.py l2_normalize)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _vma_union(*arrays):
    vma = frozenset()
    for a in arrays:
        v = getattr(jax.typeof(a), "vma", None)
        if v:
            vma |= v
    return vma


def _align_vma(*arrays):
    union = _vma_union(*arrays)
    out = []
    for a in arrays:
        have = getattr(jax.typeof(a), "vma", None) or frozenset()
        missing = tuple(sorted(union - have))
        out.append(lax.pcast(a, missing, to="varying") if missing else a)
    return out


def _match_cotangent_vma(cot, primal):
    cvma = getattr(jax.typeof(cot), "vma", None) or frozenset()
    pvma = getattr(jax.typeof(primal), "vma", None) or frozenset()
    extra = tuple(sorted(cvma - pvma))
    if extra:
        cot = lax.psum(cot, extra)
    return cot


def _pick_block(n_windows: int, n_tokens: int, n_win_per_img: int,
                row_bytes: int = 0, target_rows: int = 1024) -> int:
    """Windows per kernel program: a multiple of nW (so the SW-MSA mask
    tiles exactly) that divides the total and keeps the flattened GEMM
    around 512-1024 rows. Measured on AlterNet50 b=128: 4× bigger blocks
    (4096-row target) REGRESSED 42→60 ms/step — large blocks leave no VMEM
    headroom for double-buffered pipelining, so small-and-pipelined wins.
    target_rows (default 1024) is the caller's scoped-VMEM pressure knob:
    EffiAlter's deeper FANSwinBlock graph overflows Mosaic's 16 MB stack at
    the default on its N=49/C=512 backward even though the identical shape
    compiles inside Swin50, so that caller passes 512 (WindowAttention
    block_rows)."""
    del row_bytes
    target = max(1, target_rows // max(1, n_win_per_img * n_tokens))
    g = 1
    n_imgs = n_windows // n_win_per_img
    while g * 2 <= target and n_imgs % (g * 2) == 0:
        g *= 2
    return g * n_win_per_img


def _norm(x_f32, axis=-1):
    """l2_normalize pieces: returns (normalised f32, r, active) where
    r = rsqrt(max(sum x^2, EPS^2)) and active = sum x^2 > EPS^2."""
    s2 = jnp.sum(x_f32 * x_f32, axis=axis, keepdims=True)
    r = lax.rsqrt(jnp.maximum(s2, EPS * EPS))
    return x_f32 * r, r, s2 > EPS * EPS


def _heads_fwd(qkv, scale, bias16, mask_tiled, num_heads, compute_dtype):
    """Forward math on one block, pure jnp: qkv (W, N, 3C) compute-dtype →
    out (W, N, C) f32. The off-TPU twin of _fwd_body and the oracle the
    TPU acceptance script compares the Mosaic lowering against."""
    W, N, C3 = qkv.shape
    C = C3 // 3
    hd = C // num_heads
    outs = []
    for h in range(num_heads):
        o = h * hd
        qh = qkv[:, :, o:o + hd].astype(jnp.float32)
        kh = qkv[:, :, C + o:C + o + hd].astype(jnp.float32)
        vh = qkv[:, :, 2 * C + o:2 * C + o + hd]
        qn, _, _ = _norm(qh)
        kn, _, _ = _norm(kh)
        s_raw = lax.dot_general(
            qn.astype(compute_dtype), kn.astype(compute_dtype),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        s = s_raw * scale[h] + bias16[h][None]
        if mask_tiled is not None:
            nW = mask_tiled.shape[0]
            s = (s.reshape(W // nW, nW, N, N) + mask_tiled[None]
                 ).reshape(W, N, N)
        p = jax.nn.softmax(s, axis=-1)
        o_h = lax.dot_general(
            p.astype(compute_dtype), vh,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        outs.append(o_h)
    return jnp.concatenate(outs, axis=-1)


def _fwd_body(qkv_ref, scale_ref, bias_ref, mask_ref, out_ref,
              num_heads, compute):
    """Per-head results are stored straight into out_ref slices — a single
    concat would keep every head's buffers live simultaneously and can
    exceed the 16 MB scoped-VMEM stack."""
    qkv = qkv_ref[:]
    W, N, C3 = qkv.shape
    C = C3 // 3
    hd = C // num_heads
    scale = scale_ref[0]
    bias16 = bias_ref[:]
    mask = mask_ref[:] if mask_ref is not None else None
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
            nW = mask.shape[0]
            s = (s.reshape(W // nW, nW, N, N) + mask[None]).reshape(W, N, N)
        p = jax.nn.softmax(s, axis=-1)
        out_ref[:, :, o:o + hd] = lax.dot_general(
            p.astype(compute), vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)


def _bwd_body(qkv_ref, scale_ref, bias_ref, mask_ref, g_ref,
              dqkv_ref, dscale_ref, dbias_ref, num_heads, compute):
    """Recompute fwd per head, then exact VJP. dscale/dbias accumulate
    across grid steps (their blocks alias every program)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dscale_ref[:] = jnp.zeros_like(dscale_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    qkv = qkv_ref[:]
    W, N, C3 = qkv.shape
    C = C3 // 3
    hd = C // num_heads
    scale = scale_ref[0]
    bias16 = bias_ref[:]
    mask = mask_ref[:] if mask_ref is not None else None
    g = g_ref[:]

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
            nW = mask.shape[0]
            s = (s.reshape(W // nW, nW, N, N) + mask[None]).reshape(W, N, N)
        p = jax.nn.softmax(s, axis=-1)
        pc = p.astype(compute)

        g_h = g[:, :, o:o + hd]                      # (W, N, hd) f32
        # out_h = p · v  →  dp = g·vᵀ, dv = pᵀ·g. (A store-each-grad-
        # immediately ordering was tried for scoped-VMEM relief and cost
        # AlterNet50 ~1.4 ms/step — the early store serialises against the
        # score dots; the block_rows knob handles VMEM pressure instead.)
        dp = lax.dot_general(g_h.astype(compute), vh,
                             (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
        dv = lax.dot_general(pc, g_h.astype(compute),
                             (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
        # softmax VJP (f32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        # s = s_raw·scale_h + bias16_h (+ mask): bias/scale grads accumulate
        dbias_ref[h] += jnp.sum(ds, axis=0)
        dscales.append(jnp.sum(ds * s_raw))
        ds_raw = ds * scale[h]
        dsc = ds_raw.astype(compute)
        # s_raw = qn·knᵀ
        dqn = lax.dot_general(dsc, knc, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
        dkn = lax.dot_general(dsc, qnc, (((1,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
        # l2_normalize VJP: x·rsqrt(max(Σx², eps²))
        dq = qr * (dqn - jnp.where(
            qa, qn * jnp.sum(dqn * qn, axis=-1, keepdims=True), 0.0))
        dk = kr * (dkn - jnp.where(
            ka, kn * jnp.sum(dkn * kn, axis=-1, keepdims=True), 0.0))
        # direct per-head stores (see _fwd_body note on scoped VMEM)
        dt = dqkv_ref.dtype
        dqkv_ref[:, :, o:o + hd] = dq.astype(dt)
        dqkv_ref[:, :, C + o:C + o + hd] = dk.astype(dt)
        dqkv_ref[:, :, 2 * C + o:2 * C + o + hd] = dv.astype(dt)

    dscale_ref[:] += jnp.stack(dscales).reshape(1, num_heads)


def _specs(n_blocks, wb, N, C3, num_heads, has_mask, nW):
    qkv_spec = pl.BlockSpec((wb, N, C3), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    scale_spec = pl.BlockSpec((1, num_heads), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((num_heads, N, N), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [qkv_spec, scale_spec, bias_spec]
    if has_mask:
        in_specs.append(pl.BlockSpec((nW, N, N), lambda i: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
    return in_specs


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
    )(*args)

    dscale = _match_cotangent_vma(dscale.reshape(num_heads), scale)
    dbias = _match_cotangent_vma(dbias, bias16)
    dmask = jnp.zeros_like(mask) if has_mask else None
    return (dqkv, dscale, dbias, dmask)


fused_window_attention_spatial.defvjp(_sp_fwd_rule, _sp_bwd_rule)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 6))
def fused_window_attention(qkv: jnp.ndarray, scale: jnp.ndarray,
                           bias16: jnp.ndarray,
                           num_heads: int,
                           n_win_per_img: int,
                           mask: Optional[jnp.ndarray] = None,
                           block_rows: int = 1024) -> jnp.ndarray:
    """qkv (B_, N, 3C) compute-dtype; scale (heads,) f32 (already
    exp-clamped); bias16 (heads, N, N) f32 (already 16·sigmoid(CPB));
    mask (nW, N, N) f32 additive or None; block_rows: see _pick_block.
    Returns (B_, N, C) f32."""
    return _fwd(qkv, scale, bias16, num_heads, n_win_per_img, mask,
                block_rows)


def _bwd_jnp(qkv, scale, bias16, mask, g, num_heads):
    """Pure-jnp twin of _bwd_body on the full array (off-TPU path — same
    decomposition, so CPU meshes validate the kernel math; the Mosaic
    lowering itself is covered by scripts/tpu_smoke.py)."""
    W, N, C3 = qkv.shape
    C = C3 // 3
    hd = C // num_heads
    compute = qkv.dtype
    d_parts = []
    dscales = []
    dbiases = []
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
            nW = mask.shape[0]
            s = (s.reshape(W // nW, nW, N, N) + mask[None]).reshape(W, N, N)
        p = jax.nn.softmax(s, axis=-1)
        pc = p.astype(compute)
        g_h = g[:, :, o:o + hd]
        dp = lax.dot_general(g_h.astype(compute), vh,
                             (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
        dv = lax.dot_general(pc, g_h.astype(compute),
                             (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dbiases.append(jnp.sum(ds, axis=0))
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
        d_parts.append((dq, dk, dv))
    dqkv = jnp.concatenate(
        [d[0] for d in d_parts] + [d[1] for d in d_parts]
        + [d[2] for d in d_parts], axis=-1).astype(compute)
    return dqkv, jnp.stack(dscales), jnp.stack(dbiases)


def _fwd(qkv, scale, bias16, num_heads, n_win_per_img, mask,
         block_rows=1024):
    B_, N, C3 = qkv.shape
    C = C3 // 3
    compute = qkv.dtype
    has_mask = mask is not None

    if _interpret():
        return _heads_fwd(qkv, scale, bias16, mask, num_heads, compute)

    wb = _pick_block(B_, N, n_win_per_img, target_rows=block_rows)
    grid = (B_ // wb,)

    args = [qkv, jnp.reshape(scale, (1, num_heads)), bias16]
    if has_mask:
        args.append(mask)
    args = _align_vma(*args)
    vma = _vma_union(*args)

    if has_mask:
        def kernel(q, s, b, m, o):
            _fwd_body(q, s, b, m, o, num_heads, compute)
    else:
        def kernel(q, s, b, o):
            _fwd_body(q, s, b, None, o, num_heads, compute)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=_specs(grid[0], wb, N, C3, num_heads, has_mask,
                        n_win_per_img),
        out_specs=pl.BlockSpec((wb, N, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B_, N, C), jnp.float32, vma=vma),
        interpret=_interpret(),
    )(*args)
    return out


def _fwd_rule(qkv, scale, bias16, num_heads, n_win_per_img, mask,
              block_rows):
    out = _fwd(qkv, scale, bias16, num_heads, n_win_per_img, mask,
               block_rows)
    return out, (qkv, scale, bias16, mask)


def _bwd_rule(num_heads, n_win_per_img, block_rows, residuals, g):
    qkv, scale, bias16, mask = residuals
    B_, N, C3 = qkv.shape
    compute = qkv.dtype
    has_mask = mask is not None

    if _interpret():
        dqkv, dscale, dbias = _bwd_jnp(qkv, scale, bias16, mask,
                                       g.astype(jnp.float32), num_heads)
        dscale = _match_cotangent_vma(dscale, scale)
        dbias = _match_cotangent_vma(dbias, bias16)
        dmask = jnp.zeros_like(mask) if has_mask else None
        return (dqkv, dscale, dbias, dmask)

    wb = _pick_block(B_, N, n_win_per_img, target_rows=block_rows)
    grid = (B_ // wb,)

    args = [qkv, jnp.reshape(scale, (1, num_heads)), bias16]
    if has_mask:
        args.append(mask)
    args.append(g.astype(jnp.float32))
    args = _align_vma(*args)
    vma = _vma_union(*args)

    if has_mask:
        def kernel(q, s, b, m, gg, dq, dsc, db):
            _bwd_body(q, s, b, m, gg, dq, dsc, db, num_heads, compute)
    else:
        def kernel(q, s, b, gg, dq, dsc, db):
            _bwd_body(q, s, b, None, gg, dq, dsc, db, num_heads, compute)
    in_specs = _specs(grid[0], wb, N, C3, num_heads, has_mask,
                      n_win_per_img)
    in_specs.append(pl.BlockSpec((wb, N, C3 // 3), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM))
    dqkv, dscale, dbias = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((wb, N, C3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_heads), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_heads, N, N), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B_, N, C3), compute, vma=vma),
            jax.ShapeDtypeStruct((1, num_heads), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((num_heads, N, N), jnp.float32, vma=vma),
        ],
        interpret=_interpret(),
    )(*args)

    dscale = _match_cotangent_vma(dscale.reshape(num_heads), scale)
    dbias = _match_cotangent_vma(dbias, bias16)
    # mask is a compile-time constant (SW-MSA pattern); zero cotangent
    dmask = jnp.zeros_like(mask) if has_mask else None
    return (dqkv, dscale, dbias, dmask)


fused_window_attention.defvjp(_fwd_rule, _bwd_rule)

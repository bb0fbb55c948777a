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

Two kernel families ship, dispatched by measured shape rule
(swin_common.pick_head_group): the PACKED-lane kernel at the AlterNet
shapes (heads·N ≤ 288 — all heads' scores share the lane dim via
compile-time segment matrices) and the per-head kernel with BATCHED
bodies at the N=49 shapes (every head's tensors stacked on axis 0 — one
fixed op sequence instead of num_heads unrolled VPU chains; round 5,
wins fwd+bwd at every probed shape). Measured-negative designs live in
fused_window_attn_variants.py. Two orthogonal A/B env switches:
FR_ATTN_BATCHED (0 = unrolled bodies) and FR_ATTN_STORED_STATS
(1/0 force the stats/recompute backward everywhere).

shard_map-compatible via the same vma plumbing as fused_pfc.py; under
GSPMD/pjit the kernels partition over their window axis via
jax.experimental.custom_partitioning (_make_cp — no kernel shedding on
multi-device meshes); off-TPU the kernels run in interpret mode so CPU
meshes exercise identical code (FR_ATTN_CP_INTERPRET=1 additionally
routes CPU calls through the partition wrappers for GSPMD testing).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-12  # l2_normalize guard (models/common.py l2_normalize)

# Mosaic's default scoped-VMEM (stack) limit is 16 MB, and the attention
# kernels' stack usage at their measured-optimal blocks sits near it at the
# N=49 shapes — worse, the realized stack depends on how XLA stages the
# surrounding operands, so the SAME kernel can compile inside a lax.scan
# bench yet OOM in a direct value_and_grad jit (measured: packed N=49
# full-pack bwd 16.30 MB, per-head sw4 bwd 22.0 MB in one context, fine in
# another). v5e has 128 MB of VMEM; raise the per-kernel budget so the
# measured-optimal blocks always fit with headroom instead of shrinking
# them below their best-performing sizes.
_ATTN_COMPILER_PARAMS = pltpu.CompilerParams(
    vmem_limit_bytes=64 * 1024 * 1024)


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
        # unnormalised-e form (the packed kernel's segC trick): divide the
        # hd-shaped OUTPUT by the softmax denominator instead of spending a
        # score-shaped pass on p = e/d — exact, softmax is shift-invariant
        m = jnp.max(s, axis=-1, keepdims=True)
        e32 = jnp.exp(s - m)
        d = jnp.sum(e32, axis=-1, keepdims=True)
        out_h = lax.dot_general(
            e32.astype(compute), vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        out_ref[:, :, o:o + hd] = (out_h / d).astype(out_ref.dtype)


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
        # unnormalised-e form (exact — see _fwd_body): p never materialises;
        # the softmax denominator d folds into the hd-shaped cotangent
        # g' = g/d, removing the score-shaped div pass. dv = eᵀ·g' = pᵀ·g;
        # dp' = g'·vᵀ = (g·vᵀ)/d; ds = e⊙(dp' − (Σ_j dp'⊙e)/d)
        #            = p⊙(dp − Σ_j dp⊙p) exactly.
        m_sh = jnp.max(s, axis=-1, keepdims=True)
        e32 = jnp.exp(s - m_sh)
        d = jnp.sum(e32, axis=-1, keepdims=True)
        ec = e32.astype(compute)

        g_h = g[:, :, o:o + hd]              # (W, N, hd) f32 or compute
        # (A store-each-grad-immediately ordering was tried for scoped-VMEM
        # relief and cost AlterNet50 ~1.4 ms/step — the early store
        # serialises against the score dots; the block_rows knob handles
        # VMEM pressure instead. A bf16 score-shaped VJP chain was measured
        # negative twice — the extra full-tile casts cost more than the
        # halved chain saves; ROUND4_NOTES/ROUND5_NOTES — so the chain is
        # f32 with no knob.)
        gp = (g_h.astype(jnp.float32) * lax.reciprocal(d)).astype(compute)
        dp = lax.dot_general(gp, vh,
                             (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
        dv = lax.dot_general(ec, gp,
                             (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
        # softmax VJP in f32; row-sums accumulate f32
        rs = (jnp.sum(dp * e32, axis=-1, keepdims=True,
                      dtype=jnp.float32) * lax.reciprocal(d))
        ds = e32 * (dp - rs)
        # s = s_raw·scale_h + bias16_h (+ mask): bias/scale grads accumulate
        dbias_ref[h] += jnp.sum(ds, axis=0, dtype=jnp.float32)
        dsc = (ds * scale[h]).astype(compute)
        # s_raw = qn·knᵀ
        dqn = lax.dot_general(dsc, knc, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
        dkn = lax.dot_general(dsc, qnc, (((1,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
        # dscale_h = Σ ds·s_raw ≡ Σ_c(dqn·qn)/scale_h exactly (dqn = dsc·kn,
        # dsc = ds·scale_h — the stats kernel's identity): an hd-shaped f32
        # pass instead of a score-shaped one
        dscales.append(jnp.sum(dqn * qn) / scale[h])
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


def _attn_batched() -> bool:
    """Batched kernel bodies (DEFAULT since round 5; FR_ATTN_BATCHED=0
    forces the unrolled bodies as the A/B arm): every head's (wb, N, ·)
    tensor is stacked on axis 0 into one (heads·wb, N, ·) tensor, so the
    whole forward/backward is a FIXED sequence of ~12 batched ops instead
    of num_heads unrolled chains. The round-4 Mosaic split probe localised
    ~90% of the backward in the per-head VPU chains while XLA runs the
    identical math (at the identical 49→128 lane padding) ~3× faster —
    i.e. the cost is per-op composition/scheduling, not per-element work.
    Axis-0 stacking keeps every store/slice tile-aligned (no lane
    repacking) and leaves the MXU dots as single batched dot_generals.

    MEASURED (round 5, real v5e, value_and_grad probe, ROUND5_NOTES.md):
    wins at every probed shape, both IO dtypes, masked and unmasked —
    fwd+bwd sw3 1.478→1.283 (masked 1.521→0.934), sw4 0.866→0.619
    (masked 0.882→0.671) f32-io; bf16-io sw3 1.590→1.291, sw4 0.851→0.602
    (masked 0.878→0.571) — and beats the round-4 stored-stats backward at
    every N=49 shape. Parity bit-identical to the unrolled bodies.

    VMEM scaling (ADVICE r4 low #3): unlike the unrolled bodies — whose
    per-head buffers Mosaic can reuse across iterations — the batched
    bodies keep EVERY head's (wb, N, ·) tensors live at once, so scoped
    VMEM grows ~heads× at a given block_rows. _pick_block_batched clamps
    the window block so the estimated live set stays well inside the
    64 MB kernel budget."""
    return os.environ.get("FR_ATTN_BATCHED", "1") == "1"


def _pick_block_batched(n_windows: int, n_tokens: int, n_win_per_img: int,
                        num_heads: int, target_rows: int) -> int:
    """Block pick for the batched bodies: same divisibility rules as
    _pick_block, with the window count additionally clamped so the
    batched backward's live set — ~8 score-shaped f32 tensors of
    (heads·wb, N, pad128(N)) plus the hd-shaped stacks — fits in the
    scoped-VMEM budget (default 24 MB of the 64 MB kernel limit, leaving
    pipelining headroom; FR_ATTN_BATCHED_VMEM_MB sweeps it — the round-5
    16/24/48 MB A/B measured all three within run noise at sw3/sw4, a
    flat optimum; 24 keeps double-buffering headroom, ROUND5_NOTES)."""
    budget_mb = int(os.environ.get("FR_ATTN_BATCHED_VMEM_MB", "24"))
    pad_n = -(-n_tokens // 128) * 128
    per_window = num_heads * n_tokens * pad_n * 4 * 8
    allowed = max(1, (budget_mb * 1024 * 1024) // per_window)
    return _pick_block(n_windows, n_tokens, n_win_per_img,
                       target_rows=min(target_rows, allowed * n_tokens))


def _stack_heads(x, C, hd, num_heads, base=0):
    """(W, N, C-lanes) → (num_heads·W, N, hd): per-head lane slices
    concatenated on axis 0 (the same slices the unrolled bodies take)."""
    return jnp.concatenate(
        [x[:, :, base + h * hd:base + (h + 1) * hd]
         for h in range(num_heads)], axis=0)


def _apply_scale_bias_mask(s_raw, scale, bias16, mask, num_heads, W, N):
    """Per-head scale·s + bias (+ mask) on axis-0 slabs of the stacked
    score tensor. Mosaic cannot broadcast a lane vector across a major
    axis (`vector<1xh> → vector<hx1x1x1>` is an unsupported shape cast),
    so the head-varying FMA stays a static per-head loop — 2 of the ~15
    score-shaped passes; everything else in the batched bodies is one op."""
    parts = []
    for h in range(num_heads):
        part = s_raw[h * W:(h + 1) * W] * scale[h] + bias16[h][None]
        if mask is not None:
            nW = mask.shape[0]
            part = (part.reshape(W // nW, nW, N, N)
                    + mask[None]).reshape(W, N, N)
        parts.append(part)
    return jnp.concatenate(parts, axis=0)


def _fwd_body_batched(qkv_ref, scale_ref, bias_ref, mask_ref, out_ref,
                      num_heads, compute):
    """_fwd_body math with heads stacked on axis 0 (see _attn_batched)."""
    qkv = qkv_ref[:]
    W, N, C3 = qkv.shape
    C = C3 // 3
    hd = C // num_heads
    scale = scale_ref[0]
    bias16 = bias_ref[:]
    mask = mask_ref[:] if mask_ref is not None else None
    q_st = _stack_heads(qkv, C, hd, num_heads).astype(jnp.float32)
    k_st = _stack_heads(qkv, C, hd, num_heads, C).astype(jnp.float32)
    v_st = _stack_heads(qkv, C, hd, num_heads, 2 * C)
    qn, _, _ = _norm(q_st)
    kn, _, _ = _norm(k_st)
    s_raw = lax.dot_general(qn.astype(compute), kn.astype(compute),
                            (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    s = _apply_scale_bias_mask(s_raw, scale, bias16, mask, num_heads, W, N)
    m_sh = jnp.max(s, axis=-1, keepdims=True)
    e32 = jnp.exp(s - m_sh)
    d = jnp.sum(e32, axis=-1, keepdims=True)
    out_st = lax.dot_general(
        e32.astype(compute), v_st, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * lax.reciprocal(d)
    dt = out_ref.dtype
    for h in range(num_heads):
        out_ref[:, :, h * hd:(h + 1) * hd] = \
            out_st[h * W:(h + 1) * W].astype(dt)


def _bwd_body_batched(qkv_ref, scale_ref, bias_ref, mask_ref, g_ref,
                      dqkv_ref, dscale_ref, dbias_ref, num_heads, compute):
    """_bwd_body math (unnormalised-e form, dscale via the norm-VJP
    identity) with heads stacked on axis 0 — see _attn_batched."""
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
    q_st = _stack_heads(qkv, C, hd, num_heads).astype(jnp.float32)
    k_st = _stack_heads(qkv, C, hd, num_heads, C).astype(jnp.float32)
    v_st = _stack_heads(qkv, C, hd, num_heads, 2 * C)
    g_st = _stack_heads(g, C, hd, num_heads)
    qn, qr, qa = _norm(q_st)
    kn, kr, ka = _norm(k_st)
    qnc = qn.astype(compute)
    knc = kn.astype(compute)
    s_raw = lax.dot_general(qnc, knc, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    s = _apply_scale_bias_mask(s_raw, scale, bias16, mask, num_heads, W, N)
    m_sh = jnp.max(s, axis=-1, keepdims=True)
    e32 = jnp.exp(s - m_sh)
    d = jnp.sum(e32, axis=-1, keepdims=True)
    ec = e32.astype(compute)
    # score-shaped VJP chain in f32 (a bf16 chain was measured negative
    # twice — see _bwd_body's note)
    gp = (g_st.astype(jnp.float32) * lax.reciprocal(d)).astype(compute)
    dp = lax.dot_general(gp, v_st, (((2,), (2,)), ((0,), (0,))),
                         preferred_element_type=jnp.float32)
    dv = lax.dot_general(ec, gp, (((1,), (1,)), ((0,), (0,))),
                         preferred_element_type=jnp.float32)
    rs = (jnp.sum(dp * e32, axis=-1, keepdims=True, dtype=jnp.float32)
          * lax.reciprocal(d))
    ds = e32 * (dp - rs)
    # per-head slab ops (lane-vector broadcasts are unsupported — see
    # _apply_scale_bias_mask): dbias reduce, scale mult, dscale sums
    dsc_parts = []
    dscales = []
    for h in range(num_heads):
        ds_h = ds[h * W:(h + 1) * W]
        dbias_ref[h] += jnp.sum(ds_h, axis=0, dtype=jnp.float32)
        dsc_parts.append((ds_h * scale[h]).astype(compute))
    dsc = jnp.concatenate(dsc_parts, axis=0)
    dqn = lax.dot_general(dsc, knc, (((2,), (1,)), ((0,), (0,))),
                          preferred_element_type=jnp.float32)
    dkn = lax.dot_general(dsc, qnc, (((1,), (1,)), ((0,), (0,))),
                          preferred_element_type=jnp.float32)
    rd_q = jnp.sum(dqn * qn, axis=-1, keepdims=True)
    # dscale_h = Σ ds·s_raw ≡ Σ_c(dqn·qn)/scale_h (stats-kernel identity)
    for h in range(num_heads):
        dscales.append(jnp.sum(rd_q[h * W:(h + 1) * W]) / scale[h])
    dscale_ref[:] += jnp.stack(dscales).reshape(1, num_heads)
    dq = qr * (dqn - jnp.where(qa, qn * rd_q, 0.0))
    dk = kr * (dkn - jnp.where(
        ka, kn * jnp.sum(dkn * kn, axis=-1, keepdims=True), 0.0))
    dt = dqkv_ref.dtype
    for h in range(num_heads):
        o = h * hd
        dqkv_ref[:, :, o:o + hd] = dq[h * W:(h + 1) * W].astype(dt)
        dqkv_ref[:, :, C + o:C + o + hd] = \
            dk[h * W:(h + 1) * W].astype(dt)
        dqkv_ref[:, :, 2 * C + o:2 * C + o + hd] = \
            dv[h * W:(h + 1) * W].astype(dt)


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
# GSPMD partitioning for the kernels (VERDICT r4 #4 / missing #3)
# ---------------------------------------------------------------------------
#
# pallas_call has no SPMD partitioning rule, so before round 5 the
# gspmd/pjit lowering (train/step.py make_gspmd_train_step) had to clone
# the encoder onto the jnp attention path on any multi-device mesh —
# silently giving up the kernel wins. The window-attention kernels are
# shard-local along the window axis by construction (every window attends
# only within itself; scale/bias/mask are replicated constants), so
# jax.experimental.custom_partitioning can teach GSPMD exactly that: the
# op partitions over dim 0 of qkv/g/out with zero communication, and the
# backward's dscale/dbias reductions psum over whatever mesh axes the
# window dim is sharded on. The shard_map lowering never sees these
# wrappers (its operands carry vma and take the direct pallas path);
# interpret-mode meshes exercise the same partitioning via
# FR_ATTN_CP_INTERPRET=1 (the multichip dryrun and tests set it — the
# partition callbacks then run the REAL per-shard pallas program under
# the Pallas interpreter on a CPU mesh).

from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as _P


def _cp_interpret() -> bool:
    """FR_ATTN_CP_INTERPRET=1: route off-TPU calls through the
    custom_partitioning wrappers (per-shard pallas programs under the
    interpreter) instead of the jnp twins — so CPU meshes can execute and
    test the GSPMD partitioning rules themselves."""
    return os.environ.get("FR_ATTN_CP_INTERPRET", "0") == "1"


def _make_cp(fn, in_dims, out_dims, rule, n_static, factor_sizes=None):
    """custom_partitioning wrapper for a shard-local kernel entry.

    in_dims / out_dims: per-operand shard dim (int), None for replicated,
    or "sum" (outputs only) for shard-local partials that must be psummed
    over the sharded axis' mesh axes. `rule` is the shardy SdyShardingRule
    einsum string (factor_sizes supplies sizes for factors that only
    appear inside compound dimensions); `n_static` trailing args are
    static (hashable config). The partition lower_fn calls `fn` per shard
    — the pallas grid/block logic sees per-shard shapes, exactly as under
    shard_map. Also used by ops/sparse_rows for the class-sharded grouped
    gather/update kernels."""
    cp = custom_partitioning(
        fn, static_argnums=tuple(range(len(in_dims), len(in_dims)
                                       + n_static)))

    def _d0(arg_shapes):
        for s, dim in zip(arg_shapes, in_dims):
            if dim is not None:
                spec = s.sharding.spec
                if len(spec) > dim and spec[dim] is not None:
                    return spec[dim]
        return None

    def _nsh(mesh, d0, rank, dim):
        parts = [None] * rank
        if dim is not None and not isinstance(dim, str):
            parts[dim] = d0
        return NamedSharding(mesh, _P(*parts))

    def _outs(mesh, d0, result_shape):
        many = isinstance(result_shape, (list, tuple))
        shapes = result_shape if many else [result_shape]
        outs = tuple(_nsh(mesh, d0, len(r.shape), dim)
                     for r, dim in zip(shapes, out_dims))
        return outs if many else outs[0]

    def infer(*a):
        mesh, arg_shapes, result_shape = a[n_static:]
        return _outs(mesh, _d0(arg_shapes), result_shape)

    def partition(*a):
        statics = a[:n_static]
        mesh, arg_shapes, result_shape = a[n_static:]
        d0 = _d0(arg_shapes)
        arg_sh = tuple(_nsh(mesh, d0, len(s.shape), dim)
                       for s, dim in zip(arg_shapes, in_dims))
        axes = tuple(ax for ax in (d0 if isinstance(d0, tuple) else (d0,))
                     if ax)

        def lower(*args):
            res = fn(*args, *statics)
            if axes and any(d == "sum" for d in out_dims):
                res = list(res)
                for i, d in enumerate(out_dims):
                    if d == "sum":
                        res[i] = lax.psum(res[i], axes)
                res = tuple(res)
            return res

        return mesh, lower, _outs(mesh, d0, result_shape), arg_sh

    cp.def_partition(partition, infer_sharding_from_operands=infer,
                     sharding_rule=rule, **(factor_sizes or {}))
    return cp



# ---------------------------------------------------------------------------
# Stored-stats variant of the per-head VJP (round 4): the forward saves the
# per-head softmax probabilities so the backward skips the score dot,
# bias/mask adds and softmax recompute. Flash-attention-style recompute
# exists because p is O(N^2) per token pair at long N — here N is 9-49, so p
# costs only W*N*N*4 bytes (sw3: 4.8 MB, sw4: 1.2 MB; write-in-fwd +
# read-in-bwd ~ tens of us at HBM rate) while the recompute it replaces is
# MXU + transcendental work on 128-lane-padded tiles. The l2 norms stay
# recomputed (pure VPU, cheaper than round-tripping qn/kn). s_raw is NOT
# stored: dscale_h = sum(ds . s_raw) equals sum_c(dqn . qn)/scale_h exactly
# (dqn = dsc . kn so sum_c dqn.qn = sum_j dsc.(qn.kn^T)_j = sum_j dsc.s_raw,
# dsc = ds*scale_h), and the dqn.qn row-sums are already computed for the
# norm VJP — storing only p halves the stat HBM traffic.
# ---------------------------------------------------------------------------


def _fwd_body_stats(qkv_ref, scale_ref, bias_ref, mask_ref, out_ref,
                    p_ref, num_heads, compute):
    """_fwd_body plus the per-head softmax store: the p_ref block is
    (num_heads, wb, N, N) f32, head-indexed so each store is contiguous."""
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
        s_raw = lax.dot_general(qn.astype(compute), kn.astype(compute),
                                (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        s = s_raw * scale[h] + bias16[h][None]
        if mask is not None:
            nW = mask.shape[0]
            s = (s.reshape(W // nW, nW, N, N) + mask[None]).reshape(W, N, N)
        p = jax.nn.softmax(s, axis=-1)
        p_ref[h] = p
        out_ref[:, :, o:o + hd] = lax.dot_general(
            p.astype(compute), vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _bwd_body_stats(qkv_ref, scale_ref, p_ref, g_ref,
                    dqkv_ref, dscale_ref, dbias_ref, num_heads, compute):
    """Exact VJP from stored p — no score recompute. bias16 and mask are
    not needed at all (dbias = sum(ds); the mask only shifted s), and
    dscale comes from the norm-VJP row-sums (see the identity above)."""
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
    g = g_ref[:]

    dscales = []
    for h in range(num_heads):
        o = h * hd
        qh = qkv[:, :, o:o + hd].astype(jnp.float32)
        kh = qkv[:, :, C + o:C + o + hd].astype(jnp.float32)
        vh = qkv[:, :, 2 * C + o:2 * C + o + hd]
        qn, qr, qa = _norm(qh)
        kn, kr, ka = _norm(kh)
        p = p_ref[h]
        pc = p.astype(compute)
        g_h = g[:, :, o:o + hd]
        dp = lax.dot_general(g_h.astype(compute), vh,
                             (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
        dv = lax.dot_general(pc, g_h.astype(compute),
                             (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dbias_ref[h] += jnp.sum(ds, axis=0)
        dsc = (ds * scale[h]).astype(compute)
        dqn = lax.dot_general(dsc, kn.astype(compute),
                              (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
        dkn = lax.dot_general(dsc, qn.astype(compute),
                              (((1,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
        rs_q = jnp.sum(dqn * qn, axis=-1, keepdims=True)
        dscales.append(jnp.sum(rs_q) / scale[h])
        dq = qr * (dqn - jnp.where(qa, qn * rs_q, 0.0))
        dk = kr * (dkn - jnp.where(
            ka, kn * jnp.sum(dkn * kn, axis=-1, keepdims=True), 0.0))
        dt = dqkv_ref.dtype
        dqkv_ref[:, :, o:o + hd] = dq.astype(dt)
        dqkv_ref[:, :, C + o:C + o + hd] = dk.astype(dt)
        dqkv_ref[:, :, 2 * C + o:2 * C + o + hd] = dv.astype(dt)

    dscale_ref[:] += jnp.stack(dscales).reshape(1, num_heads)


def _stat_spec(num_heads, wb, N):
    return pl.BlockSpec((num_heads, wb, N, N), lambda i: (0, i, 0, 0),
                        memory_space=pltpu.VMEM)


def _fwd_stats(qkv, scale, bias16, num_heads, n_win_per_img, mask,
               block_rows, out_dtype, interpret=None):
    """Forward emitting (out, p_stats); p_stats is f32
    (num_heads, B_, N, N). Only used under differentiation — the primal
    path keeps the stat-free kernel. Same GSPMD routing as _fwd: direct
    pallas under shard_map (vma) or when the caller forces interpret;
    custom_partitioning otherwise (p_stats shards on its window dim 1)."""
    if (interpret is None and not _vma_union(
            qkv, scale, bias16, *([mask] if mask is not None else []))):
        maskd = (mask if mask is not None
                 else jnp.zeros((1, 1, 1), jnp.float32))
        return _fwd_stats_cp(qkv, scale, bias16, maskd, num_heads,
                             n_win_per_img, block_rows,
                             jnp.dtype(out_dtype or jnp.float32),
                             mask is not None)
    return _fwd_stats_pallas(qkv, scale, bias16, num_heads, n_win_per_img,
                             mask, block_rows, out_dtype, interpret)


def _fwd_stats_cp_impl(qkv, scale, bias16, maskd, num_heads, n_win_per_img,
                       block_rows, out_dtype, has_mask):
    return _fwd_stats_pallas(qkv, scale, bias16, num_heads, n_win_per_img,
                             maskd if has_mask else None, block_rows,
                             out_dtype)


_fwd_stats_cp = _make_cp(
    _fwd_stats_cp_impl, in_dims=(0, None, None, None), out_dims=(0, 1),
    rule="b n c, h, i j k, u v w -> b n d, e b n2 n3", n_static=5)


def _fwd_stats_pallas(qkv, scale, bias16, num_heads, n_win_per_img, mask,
                      block_rows, out_dtype, interpret=None):
    B_, N, C3 = qkv.shape
    C = C3 // 3
    compute = qkv.dtype
    out_dtype = out_dtype or jnp.float32
    has_mask = mask is not None
    if interpret is None:
        interpret = _interpret()

    wb = _pick_block(B_, N, n_win_per_img, target_rows=block_rows)
    grid = (B_ // wb,)

    args = [qkv, jnp.reshape(scale, (1, num_heads)), bias16]
    if has_mask:
        args.append(mask)
    args = _align_vma(*args)
    vma = _vma_union(*args)

    if has_mask:
        def kernel(q, s, b, m, o, p):
            _fwd_body_stats(q, s, b, m, o, p, num_heads, compute)
    else:
        def kernel(q, s, b, o, p):
            _fwd_body_stats(q, s, b, None, o, p, num_heads, compute)
    out, p_st = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=_specs(grid[0], wb, N, C3, num_heads, has_mask,
                        n_win_per_img),
        out_specs=[
            pl.BlockSpec((wb, N, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            _stat_spec(num_heads, wb, N),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B_, N, C), out_dtype, vma=vma),
            jax.ShapeDtypeStruct((num_heads, B_, N, N), jnp.float32,
                                 vma=vma),
        ],
        compiler_params=_ATTN_COMPILER_PARAMS,
        interpret=interpret,
    )(*args)
    return out, p_st


def _bwd_stats(qkv, scale, p_st, g, num_heads, n_win_per_img,
               block_rows, interpret=None):
    if (interpret is None
            and not _vma_union(qkv, scale, p_st, g)):
        return _bwd_stats_cp(qkv, scale, p_st, g, num_heads,
                             n_win_per_img, block_rows)
    return _bwd_stats_pallas(qkv, scale, p_st, g, num_heads, n_win_per_img,
                             block_rows, interpret)


_bwd_stats_cp = None  # defined after _bwd_stats_pallas below


def _bwd_stats_pallas(qkv, scale, p_st, g, num_heads, n_win_per_img,
                      block_rows, interpret=None):
    B_, N, C3 = qkv.shape
    compute = qkv.dtype
    if interpret is None:
        interpret = _interpret()

    wb = _pick_block(B_, N, n_win_per_img, target_rows=block_rows)
    grid = (B_ // wb,)

    args = _align_vma(qkv, jnp.reshape(scale, (1, num_heads)), p_st, g)
    vma = _vma_union(*args)

    def kernel(q, s, p, gg, dq, dsc, db):
        _bwd_body_stats(q, s, p, gg, dq, dsc, db, num_heads, compute)

    in_specs = [
        pl.BlockSpec((wb, N, C3), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, num_heads), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        _stat_spec(num_heads, wb, N),
        pl.BlockSpec((wb, N, C3 // 3), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
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
        compiler_params=_ATTN_COMPILER_PARAMS,
        interpret=interpret,
    )(*args)
    return dqkv, dscale, dbias


_bwd_stats_cp = _make_cp(
    _bwd_stats_pallas, in_dims=(0, None, 1, 0),
    out_dims=(0, "sum", "sum"),
    rule="b n c, h, e b n2 n3, b n d -> b n c, p q, r s t", n_static=3)


# ---------------------------------------------------------------------------
# Packed-lane variant (v2): all heads' scores in one (W, N, heads·N) tensor.
# ---------------------------------------------------------------------------
#
# The per-head variant above pays lane padding on every f32 score-tensor VPU
# op: per head the (W, N, N) arrays pad N=36→128 lanes (3.6×) or N=9→128
# (14×), and the round-3 decomposition showed the recompute-backward running
# ~9× over its HBM floor — the padded VPU work, not HBM, is the bottleneck
# (VERDICT r3 next #1, "head-packed lane layout"). Here every score-shaped
# tensor is (W, N, heads·N) — lanes hj = h·N + j — so padding drops to
# 144→256 (1.8×), 288→384 (1.3×), 144→256 (1.8×) on the three AlterNet50
# stage shapes. Per-head semantics (segmented softmax, per-head l2 norm)
# are expressed with tiny compile-time 0/1 matrices on the MXU:
#
#   blockC (C, C)        sumsq over each head's hd channels, expanded to C
#   hm     (hN, C)       head-block indicator masking the k/v repeats
#   segsum (hN, heads)   per-(row, head) segment sums of score-shaped data
#   segexp (heads, hN)   expand per-head values back to packed lanes
#   segC   (heads, C)    expand per-head values to channel lanes
#
# k and v are repeated head-times along tokens and masked by hm, so ONE
# batched dot computes all heads' scores / outputs: qn (W,N,C) · krep
# (W,hN,C) → (W,N,hN) and e (W,N,hN) · vrep (W,hN,C) → (W,N,C), the output
# already in concat layout. The softmax max-shift uses the max over the
# whole packed row — any shift ≥ the per-segment max is exact, so no
# segmented max is needed. Numerics otherwise match the per-head variant
# (f32 softmax, compute-dtype MXU operands, eps-guarded norm).


@functools.lru_cache(maxsize=None)
def _pk_constants(num_heads: int, N: int, C: int):
    import numpy as np
    hN = num_heads * N
    hd = C // num_heads
    hm = np.zeros((hN, C), np.float32)
    blockC = np.zeros((C, C), np.float32)
    segsum = np.zeros((hN, num_heads), np.float32)
    segexp = np.zeros((num_heads, hN), np.float32)
    segC = np.zeros((num_heads, C), np.float32)
    for h in range(num_heads):
        hm[h * N:(h + 1) * N, h * hd:(h + 1) * hd] = 1.0
        blockC[h * hd:(h + 1) * hd, h * hd:(h + 1) * hd] = 1.0
        segsum[h * N:(h + 1) * N, h] = 1.0
        segexp[h, h * N:(h + 1) * N] = 1.0
        segC[h, h * hd:(h + 1) * hd] = 1.0
    return hm, blockC, segsum, segexp, segC


def _nobatch(lhs, rhs):
    """lhs (..., K) · rhs (K, N) → (..., N), f32 accumulate."""
    return lax.dot_general(lhs, rhs, (((lhs.ndim - 1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)


def _pk_pick_block(n_windows: int, n_tokens: int, n_win_per_img: int,
                   C: int, num_heads: int, target_rows: int,
                   hg: int = 0, qkv_fused: bool = False) -> int:
    """Windows per program for the packed kernel. Same shape rules as
    _pick_block (multiple of nW, divides the total) plus a scoped-VMEM cap:
    the dominant per-window buffers are the head-repeated k/v (gN, Cg)
    compute-dtype pair and the f32 (gN, Cg) fold inputs in the backward —
    together ≈ gN·Cg·8 bytes/window per head GROUP (the group loop reuses
    them; gN = hg·N, Cg = hg·hd — matches the measured 35.6 MB stack at the
    full-pack s4 wb=64 that OOM'd Mosaic's 16 MB limit). Cap the block so
    that estimate stays ≤ 10 MB, leaving headroom for the score tensors."""
    hg = hg or num_heads
    ng = num_heads // hg
    gN = hg * n_tokens
    Cg = C * hg // num_heads
    per_win = gN * Cg * 8
    if ng > 1:
        # The group loop is UNROLLED in the kernel body and Mosaic does not
        # share stack across the unrolled bodies: every group's live
        # score-shaped f32 tensors (~7 of (N, gN): s_cos, e, p, dp, ds,
        # rowexp, invexp) accumulate on top of the repeat buffers. Measured:
        # sw3 hg=2 wb=16 hit a 16.65 MB stack (~1.04 MB/window) where the
        # ng=1 model predicted 0.8 MB total; this term predicts 0.95.
        per_win = ng * (per_win + 7 * n_tokens * gN * 4)
    if qkv_fused:
        # entry-fused kernel adds the in-register qkv (compute, 2 B) and in
        # the backward the f32 dqkv + its compute-dtype cast (4 + 2 B) —
        # all (N, 3C)-shaped per window
        per_win += n_tokens * 3 * C * 8
    cap = max(1, (10 * 1024 * 1024) // (per_win * n_win_per_img))
    target = max(1, target_rows // max(1, n_win_per_img * n_tokens))
    target = min(target, cap)
    g = 1
    n_imgs = n_windows // n_win_per_img
    while g * 2 <= target and n_imgs % (g * 2) == 0:
        g *= 2
    return g * n_win_per_img


def _pk_recompute(q, k, v, scalep, biasp, mask, hm_c, blockC, segsum,
                  hg, compute):
    """Shared fwd math on one head-GROUP slice: q/k/v (W, N, Cg)
    compute-dtype where Cg = hg·hd. Returns (qn32, rq, aq, kn32, rk, ak,
    qn, kn, krep, vrep, s_cos, e, denom); every score-shaped tensor is
    (W, N, hg·N). The full pack is the hg = num_heads single-group case."""
    W, N, _ = q.shape
    q = q.astype(jnp.float32)
    k = k.astype(jnp.float32)
    ssq_q = _nobatch(q * q, blockC)
    ssq_k = _nobatch(k * k, blockC)
    rq = lax.rsqrt(jnp.maximum(ssq_q, EPS * EPS))
    rk = lax.rsqrt(jnp.maximum(ssq_k, EPS * EPS))
    aq = ssq_q > EPS * EPS
    ak = ssq_k > EPS * EPS
    qn32 = q * rq
    kn32 = k * rk
    qn = qn32.astype(compute)
    kn = kn32.astype(compute)
    krep = jnp.concatenate([kn] * hg, axis=1) * hm_c
    vrep = jnp.concatenate([v] * hg, axis=1) * hm_c
    s_cos = lax.dot_general(qn, krep, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    s = s_cos * scalep[None] + biasp[None]
    if mask is not None:
        nW = mask.shape[0]
        s = (s.reshape(W // nW, nW, N, hg * N) + mask[None]
             ).reshape(W, N, hg * N)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    denom = _nobatch(e, segsum)                       # (W, N, hg)
    return (qn32, rq, aq, kn32, rk, ak, qn, kn, krep, vrep, s_cos, e, denom)


def _pk_fwd_groups(qkv, scalep_ref, biasp_ref, mask, hm_ref,
                   blockC_ref, segsum_ref, segC_ref, out_ref,
                   num_heads, hg, compute):
    """Group loop of the packed forward on a qkv VALUE — shared between the
    qkv-input body and the entry-fused (x-input) body."""
    W, N, C3 = qkv.shape
    C = C3 // 3
    ng = num_heads // hg
    Cg = C // ng
    hm_c = hm_ref[:].astype(compute)
    for gi in range(ng):
        o = gi * Cg
        (_, _, _, _, _, _, _, _, _, vrep, _, e, denom) = _pk_recompute(
            qkv[:, :, o:o + Cg], qkv[:, :, C + o:C + o + Cg],
            qkv[:, :, 2 * C + o:2 * C + o + Cg],
            scalep_ref[gi], biasp_ref[gi], mask, hm_c,
            blockC_ref[:], segsum_ref[:], hg, compute)
        out = lax.dot_general(e.astype(compute), vrep,
                              (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
        invC = _nobatch(1.0 / denom, segC_ref[:])     # (W, N, Cg)
        out_ref[:, :, o:o + Cg] = (out * invC).astype(out_ref.dtype)


def _pk_fwd_body(qkv_ref, scalep_ref, biasp_ref, mask_ref, hm_ref,
                 blockC_ref, segsum_ref, segC_ref, out_ref,
                 num_heads, hg, compute):
    mask = mask_ref[:] if mask_ref is not None else None
    _pk_fwd_groups(qkv_ref[:], scalep_ref, biasp_ref, mask, hm_ref,
                   blockC_ref, segsum_ref, segC_ref, out_ref,
                   num_heads, hg, compute)


def _fold_heads(x_full, hm, num_heads, N):
    """(W, hN, C) masked-by-head → (W, N, C): mask cross-head channels then
    sum the per-head row blocks."""
    xm = x_full * hm[None]
    acc = xm[:, 0:N, :]
    for h in range(1, num_heads):
        acc = acc + xm[:, h * N:(h + 1) * N, :]
    return acc


def _pk_bwd_one_group(q, k, v, scalep, biasp, mask, hm, hm_c,
                      blockC, segsum, segexp, gc, hg, compute):
    """Backward math for ONE head group on channel-sliced VALUES: q/k/v/gc
    (W, N, Cg) → (dq, dk, dv f32 (W, N, Cg), dbias_p (N, gN),
    dscale_p (1, gN)). Shared between the unrolled group loop, the
    grid-axis grouped kernel and the entry-fused body."""
    (qn32, rq, aq, kn32, rk, ak, qn, _, krep, vrep, s_cos, e, denom) = \
        _pk_recompute(q, k, v, scalep, biasp, mask, hm_c,
                      blockC, segsum, hg, compute)
    N = q.shape[1]
    invexp = _nobatch(1.0 / denom, segexp)            # (W, N, gN)
    p = e * invexp
    gcc = gc.astype(compute)
    dp = lax.dot_general(gcc, vrep, (((2,), (2,)), ((0,), (0,))),
                         preferred_element_type=jnp.float32)
    pc = p.astype(compute)
    dvfull = lax.dot_general(pc, gcc, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    dv = _fold_heads(dvfull, hm, hg, N)
    # softmax VJP, segmented per (row, head)
    rowsum = _nobatch(p * dp, segsum)                 # (W, N, hg)
    rowexp = _nobatch(rowsum, segexp)                 # (W, N, gN)
    ds = p * (dp - rowexp)
    dbias_p = jnp.sum(ds, axis=0)
    dscale_p = jnp.sum(jnp.sum(ds * s_cos, axis=0), axis=0, keepdims=True)
    dsc = (ds * scalep[None]).astype(compute)
    dqn = lax.dot_general(dsc, krep, (((2,), (1,)), ((0,), (0,))),
                          preferred_element_type=jnp.float32)
    dknfull = lax.dot_general(dsc, qn, (((1,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    dkn = _fold_heads(dknfull, hm, hg, N)
    # l2-norm VJP, per-head segments expanded via blockC
    rd_q = _nobatch(dqn * qn32, blockC)
    rd_k = _nobatch(dkn * kn32, blockC)
    dq = rq * (dqn - jnp.where(aq, qn32 * rd_q, 0.0))
    dk = rk * (dkn - jnp.where(ak, kn32 * rd_k, 0.0))
    return dq, dk, dv, dbias_p, dscale_p


def _pk_bwd_groups(qkv, scalep_ref, biasp_ref, mask, hm_ref,
                   blockC_ref, segsum_ref, segexp_ref, g,
                   dscalep_ref, dbiasp_ref, store, num_heads, hg, compute):
    """Group loop of the packed backward on qkv/g VALUES. store(gi, o, Cg,
    dq, dk, dv) receives the f32 per-group input grads — the qkv-input body
    writes them to dqkv_ref slices, the entry-fused body assembles them
    into the dx/dW/dbias chain. Shared between both kernels."""
    W, N, C3 = qkv.shape
    C = C3 // 3
    ng = num_heads // hg
    Cg = C // ng
    hm = hm_ref[:]
    hm_c = hm.astype(compute)
    for gi in range(ng):
        o = gi * Cg
        dq, dk, dv, dbias_p, dscale_p = _pk_bwd_one_group(
            qkv[:, :, o:o + Cg], qkv[:, :, C + o:C + o + Cg],
            qkv[:, :, 2 * C + o:2 * C + o + Cg],
            scalep_ref[gi], biasp_ref[gi], mask, hm, hm_c,
            blockC_ref[:], segsum_ref[:], segexp_ref[:],
            g[:, :, o:o + Cg], hg, compute)
        dbiasp_ref[gi] += dbias_p
        dscalep_ref[gi] += dscale_p
        store(gi, o, Cg, dq, dk, dv)


def _pk_bwd_body(qkv_ref, scalep_ref, biasp_ref, mask_ref, hm_ref,
                 blockC_ref, segsum_ref, segexp_ref, g_ref,
                 dqkv_ref, dscalep_ref, dbiasp_ref, num_heads, hg, compute):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dscalep_ref[:] = jnp.zeros_like(dscalep_ref)
        dbiasp_ref[:] = jnp.zeros_like(dbiasp_ref)

    qkv = qkv_ref[:]
    C = qkv.shape[2] // 3
    mask = mask_ref[:] if mask_ref is not None else None
    dt = dqkv_ref.dtype

    def store(gi, o, Cg, dq, dk, dv):
        dqkv_ref[:, :, o:o + Cg] = dq.astype(dt)
        dqkv_ref[:, :, C + o:C + o + Cg] = dk.astype(dt)
        dqkv_ref[:, :, 2 * C + o:2 * C + o + Cg] = dv.astype(dt)

    _pk_bwd_groups(qkv, scalep_ref, biasp_ref, mask, hm_ref, blockC_ref,
                   segsum_ref, segexp_ref, g_ref[:], dscalep_ref, dbiasp_ref,
                   store, num_heads, hg, compute)


def _pk_pack_params(scale, bias16, mask, num_heads, N, hg):
    """(heads,), (heads,N,N), (nW,N,N) → per-GROUP packed params
    (ng, 1, gN), (ng, N, gN), (nW, N, gN) where ng = heads/hg, gN = hg·N.
    Group lanes l = hl·N + j map to head gi·hg + hl; the mask tile is
    group-independent. ng = 1 is the full pack."""
    ng = num_heads // hg
    gN = hg * N
    scalep = jnp.repeat(scale, N).reshape(ng, 1, gN)
    biasp = bias16.reshape(ng, hg, N, N).transpose(0, 2, 1, 3).reshape(
        ng, N, gN)
    maskp = None if mask is None else jnp.tile(mask, (1, 1, hg))
    return scalep, biasp, maskp


# ---------------------------------------------------------------------------
# Stored-stats backward for the PACKED kernel — the same trade as the
# per-head stats kernel (see _fwd_body_stats): N here is 9-36 tokens, so
# storing the packed softmax probabilities (ng, B_, N, gN) f32 costs only a
# ~0.1 ms HBM round trip per stage-2 call while the recompute it replaces is
# the score dot, the bias/mask adds, the max/exp/denominator chain and the
# invexp expansion. The l2 norms and head-repeated k/v stay recomputed (the
# backward's own dots need qn/krep/vrep regardless, and the norms are pure
# VPU). s_cos is NOT stored: dscale_h = sum(ds . s_cos over head-h lanes)
# equals sum(dqn . qn over head-h channels)/scale_h exactly (dqn = dsc.krep
# with krep head-masked, dsc = ds*scale_h — the per-head identity of
# _bwd_body_stats restricted to each lane group), and the dqn.qn products
# are already formed for the norm VJP. bias16 and the shift mask are not
# needed at all in this backward (dbias = sum(ds); the mask only shifted s).
# ---------------------------------------------------------------------------


def _pk_fwd_body_stats(qkv_ref, scalep_ref, biasp_ref, mask_ref, hm_ref,
                       blockC_ref, segsum_ref, segexp_ref, out_ref, p_ref,
                       num_heads, hg, compute):
    """_pk_fwd_body plus the packed softmax store: p_ref is
    (ng, wb, N, gN) f32, group-indexed so each store is contiguous. out is
    p·vrep directly (the stat-free body computes e·vrep then divides by the
    segC-expanded denominator; here p is materialised anyway)."""
    qkv = qkv_ref[:]
    W, N, C3 = qkv.shape
    C = C3 // 3
    ng = num_heads // hg
    Cg = C // ng
    mask = mask_ref[:] if mask_ref is not None else None
    hm_c = hm_ref[:].astype(compute)
    for gi in range(ng):
        o = gi * Cg
        (_, _, _, _, _, _, _, _, _, vrep, _, e, denom) = _pk_recompute(
            qkv[:, :, o:o + Cg], qkv[:, :, C + o:C + o + Cg],
            qkv[:, :, 2 * C + o:2 * C + o + Cg],
            scalep_ref[gi], biasp_ref[gi], mask, hm_c,
            blockC_ref[:], segsum_ref[:], hg, compute)
        invexp = _nobatch(1.0 / denom, segexp_ref[:])     # (W, N, gN)
        p = e * invexp
        p_ref[gi] = p
        out = lax.dot_general(p.astype(compute), vrep,
                              (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
        out_ref[:, :, o:o + Cg] = out.astype(out_ref.dtype)


def _pk_bwd_one_group_stats(q, k, v, scalep, hm, hm_c, blockC, segsum,
                            segexp, segC, p, gc, hg, compute):
    """Exact VJP for ONE head group from the stored packed softmax — no
    score recompute. Same contract as _pk_bwd_one_group minus the
    biasp/mask operands (not needed — see the section comment)."""
    N = q.shape[1]
    q = q.astype(jnp.float32)
    k = k.astype(jnp.float32)
    ssq_q = _nobatch(q * q, blockC)
    ssq_k = _nobatch(k * k, blockC)
    rq = lax.rsqrt(jnp.maximum(ssq_q, EPS * EPS))
    rk = lax.rsqrt(jnp.maximum(ssq_k, EPS * EPS))
    aq = ssq_q > EPS * EPS
    ak = ssq_k > EPS * EPS
    qn32 = q * rq
    kn32 = k * rk
    qn = qn32.astype(compute)
    kn = kn32.astype(compute)
    krep = jnp.concatenate([kn] * hg, axis=1) * hm_c
    vrep = jnp.concatenate([v] * hg, axis=1) * hm_c
    gcc = gc.astype(compute)
    dp = lax.dot_general(gcc, vrep, (((2,), (2,)), ((0,), (0,))),
                         preferred_element_type=jnp.float32)
    pc = p.astype(compute)
    dvfull = lax.dot_general(pc, gcc, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    dv = _fold_heads(dvfull, hm, hg, N)
    rowsum = _nobatch(p * dp, segsum)                 # (W, N, hg)
    rowexp = _nobatch(rowsum, segexp)                 # (W, N, gN)
    ds = p * (dp - rowexp)
    dbias_p = jnp.sum(ds, axis=0)
    dsc = (ds * scalep[None]).astype(compute)
    dqn = lax.dot_general(dsc, krep, (((2,), (1,)), ((0,), (0,))),
                          preferred_element_type=jnp.float32)
    dknfull = lax.dot_general(dsc, qn, (((1,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    dkn = _fold_heads(dknfull, hm, hg, N)
    rs_q = dqn * qn32
    rd_q = _nobatch(rs_q, blockC)
    rd_k = _nobatch(dkn * kn32, blockC)
    # dscale from the norm-VJP products (identity in the section comment):
    # per-head channel-segment row sums → one scalar per head, broadcast
    # back to the head's N lanes / scale / N so the caller's lane-sum
    # unpack (sum over each head's N lanes) recovers dscale_h exactly.
    per_head = lax.dot_general(rs_q, segC, (((2,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    head_sums = jnp.sum(per_head, axis=(0, 1)).reshape(1, hg)
    dscale_p = _nobatch(head_sums, segexp) / (scalep * N)
    dq = rq * (dqn - jnp.where(aq, qn32 * rd_q, 0.0))
    dk = rk * (dkn - jnp.where(ak, kn32 * rd_k, 0.0))
    return dq, dk, dv, dbias_p, dscale_p


def _pk_bwd_body_stats(qkv_ref, scalep_ref, hm_ref, blockC_ref, segsum_ref,
                       segexp_ref, segC_ref, p_ref, g_ref,
                       dqkv_ref, dscalep_ref, dbiasp_ref,
                       num_heads, hg, compute):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dscalep_ref[:] = jnp.zeros_like(dscalep_ref)
        dbiasp_ref[:] = jnp.zeros_like(dbiasp_ref)

    qkv = qkv_ref[:]
    C = qkv.shape[2] // 3
    ng = num_heads // hg
    Cg = C // ng
    hm = hm_ref[:]
    hm_c = hm.astype(compute)
    dt = dqkv_ref.dtype
    g = g_ref[:]
    for gi in range(ng):
        o = gi * Cg
        dq, dk, dv, dbias_p, dscale_p = _pk_bwd_one_group_stats(
            qkv[:, :, o:o + Cg], qkv[:, :, C + o:C + o + Cg],
            qkv[:, :, 2 * C + o:2 * C + o + Cg],
            scalep_ref[gi], hm, hm_c, blockC_ref[:], segsum_ref[:],
            segexp_ref[:], segC_ref[:], p_ref[gi], g[:, :, o:o + Cg],
            hg, compute)
        dbiasp_ref[gi] += dbias_p
        dscalep_ref[gi] += dscale_p
        dqkv_ref[:, :, o:o + Cg] = dq.astype(dt)
        dqkv_ref[:, :, C + o:C + o + Cg] = dk.astype(dt)
        dqkv_ref[:, :, 2 * C + o:2 * C + o + Cg] = dv.astype(dt)


def _pk_stat_spec(ng, wb, N, gN):
    return pl.BlockSpec((ng, wb, N, gN), lambda i: (0, i, 0, 0),
                        memory_space=pltpu.VMEM)


def _pk_fwd_stats(qkv, scale, bias16, num_heads, n_win_per_img, mask,
                  block_rows, out_dtype, head_group=0, interpret=None):
    """Packed forward emitting (out, p_stats); p_stats is f32
    (ng, B_, N, gN). Only used under differentiation — the primal path
    keeps the stat-free kernel. GSPMD routing as _pk_fwd (p_stats shards
    on its window dim 1)."""
    if (interpret is None and not _vma_union(
            qkv, scale, bias16, *([mask] if mask is not None else []))):
        maskd = (mask if mask is not None
                 else jnp.zeros((1, 1, 1), jnp.float32))
        hg = head_group or num_heads
        consts = _pk_consts_arrays(hg, qkv.shape[1],
                                   qkv.shape[2] // 3 * hg // num_heads)
        return _pk_fwd_stats_cp(qkv, scale, bias16, maskd, *consts,
                                num_heads, n_win_per_img, block_rows,
                                jnp.dtype(out_dtype or jnp.float32),
                                head_group, mask is not None)
    return _pk_fwd_stats_pallas(qkv, scale, bias16, num_heads,
                                n_win_per_img, mask, block_rows, out_dtype,
                                head_group, interpret)


def _pk_fwd_stats_cp_impl(qkv, scale, bias16, maskd, hm, blockC, segsum,
                          segexp, segC, num_heads, n_win_per_img,
                          block_rows, out_dtype, head_group, has_mask):
    return _pk_fwd_stats_pallas(qkv, scale, bias16, num_heads,
                                n_win_per_img,
                                maskd if has_mask else None, block_rows,
                                out_dtype, head_group,
                                consts=(hm, blockC, segsum, segexp, segC))


_pk_fwd_stats_cp = _make_cp(
    _pk_fwd_stats_cp_impl,
    in_dims=(0, None, None, None, None, None, None, None, None),
    out_dims=(0, 1),
    rule="b n c, h, i j k, u v w, a1 a2, a3 a4, a5 a6, a7 a8, a9 a0"
         " -> b n d, e b n2 n3",
    n_static=6)


def _pk_fwd_stats_pallas(qkv, scale, bias16, num_heads, n_win_per_img,
                         mask, block_rows, out_dtype, head_group=0,
                         interpret=None, consts=None):
    B_, N, C3 = qkv.shape
    C = C3 // 3
    hg = head_group or num_heads
    ng = num_heads // hg
    gN = hg * N
    Cg = C // ng
    compute = qkv.dtype
    out_dtype = out_dtype or jnp.float32
    if interpret is None:
        interpret = _interpret()
    has_mask = mask is not None
    scalep, biasp, maskp = _pk_pack_params(scale, bias16, mask, num_heads,
                                           N, hg)
    hm, blockC, segsum, segexp, _ = (
        consts if consts is not None
        else tuple(jnp.asarray(a) for a in _pk_constants(hg, N, Cg)))
    wb = _pk_pick_block(B_, N, n_win_per_img, C, num_heads,
                        target_rows=block_rows, hg=hg)
    grid = (B_ // wb,)
    args = [qkv, scalep, biasp] + ([maskp] if has_mask else []) + \
        [hm, blockC, segsum, segexp]
    args = _align_vma(*args)
    vma = _vma_union(*args)
    if has_mask:
        def kernel(q, sc, b, m, *rest):
            _pk_fwd_body_stats(q, sc, b, m, *rest, num_heads, hg, compute)
    else:
        def kernel(q, sc, b, *rest):
            _pk_fwd_body_stats(q, sc, b, None, *rest, num_heads, hg,
                               compute)
    in_specs = _pk_specs(wb, N, C3, num_heads, hg, has_mask, n_win_per_img)
    in_specs.append(pl.BlockSpec((hg, gN), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM))     # segexp
    out, p_st = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((wb, N, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            _pk_stat_spec(ng, wb, N, gN),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B_, N, C), out_dtype, vma=vma),
            jax.ShapeDtypeStruct((ng, B_, N, gN), jnp.float32, vma=vma),
        ],
        compiler_params=_ATTN_COMPILER_PARAMS,
        interpret=interpret,
    )(*args)
    return out, p_st


def _pk_bwd_stats(qkv, scale, p_st, g, num_heads, n_win_per_img,
                  block_rows, head_group=0, interpret=None):
    if (interpret is None
            and not _vma_union(qkv, scale, p_st, g)):
        hg = head_group or num_heads
        consts = _pk_consts_arrays(
            hg, qkv.shape[1], qkv.shape[2] // 3 * hg // num_heads)
        return _pk_bwd_stats_cp(qkv, scale, p_st, g, *consts, num_heads,
                                n_win_per_img, block_rows, head_group)
    return _pk_bwd_stats_pallas(qkv, scale, p_st, g, num_heads,
                                n_win_per_img, block_rows, head_group,
                                interpret)


def _pk_bwd_stats_pallas(qkv, scale, p_st, g, num_heads, n_win_per_img,
                         block_rows, head_group=0, interpret=None,
                         consts=None):
    B_, N, C3 = qkv.shape
    C = C3 // 3
    hg = head_group or num_heads
    ng = num_heads // hg
    gN = hg * N
    Cg = C // ng
    compute = qkv.dtype
    if interpret is None:
        interpret = _interpret()
    scalep = jnp.repeat(scale, N).reshape(ng, 1, gN)
    hm, blockC, segsum, segexp, segC = (
        consts if consts is not None
        else tuple(jnp.asarray(a) for a in _pk_constants(hg, N, Cg)))
    wb = _pk_pick_block(B_, N, n_win_per_img, C, num_heads,
                        target_rows=block_rows, hg=hg)
    grid = (B_ // wb,)
    args = _align_vma(qkv, scalep, hm, blockC, segsum, segexp, segC,
                      p_st, g)
    vma = _vma_union(*args)

    def kernel(*refs):
        _pk_bwd_body_stats(*refs, num_heads, hg, compute)

    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((wb, N, C3), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        const((ng, 1, gN)),      # scalep
        const((gN, Cg)),         # hm
        const((Cg, Cg)),         # blockC
        const((gN, hg)),         # segsum
        const((hg, gN)),         # segexp
        const((hg, Cg)),         # segC
        _pk_stat_spec(ng, wb, N, gN),
        pl.BlockSpec((wb, N, C), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((wb, N, C3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ng, 1, gN), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ng, N, gN), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B_, N, C3), compute, vma=vma),
            jax.ShapeDtypeStruct((ng, 1, gN), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((ng, N, gN), jnp.float32, vma=vma),
        ],
        compiler_params=_ATTN_COMPILER_PARAMS,
        interpret=interpret,
    )(*args)


def _pk_bwd_stats_cp_impl(qkv, scale, p_st, g, hm, blockC, segsum,
                          segexp, segC, num_heads, n_win_per_img,
                          block_rows, head_group):
    return _pk_bwd_stats_pallas(qkv, scale, p_st, g, num_heads,
                                n_win_per_img, block_rows, head_group,
                                consts=(hm, blockC, segsum, segexp, segC))


_pk_bwd_stats_cp = _make_cp(
    _pk_bwd_stats_cp_impl,
    in_dims=(0, None, 1, 0, None, None, None, None, None),
    out_dims=(0, "sum", "sum"),
    rule="b n c, h, e b n2 n3, b n d, a1 a2, a3 a4, a5 a6, a7 a8, a9 a0"
         " -> b n c, p q r, s t x",
    n_static=4)


# Grid-axis head grouping (the packed kernel's head GROUP as a grid
# dimension): built, parity-clean, measured NEGATIVE at every N=49 shape
# (ROUND4_NOTES.md — sw3 g4 1.52 vs per-head 0.77 ms f+b). The machinery
# lives in fused_window_attn_variants; it engages only when a caller
# explicitly requests an aligned head_group < num_heads (never on a
# shipping dispatch — pick_head_group returns full-pack or per-head only).


def _pkg_use(ng, Cg):
    return ng > 1 and Cg % 128 == 0


def _pkg_fwd(*args):
    from fr_tpu.ops.fused_window_attn_variants import _pkg_fwd as impl
    return impl(*args)


def _pkg_bwd(*args):
    from fr_tpu.ops.fused_window_attn_variants import _pkg_bwd as impl
    return impl(*args)

def _pk_specs(wb, N, C3, num_heads, hg, has_mask, nW):
    C = C3 // 3
    ng = num_heads // hg
    gN = hg * N
    Cg = C // ng
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    specs = [
        pl.BlockSpec((wb, N, C3), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        const((ng, 1, gN)),      # scalep
        const((ng, N, gN)),      # biasp
    ]
    if has_mask:
        specs.append(const((nW, N, gN)))
    specs += [const((gN, Cg)), const((Cg, Cg)), const((gN, hg))]
    return specs


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 6, 7, 8, 9, 10))
def fused_window_attention_packed(qkv: jnp.ndarray, scale: jnp.ndarray,
                                  bias16: jnp.ndarray, num_heads: int,
                                  n_win_per_img: int,
                                  mask: Optional[jnp.ndarray] = None,
                                  block_rows: int = 1024,
                                  interpret: bool = False,
                                  out_dtype=None,
                                  head_group: int = 0,
                                  stored_stats: bool = True) -> jnp.ndarray:
    """Same contract as fused_window_attention (qkv (B_, N, 3C)
    compute-dtype → (B_, N, C)); packed-lane layout inside.
    interpret=True runs the packed Pallas program in the interpreter —
    off-TPU tests exercise the real packing/segment/unpack math instead of
    the jnp twin (tests/test_fused_window_attn.py).
    out_dtype (default f32) lets the caller take the pre-proj activations
    in bf16 — the proj GEMM consumes bf16 anyway, so this halves the
    kernel-output HBM traffic AND the incoming cotangent traffic in the
    backward (VERDICT r3 next #2); softmax and accumulation stay f32.
    head_group (default 0 = num_heads, the full pack) packs hg heads per
    lane group and loops num_heads/hg groups over CHANNEL-SLICED q/k/v —
    the N=49 Swin shapes lose under the full pack because the
    head-repeated k/v buffers (hN·C·8 B/window ≈ 3.2 MB at h=16, C=512)
    force single-window grid blocks; hg=4 with hd=32 keeps the slices
    128-lane aligned, pads 196→256 (1.31× vs per-head 2.6×) and shrinks
    the per-group repeat to gN·Cg·8 ≈ 200 KB/window.
    stored_stats=True (default) makes the DIFFERENTIATED forward store the
    packed softmax probabilities so the backward skips the whole score
    recompute (see the _pk_fwd_body_stats section comment); the primal
    (no-grad) path always runs the stat-free kernel. The default serves
    DIRECT value_and_grad callers (probe-proven faster at every shipping
    shape); the MODEL passes stored_stats=False because under its
    nn.remat(prevent_cse=False) wrapper the stats forward breaks the
    primal/replay CSE and nets zero-to-negative end-to-end — measured
    three ways in swin_common.attention_stats_inmodel's docstring.
    FR_ATTN_STORED_STATS=0/1 forces the arm everywhere (A/B switch)."""
    return _pk_fwd(qkv, scale, bias16, num_heads, n_win_per_img, mask,
                   block_rows, interpret, out_dtype, head_group)


def _pk_fwd(qkv, scale, bias16, num_heads, n_win_per_img, mask, block_rows,
            interpret=False, out_dtype=None, head_group=0):
    """Packed-kernel primal dispatch — same GSPMD routing as _fwd: jnp
    twin off-TPU, direct pallas under shard_map (vma) or when the caller
    forces interpret, custom_partitioning otherwise (VERDICT r4 #4)."""
    out_dtype = out_dtype or jnp.float32
    if _interpret() and not interpret and not _cp_interpret():
        return _heads_fwd(qkv, scale, bias16, mask, num_heads,
                          qkv.dtype).astype(out_dtype)
    if interpret or _vma_union(qkv, scale, bias16,
                               *([mask] if mask is not None else [])):
        return _pk_fwd_pallas(qkv, scale, bias16, num_heads, n_win_per_img,
                              mask, block_rows, interpret, out_dtype,
                              head_group)
    maskd = mask if mask is not None else jnp.zeros((1, 1, 1), jnp.float32)
    hg = head_group or num_heads
    consts = _pk_consts_arrays(hg, qkv.shape[1],
                               qkv.shape[2] // 3 * hg // num_heads)
    return _pk_fwd_cp(qkv, scale, bias16, maskd, *consts, num_heads,
                      n_win_per_img, block_rows, jnp.dtype(out_dtype),
                      head_group, mask is not None)


def _pk_consts_arrays(hg, N, Cg):
    return tuple(jnp.asarray(a) for a in _pk_constants(hg, N, Cg))


def _pk_fwd_cp_impl(qkv, scale, bias16, maskd, hm, blockC, segsum, segexp,
                    segC, num_heads, n_win_per_img, block_rows, out_dtype,
                    head_group, has_mask):
    return _pk_fwd_pallas(qkv, scale, bias16, num_heads, n_win_per_img,
                          maskd if has_mask else None, block_rows,
                          _interpret(), out_dtype, head_group,
                          consts=(hm, blockC, segsum, segexp, segC))


_pk_fwd_cp = _make_cp(
    _pk_fwd_cp_impl,
    in_dims=(0, None, None, None, None, None, None, None, None),
    out_dims=(0,),
    rule="b n c, h, i j k, u v w, a1 a2, a3 a4, a5 a6, a7 a8, a9 a0"
         " -> b n d",
    n_static=6)


def _pk_fwd_pallas(qkv, scale, bias16, num_heads, n_win_per_img, mask,
                   block_rows, interpret=False, out_dtype=None,
                   head_group=0, consts=None):
    B_, N, C3 = qkv.shape
    C = C3 // 3
    hg = head_group or num_heads
    assert num_heads % hg == 0 and C % num_heads == 0
    compute = qkv.dtype
    out_dtype = out_dtype or jnp.float32
    has_mask = mask is not None
    Cg = C * hg // num_heads
    scalep, biasp, maskp = _pk_pack_params(scale, bias16, mask, num_heads,
                                           N, hg)
    if _pkg_use(num_heads // hg, Cg):
        return _pkg_fwd(qkv, scalep, biasp, maskp, num_heads, n_win_per_img,
                        block_rows, interpret, out_dtype, hg)
    # segment constants arrive as operands under custom_partitioning (its
    # per-shard lowering must be const-free) and are built here otherwise
    hm, blockC, segsum, _, segC = (
        consts if consts is not None
        else tuple(jnp.asarray(a) for a in _pk_constants(hg, N, Cg)))
    wb = _pk_pick_block(B_, N, n_win_per_img, C, num_heads,
                        target_rows=block_rows, hg=hg)
    grid = (B_ // wb,)
    args = [qkv, scalep, biasp] + ([maskp] if has_mask else []) + \
        [hm, blockC, segsum, segC]
    args = _align_vma(*args)
    vma = _vma_union(*args)
    if has_mask:
        def kernel(q, sc, b, m, *rest):
            _pk_fwd_body(q, sc, b, m, *rest, num_heads, hg, compute)
    else:
        def kernel(q, sc, b, *rest):
            _pk_fwd_body(q, sc, b, None, *rest, num_heads, hg, compute)
    in_specs = _pk_specs(wb, N, C3, num_heads, hg, has_mask,
                         n_win_per_img)
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


def _pk_fwd_rule(qkv, scale, bias16, num_heads, n_win_per_img, mask,
                 block_rows, interpret, out_dtype, head_group, stored_stats):
    env = os.environ.get("FR_ATTN_STORED_STATS")
    if env in ("0", "1"):
        stored_stats = env == "1"     # the ONE stats A/B switch
    hg = head_group or num_heads
    ng = num_heads // hg
    Cg = qkv.shape[2] // 3 // ng
    use_stats = (stored_stats and (interpret or not _interpret())
                 and not _pkg_use(ng, Cg))
    if use_stats:
        out, p_st = _pk_fwd_stats(qkv, scale, bias16, num_heads,
                                  n_win_per_img, mask, block_rows,
                                  out_dtype, head_group,
                                  interpret=interpret or None)
        return out, (qkv, scale, bias16, mask, p_st)
    out = _pk_fwd(qkv, scale, bias16, num_heads, n_win_per_img, mask,
                  block_rows, interpret, out_dtype, head_group)
    return out, (qkv, scale, bias16, mask, None)


def _pk_bwd_rule(num_heads, n_win_per_img, block_rows, interpret, out_dtype,
                 head_group, stored_stats, residuals, g):
    qkv, scale, bias16, mask = residuals[:4]
    p_st = residuals[4]
    if p_st is not None:
        dqkv, dscalep, dbiasp = _pk_bwd_stats(
            qkv, scale, p_st, g, num_heads, n_win_per_img, block_rows,
            head_group, interpret=interpret or None)
        hg = head_group or num_heads
        ng = num_heads // hg
        N = qkv.shape[1]
        dscale = jnp.sum(dscalep.reshape(num_heads, N), axis=1)
        dbias = dbiasp.reshape(ng, N, hg, N).transpose(0, 2, 1, 3).reshape(
            num_heads, N, N)
        dscale = _match_cotangent_vma(dscale, scale)
        dbias = _match_cotangent_vma(dbias, bias16)
        dmask = jnp.zeros_like(mask) if mask is not None else None
        return (dqkv, dscale, dbias, dmask)
    B_, N, C3 = qkv.shape
    C = C3 // 3
    hg = head_group or num_heads
    ng = num_heads // hg
    gN = hg * N
    compute = qkv.dtype
    has_mask = mask is not None

    if _interpret() and not interpret and not _cp_interpret():
        dqkv, dscale, dbias = _bwd_jnp(qkv, scale, bias16, mask,
                                       g.astype(jnp.float32), num_heads)
        dscale = _match_cotangent_vma(dscale, scale)
        dbias = _match_cotangent_vma(dbias, bias16)
        return (dqkv, dscale, dbias,
                jnp.zeros_like(mask) if has_mask else None)

    if interpret or _vma_union(qkv, scale, bias16, g,
                               *([mask] if has_mask else [])):
        dqkv, dscalep, dbiasp = _pk_bwd_pallas(
            qkv, scale, bias16, mask, g, num_heads, n_win_per_img,
            block_rows, interpret, head_group)
    else:
        maskd = (mask if has_mask
                 else jnp.zeros((1, 1, 1), jnp.float32))
        consts = _pk_consts_arrays(hg, N, C3 // 3 // ng)
        dqkv, dscalep, dbiasp = _pk_bwd_cp(
            qkv, scale, bias16, maskd, g, *consts, num_heads,
            n_win_per_img, block_rows, head_group, has_mask)
    dscale = jnp.sum(dscalep.reshape(num_heads, N), axis=1)
    dbias = dbiasp.reshape(ng, N, hg, N).transpose(0, 2, 1, 3).reshape(
        num_heads, N, N)
    dscale = _match_cotangent_vma(dscale, scale)
    dbias = _match_cotangent_vma(dbias, bias16)
    dmask = jnp.zeros_like(mask) if has_mask else None
    return (dqkv, dscale, dbias, dmask)


def _pk_bwd_cp_impl(qkv, scale, bias16, maskd, g, hm, blockC, segsum,
                    segexp, segC, num_heads, n_win_per_img, block_rows,
                    head_group, has_mask):
    return _pk_bwd_pallas(qkv, scale, bias16,
                          maskd if has_mask else None, g, num_heads,
                          n_win_per_img, block_rows, _interpret(),
                          head_group,
                          consts=(hm, blockC, segsum, segexp, segC))


_pk_bwd_cp = _make_cp(
    _pk_bwd_cp_impl,
    in_dims=(0, None, None, None, 0, None, None, None, None, None),
    out_dims=(0, "sum", "sum"),
    rule="b n c, h, i j k, u v w, b n d, a1 a2, a3 a4, a5 a6, a7 a8, a9 a0"
         " -> b n c, p q r, s t x",
    n_static=5)


def _pk_bwd_pallas(qkv, scale, bias16, mask, g, num_heads, n_win_per_img,
                   block_rows, interpret, head_group, consts=None):
    """Packed backward pallas core: returns PACKED (dqkv, dscalep,
    dbiasp) — the caller unpacks lane groups to per-head grads."""
    B_, N, C3 = qkv.shape
    C = C3 // 3
    hg = head_group or num_heads
    ng = num_heads // hg
    gN = hg * N
    compute = qkv.dtype
    has_mask = mask is not None
    Cg = C // ng
    scalep, biasp, maskp = _pk_pack_params(scale, bias16, mask, num_heads,
                                           N, hg)
    g = g if g.dtype == compute else g.astype(jnp.float32)
    if _pkg_use(ng, Cg):
        return _pkg_bwd(qkv, scalep, biasp, maskp, g, num_heads,
                        n_win_per_img, block_rows, interpret, hg)
    hm, blockC, segsum, segexp, _ = (
        consts if consts is not None
        else tuple(jnp.asarray(a) for a in _pk_constants(hg, N, Cg)))
    wb = _pk_pick_block(B_, N, n_win_per_img, C, num_heads,
                        target_rows=block_rows, hg=hg)
    grid = (B_ // wb,)
    args = [qkv, scalep, biasp] + ([maskp] if has_mask else []) + \
        [hm, blockC, segsum, segexp, g]
    args = _align_vma(*args)
    vma = _vma_union(*args)
    if has_mask:
        def kernel(q, sc, b, m, *rest):
            _pk_bwd_body(q, sc, b, m, *rest, num_heads, hg, compute)
    else:
        def kernel(q, sc, b, *rest):
            _pk_bwd_body(q, sc, b, None, *rest, num_heads, hg, compute)
    in_specs = _pk_specs(wb, N, C3, num_heads, hg, has_mask, n_win_per_img)
    in_specs.append(pl.BlockSpec((hg, gN), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM))     # segexp
    in_specs.append(pl.BlockSpec((wb, N, C), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM))     # g
    dqkv, dscalep, dbiasp = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((wb, N, C3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ng, 1, gN), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ng, N, gN), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B_, N, C3), compute, vma=vma),
            jax.ShapeDtypeStruct((ng, 1, gN), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((ng, N, gN), jnp.float32, vma=vma),
        ],
        compiler_params=_ATTN_COMPILER_PARAMS,
        interpret=interpret,
    )(*args)
    return dqkv, dscalep, dbiasp


fused_window_attention_packed.defvjp(_pk_fwd_rule, _pk_bwd_rule)



@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 6, 7, 8))
def fused_window_attention(qkv: jnp.ndarray, scale: jnp.ndarray,
                           bias16: jnp.ndarray,
                           num_heads: int,
                           n_win_per_img: int,
                           mask: Optional[jnp.ndarray] = None,
                           block_rows: int = 1024,
                           out_dtype=None,
                           stored_stats: bool = False) -> jnp.ndarray:
    """qkv (B_, N, 3C) compute-dtype; scale (heads,) f32 (already
    exp-clamped); bias16 (heads, N, N) f32 (already 16·sigmoid(CPB));
    mask (nW, N, N) f32 additive or None; block_rows: see _pick_block.
    Returns (B_, N, C). out_dtype (default f32) lets the caller take the
    pre-proj activations in compute dtype — halves the output AND incoming-
    cotangent HBM traffic when the consumer (the proj GEMM) reads bf16
    anyway (VERDICT r3 next #2, same plumbing as the packed kernel).
    stored_stats (default False since round 5): save per-head softmax
    stats in the forward and skip the score/softmax recompute in the
    backward. The round-4 default was True (stats beat the UNROLLED
    recompute for direct value_and_grad callers at every N=49 shape);
    the round-5 BATCHED recompute bodies beat the stats backward at every
    probed shape (sw3 1.28 vs 1.33, sw4 0.60 vs 0.65, s4 0.73 vs 0.89 ms
    f+b — ROUND5_NOTES.md), so recompute is now the default for every
    caller and stats stay as the measured A/B arm
    (FR_ATTN_STORED_STATS=1 forces them on everywhere)."""
    return _fwd(qkv, scale, bias16, num_heads, n_win_per_img, mask,
                block_rows, out_dtype)


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


def _fwd_cp_impl(qkv, scale, bias16, maskd, num_heads, n_win_per_img,
                 block_rows, out_dtype, has_mask):
    return _fwd_pallas(qkv, scale, bias16, maskd if has_mask else None,
                       num_heads, n_win_per_img, block_rows, out_dtype)


_fwd_cp = _make_cp(
    _fwd_cp_impl, in_dims=(0, None, None, None), out_dims=(0,),
    rule="b n c, h, i j k, u v w -> b n d", n_static=5)


def _bwd_cp_impl(qkv, scale, bias16, maskd, g, num_heads, n_win_per_img,
                 block_rows, has_mask):
    return _bwd_pallas(qkv, scale, bias16,
                       maskd if has_mask else None, g, num_heads,
                       n_win_per_img, block_rows)


_bwd_cp = _make_cp(
    _bwd_cp_impl, in_dims=(0, None, None, None, 0),
    out_dims=(0, "sum", "sum"),
    rule="b n c, h, i j k, u v w, b n d -> b n c, p q, r s t", n_static=4)


def _fwd(qkv, scale, bias16, num_heads, n_win_per_img, mask,
         block_rows=1024, out_dtype=None):
    """Primal dispatch: jnp twin off-TPU, direct pallas under shard_map
    (operands carry vma — manual mode, shard-local by construction), and
    the custom_partitioning wrapper everywhere else so GSPMD/pjit keeps
    the kernel on multi-device meshes (VERDICT r4 #4) instead of shedding
    it (pallas_call has no SPMD partitioning rule of its own)."""
    out_dtype = out_dtype or jnp.float32
    if _interpret() and not _cp_interpret():
        return _heads_fwd(qkv, scale, bias16, mask, num_heads,
                          qkv.dtype).astype(out_dtype)
    if _vma_union(qkv, scale, bias16, *([mask] if mask is not None else [])):
        return _fwd_pallas(qkv, scale, bias16, mask, num_heads,
                           n_win_per_img, block_rows, out_dtype)
    maskd = mask if mask is not None else jnp.zeros((1, 1, 1), jnp.float32)
    return _fwd_cp(qkv, scale, bias16, maskd, num_heads, n_win_per_img,
                   block_rows, jnp.dtype(out_dtype), mask is not None)


def _fwd_pallas(qkv, scale, bias16, mask, num_heads, n_win_per_img,
                block_rows, out_dtype):
    B_, N, C3 = qkv.shape
    C = C3 // 3
    compute = qkv.dtype
    has_mask = mask is not None

    batched = _attn_batched()
    wb = (_pick_block_batched(B_, N, n_win_per_img, num_heads, block_rows)
          if batched else
          _pick_block(B_, N, n_win_per_img, target_rows=block_rows))
    grid = (B_ // wb,)

    args = [qkv, jnp.reshape(scale, (1, num_heads)), bias16]
    if has_mask:
        args.append(mask)
    args = _align_vma(*args)
    vma = _vma_union(*args)

    fwd_body = _fwd_body_batched if batched else _fwd_body
    if has_mask:
        def kernel(q, s, b, m, o):
            fwd_body(q, s, b, m, o, num_heads, compute)
    else:
        def kernel(q, s, b, o):
            fwd_body(q, s, b, None, o, num_heads, compute)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=_specs(grid[0], wb, N, C3, num_heads, has_mask,
                        n_win_per_img),
        out_specs=pl.BlockSpec((wb, N, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B_, N, C), out_dtype, vma=vma),
        compiler_params=_ATTN_COMPILER_PARAMS,
        interpret=_interpret(),
    )(*args)
    return out


def _fwd_rule(qkv, scale, bias16, num_heads, n_win_per_img, mask,
              block_rows, out_dtype, stored_stats):
    env = os.environ.get("FR_ATTN_STORED_STATS")
    if env in ("0", "1"):
        stored_stats = env == "1"     # the ONE stats A/B switch
    if stored_stats and not _interpret():
        out, p_st = _fwd_stats(qkv, scale, bias16, num_heads,
                               n_win_per_img, mask, block_rows, out_dtype)
        return out, (qkv, scale, bias16, mask, p_st)
    out = _fwd(qkv, scale, bias16, num_heads, n_win_per_img, mask,
               block_rows, out_dtype)
    return out, (qkv, scale, bias16, mask, None)


def _bwd_rule(num_heads, n_win_per_img, block_rows, out_dtype, stored_stats,
              residuals, g):
    qkv, scale, bias16, mask = residuals[:4]
    p_st = residuals[4]
    if p_st is not None:
        dqkv, dscale, dbias = _bwd_stats(
            qkv, scale, p_st, g, num_heads, n_win_per_img, block_rows)
        dscale = _match_cotangent_vma(dscale.reshape(num_heads), scale)
        dbias = _match_cotangent_vma(dbias, bias16)
        dmask = jnp.zeros_like(mask) if mask is not None else None
        return (dqkv, dscale, dbias, dmask)
    has_mask = mask is not None

    if _interpret() and not _cp_interpret():
        dqkv, dscale, dbias = _bwd_jnp(qkv, scale, bias16, mask,
                                       g.astype(jnp.float32), num_heads)
        dscale = _match_cotangent_vma(dscale, scale)
        dbias = _match_cotangent_vma(dbias, bias16)
        dmask = jnp.zeros_like(mask) if has_mask else None
        return (dqkv, dscale, dbias, dmask)

    if _vma_union(qkv, scale, bias16, g,
                  *([mask] if has_mask else [])):
        dqkv, dscale, dbias = _bwd_pallas(qkv, scale, bias16, mask, g,
                                          num_heads, n_win_per_img,
                                          block_rows)
    else:
        maskd = (mask if has_mask
                 else jnp.zeros((1, 1, 1), jnp.float32))
        dqkv, dscale, dbias = _bwd_cp(qkv, scale, bias16, maskd, g,
                                      num_heads, n_win_per_img, block_rows,
                                      has_mask)
    dscale = _match_cotangent_vma(dscale.reshape(num_heads), scale)
    dbias = _match_cotangent_vma(dbias, bias16)
    # mask is a compile-time constant (SW-MSA pattern); zero cotangent
    dmask = jnp.zeros_like(mask) if has_mask else None
    return (dqkv, dscale, dbias, dmask)


def _bwd_pallas(qkv, scale, bias16, mask, g, num_heads, n_win_per_img,
                block_rows):
    B_, N, C3 = qkv.shape
    compute = qkv.dtype
    has_mask = mask is not None

    batched = _attn_batched()
    wb = (_pick_block_batched(B_, N, n_win_per_img, num_heads, block_rows)
          if batched else
          _pick_block(B_, N, n_win_per_img, target_rows=block_rows))
    grid = (B_ // wb,)

    args = [qkv, jnp.reshape(scale, (1, num_heads)), bias16]
    if has_mask:
        args.append(mask)
    # cotangent stays in its own dtype through HBM (bf16 when out_dtype is
    # bf16 — the kernel only consumes it via compute-dtype casts)
    args.append(g)
    args = _align_vma(*args)
    vma = _vma_union(*args)

    bwd_body = _bwd_body_batched if batched else _bwd_body
    if has_mask:
        def kernel(q, s, b, m, gg, dq, dsc, db):
            bwd_body(q, s, b, m, gg, dq, dsc, db, num_heads, compute)
    else:
        def kernel(q, s, b, gg, dq, dsc, db):
            bwd_body(q, s, b, None, gg, dq, dsc, db, num_heads, compute)
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
        compiler_params=_ATTN_COMPILER_PARAMS,
        interpret=_interpret(),
    )(*args)
    return dqkv, dscale, dbias


fused_window_attention.defvjp(_fwd_rule, _bwd_rule)

"""Shared SwinV2 window-attention machinery.

TPU-first re-design of the reference's SwinV2 components (reference
nets/AlterNet_SwinV2_FAN.py:156-450 and nets/SwinV2.py:35-300):

- window partition/reverse are pure reshapes/transposes with static window
  counts (XLA lays them out without gathers);
- the SW-MSA attention mask and the continuous-position-bias coordinate
  table are compile-time numpy constants;
- cosine attention (L2-normalised q·k) with per-head learnable clamped
  logit_scale and the 2→512→heads CPB MLP, 16·sigmoid bias
  (reference nets/AlterNet_SwinV2_FAN.py:277-286,212-232);
- everything operates on NHWC, attention matmuls in the compute dtype
  (bf16 on the MXU) with f32 softmax.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from fr_tpu.models.common import l2_normalize, matmul_precision, xavier_normal


# (window, dim) pairs routed to the spatial kernel (windowing inside the
# kernel). Measured on v5e (ROUND2_NOTES.md): EMPTY is fastest. ws=6/C=128
# compiles but is slower end-to-end than XLA's partition transpose + the
# windows-API kernel (50.1 vs 42.2 ms/step AlterNet50 b=128 — the
# in-kernel (ws, nWx) shuffles serialise against the MXU where XLA's HBM
# transpose overlaps); ws=3 / ws=7 hit "infer-vector-layout: unsupported
# shape cast" on the (N → ws, ws) un-windowing and ws=6/C=256 crashes the
# Mosaic compiler. Kept behind this gate as a documented negative result.
SPATIAL_KERNEL_CONFIGS = frozenset()


def use_spatial_attention(window: int, dim: int, fused: bool) -> bool:
    """Blocks call this to decide rank-4 (in-kernel windowing) vs
    partition-outside; keeping the decision here keeps the measured
    allowlist in one place."""
    return fused and (window, dim) in SPATIAL_KERNEL_CONFIGS


# Largest packed lane width at which the packed window-attention kernel
# measures faster than the per-head kernel: the AlterNet shapes (heads·N =
# 144/288, 1.5–3.8× wins). At the N=49 shapes it does NOT win — see
# pick_head_group.
PACKED_LANE_CAP = 288


def pick_head_group(num_heads: int, n_tokens: int) -> int:
    """Head-group size for fused_window_attention_packed, or 0 for the
    per-head kernel. Full pack wins at every AlterNet shape (heads·N ≤
    288). At the Swin/EffiAlter N=49 shapes every packed variant loses —
    re-measured under the FIXED probe (value_and_grad, all leaves
    consumed) with stored-stats backwards on both arms (ROUND4_NOTES.md):
    full pack at sw3 (392 lanes) 1.51 vs per-head 1.39 ms f+b, at sw4
    0.825 vs 0.652 (masked 0.830 vs 0.786); earlier backward-only
    measurements had already shown the hg<heads group splits losing
    outright (the unrolled group loop stacks each group's score tensors
    in Mosaic's scoped VMEM: sw3 g2/g4 = 2.86/1.53 ms) and the grid-axis
    variant losing too. So: pack when heads·N ≤ 288, per-head otherwise;
    the head-grouped machinery stays as a tested, documented negative.

    Round 5 re-closed the cutoff from the other side: the BATCHED
    per-head bodies (the new per-head default, ROUND5_NOTES) still lose
    to the full pack at every AlterNet shape — s2 f+b 1.95 vs packed
    1.21, s2+mask 1.98 vs 1.20, s3 0.90 vs 0.54, s3+mask 0.92 vs
    0.60 ms — while beating everything at the N=49 shapes. Both sides of
    the rule now rest on current-generation measurements."""
    if num_heads * n_tokens <= PACKED_LANE_CAP:
        return num_heads
    return 0


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) → (B·nW, ws·ws, C) (reference AlterNet_SwinV2_FAN.py:156-168)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, C)


def window_reverse(windows: jnp.ndarray, ws: int, H: int, W: int) -> jnp.ndarray:
    """(B·nW, ws·ws, C) → (B, H, W, C) (reference AlterNet_SwinV2_FAN.py:171-184)."""
    C = windows.shape[-1]
    B = windows.shape[0] // ((H // ws) * (W // ws))
    x = windows.reshape(B, H // ws, W // ws, ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


def relative_coords_table(window: Tuple[int, int],
                          pretrained: Tuple[int, int] = (0, 0)) -> np.ndarray:
    """Log-spaced continuous relative coordinates, (1, 2Wh-1, 2Ww-1, 2)
    (reference AlterNet_SwinV2_FAN.py:216-232)."""
    wh, ww = window
    h = np.arange(-(wh - 1), wh, dtype=np.float32)
    w = np.arange(-(ww - 1), ww, dtype=np.float32)
    table = np.stack(np.meshgrid(h, w, indexing="ij"), axis=-1)[None]
    div_h = (pretrained[0] - 1) if pretrained[0] > 0 else (wh - 1)
    div_w = (pretrained[1] - 1) if pretrained[1] > 0 else (ww - 1)
    table[..., 0] /= max(div_h, 1)
    table[..., 1] /= max(div_w, 1)
    table *= 8.0
    table = np.sign(table) * np.log2(np.abs(table) + 1.0) / np.log2(8.0)
    return table.astype(np.float32)


def relative_position_index(window: Tuple[int, int]) -> np.ndarray:
    """(Wh·Ww, Wh·Ww) index into the flattened CPB table
    (reference AlterNet_SwinV2_FAN.py:236-248)."""
    wh, ww = window
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww),
                                  indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1).astype(np.int32)


def shifted_window_mask(H: int, W: int, ws: int, shift: int) -> np.ndarray:
    """(nW, N, N) additive mask (0 / -100) for SW-MSA, compile-time constant
    (reference AlterNet_SwinV2_FAN.py:375-397)."""
    img = np.zeros((H, W), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wsl] = cnt
            cnt += 1
    win = img.reshape(H // ws, ws, W // ws, ws).transpose(0, 2, 1, 3)
    win = win.reshape(-1, ws * ws)
    mask = win[:, None, :] - win[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    """SwinV2 cosine window attention (reference AlterNet_SwinV2_FAN.py:187-302)."""
    dim: int
    window: Tuple[int, int]
    num_heads: int
    qkv_bias: bool = True
    pretrained_window: Tuple[int, int] = (0, 0)
    dtype: Any = jnp.float32
    # fused Pallas path for everything between the two dense GEMMs
    # (normalise → cosine scores → scale/bias/mask → softmax → ·v); the
    # jnp path below is the numerical oracle and the GSPMD fallback
    fused: bool = True
    # kernel block budget in window tokens (scoped-VMEM pressure knob;
    # see ops/fused_window_attn._pick_block)
    block_rows: int = 1024
    # packed-lane kernel (all heads' scores share the lane dim — measured
    # faster than the per-head variant on every AlterNet50 stage shape,
    # ROUND4_NOTES.md); False = the per-head round-2 kernel
    packed: bool = True
    # entry-fused packed kernel (qkv projection GEMM INSIDE the attention
    # kernel). Measured NEGATIVE end-to-end in all three variants —
    # AlterNet50 b=128: all-in-kernel backward 37.11 ms, fwd-only hybrid
    # 37.66, hybrid with 2-D in-kernel GEMM 37.25, vs 34.64 with the qkv
    # GEMM outside: XLA's separate GEMM + relayout copies pipeline better
    # than the kernel can (ROUND4_NOTES.md). Kept as a tested option
    # (tests/test_fused_window_attn.py entry-fused cases; real-lowering
    # parity in scripts/tpu_smoke.py stanza 1b'').
    entry_fused: bool = False

    @nn.compact
    def __call__(self, x, mask: Optional[np.ndarray] = None):
        """x: (B_, windows·tokens layout) — (B_, N, C) pre-partitioned
        windows, or (B, H, W, C) spatial when fused (the spatial kernel
        absorbs window partition/reverse; the projections are
        position-independent so they commute with windowing)."""
        spatial = x.ndim == 4
        if spatial:
            assert self.fused, "spatial input requires the fused kernel"
            C = x.shape[-1]
            N = self.window[0] * self.window[1]
            B_ = None
        else:
            B_, N, C = x.shape
        assert C == self.dim and C % self.num_heads == 0
        hd = C // self.num_heads
        prec = matmul_precision(self.dtype)

        qkv_kernel = self.param("qkv_kernel", xavier_normal, (C, 3 * C),
                                jnp.float32)
        if self.qkv_bias:
            q_bias = self.param("q_bias", jax.nn.initializers.zeros, (C,),
                                jnp.float32)
            v_bias = self.param("v_bias", jax.nn.initializers.zeros, (C,),
                                jnp.float32)
            bias = jnp.concatenate([q_bias, jnp.zeros_like(q_bias), v_bias])
        else:
            bias = jnp.zeros((3 * C,), jnp.float32)

        # cosine attention with clamped learnable temperature
        # (reference AlterNet_SwinV2_FAN.py:277-279)
        logit_scale = self.param(
            "logit_scale",
            lambda *_: jnp.full((self.num_heads, 1, 1), np.log(10.0),
                                jnp.float32),
            (self.num_heads, 1, 1), jnp.float32)
        scale = jnp.exp(jnp.minimum(logit_scale, np.log(1.0 / 0.01)))

        # continuous relative position bias (reference :281-286)
        table = jnp.asarray(relative_coords_table(self.window))
        idx = jnp.asarray(relative_position_index(self.window))
        h1 = nn.Dense(512, kernel_init=xavier_normal,
                      bias_init=jax.nn.initializers.zeros,
                      param_dtype=jnp.float32, name="cpb_fc1")(table)
        bias_table = nn.Dense(self.num_heads, use_bias=False,
                              kernel_init=xavier_normal,
                              param_dtype=jnp.float32,
                              name="cpb_fc2")(nn.relu(h1))
        bias_table = bias_table.reshape(-1, self.num_heads)
        rel_bias = bias_table[idx.reshape(-1)].reshape(N, N, self.num_heads)
        rel_bias = rel_bias.transpose(2, 0, 1)
        bias16 = 16.0 * jax.nn.sigmoid(rel_bias)     # (heads, N, N)

        def _qkv(xin):
            return (jnp.dot(xin.astype(self.dtype),
                            qkv_kernel.astype(self.dtype), precision=prec)
                    + bias.astype(self.dtype))

        hg = pick_head_group(self.num_heads, N)
        if (self.fused and not spatial and self.packed and hg
                and self.entry_fused):
            # entry-fused packed kernel: the qkv GEMM runs inside, so qkv
            # never round-trips HBM and dW/dbias come out of the backward
            # kernel directly (ROUND4_NOTES.md entry-fusion section)
            from fr_tpu.ops.fused_window_attn_variants import (
                fused_window_attention_packed_qkv)
            out = fused_window_attention_packed_qkv(
                x.astype(self.dtype), qkv_kernel, bias,
                scale.reshape(self.num_heads), bias16, self.num_heads,
                mask.shape[0] if mask is not None else 1,
                jnp.asarray(mask) if mask is not None else None,
                self.block_rows, False, self.dtype, hg)
        elif spatial and (self.window[0], C) in SPATIAL_KERNEL_CONFIGS:
            from fr_tpu.ops.fused_window_attn_variants import (
                fused_window_attention_spatial)
            out = fused_window_attention_spatial(
                _qkv(x), scale.reshape(self.num_heads), bias16,
                self.num_heads, self.window[0],
                jnp.asarray(mask) if mask is not None else None)
        elif spatial:
            # config not in SPATIAL_KERNEL_CONFIGS — window outside,
            # windows-API kernel inside
            qkv = _qkv(x)
            ws = self.window[0]
            Hs, Ws = qkv.shape[1], qkv.shape[2]
            nW = (Hs // ws) * (Ws // ws)
            qkv_w = window_partition(qkv, ws)
            out_w = self._fused_call(qkv_w, scale, bias16, nW, mask)
            out = window_reverse(out_w, ws, Hs, Ws)
        elif self.fused:
            nW = mask.shape[0] if mask is not None else 1
            out = self._fused_call(_qkv(x), scale, bias16, nW, mask)
        else:
            qkv = _qkv(x)
            # Lane-aligned slices instead of a (3, heads) axis shuffle (the
            # 5-D transpose form materialises relayout copies per tensor
            # per block on TPU — ROUND2_NOTES.md AlterNet profile).
            q = qkv[..., :C].reshape(B_, N, self.num_heads, hd)
            k = qkv[..., C:2 * C].reshape(B_, N, self.num_heads, hd)
            v = qkv[..., 2 * C:].reshape(B_, N, self.num_heads, hd)
            qn = l2_normalize(q.astype(jnp.float32)).astype(self.dtype)
            kn = l2_normalize(k.astype(jnp.float32)).astype(self.dtype)
            attn = jnp.einsum("bnhd,bmhd->bhnm", qn, kn,
                              precision=prec,
                              preferred_element_type=jnp.float32)
            attn = attn * scale + bias16[None]
            if mask is not None:
                nW = mask.shape[0]
                m = jnp.asarray(mask)[None, :, None]  # (1, nW, 1, N, N)
                attn = attn.reshape(B_ // nW, nW, self.num_heads, N, N) + m
                attn = attn.reshape(B_, self.num_heads, N, N)
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
            out = jnp.einsum("bhnm,bmhd->bnhd", attn.astype(self.dtype),
                             v, precision=prec,
                             preferred_element_type=jnp.float32)
            out = out.reshape(B_, N, C)
        out = nn.Dense(C, kernel_init=xavier_normal,
                       bias_init=jax.nn.initializers.zeros,
                       dtype=self.dtype, param_dtype=jnp.float32,
                       precision=prec, name="proj")(out.astype(self.dtype))
        return out

    def _fused_call(self, qkv_w, scale, bias16, nW, mask):
        """Dispatch to the packed-lane or per-head fused kernel. Both
        kernels emit compute-dtype (bf16) pre-proj activations — the proj
        GEMM consumes that dtype anyway, halving the output + cotangent HBM
        traffic (VERDICT r3 next #2).

        Measured rule (ROUND4_NOTES.md probe tables): packing all heads
        into the lane dim wins 1.5–3.8× at the AlterNet window shapes
        (N=36/9: per-head lane padding is 3.6–14×) but ties or loses at
        the Swin/EffiAlter N=49 shapes for every pack/group variant tried
        — see pick_head_group for the numbers."""
        N = self.window[0] * self.window[1]
        m = jnp.asarray(mask) if mask is not None else None
        hg = pick_head_group(self.num_heads, N)
        stats = attention_stats_inmodel()
        if self.packed and hg:
            from fr_tpu.ops.fused_window_attn import (
                fused_window_attention_packed)
            return fused_window_attention_packed(
                qkv_w, scale.reshape(self.num_heads), bias16,
                self.num_heads, nW, m, self.block_rows,
                False, self.dtype, hg, stored_stats=stats)
        from fr_tpu.ops.fused_window_attn import fused_window_attention
        return fused_window_attention(
            qkv_w, scale.reshape(self.num_heads), bias16,
            self.num_heads, nW, m, self.block_rows, self.dtype,
            stored_stats=stats)


def attention_stats_inmodel() -> bool:
    """Whether the MODEL passes stored_stats=True to the fused attention.

    Default False (recompute backward): although the stored-stats backward
    kernels are probe-proven faster than the recompute backward at every
    shipping shape (ROUND4_NOTES.md tables), IN-MODEL they net zero to
    negative, for a structural reason measured three ways:

    - Under nn.remat(prevent_cse=False) the recompute path's primal and
      replayed forward are IDENTICAL custom-calls, so XLA CSEs them back
      into one (the swin50 trace shows exactly one fwd call per block).
      The stats forward is a DIFFERENT kernel, CSE cannot merge it with
      the primal's stat-free call, and the model pays one full extra
      forward per attention — swin50 same-ambient bench A/B: 38.46/38.62
      ms stats-on vs 38.42/38.67 stats-off (wash).
    - Dropping remat instead (stats fwd_rule runs once, stats flow
      straight to the backward) does realise the kernel delta — swin50
      device time 36.86 vs 36.97 ms, attention family 14.67 → 13.41 — but
      the shorter backward exposes previously-hidden param-staging
      copy-done waits (+1.31 ms copy/layout), netting ~0.1 ms.
    - On the packed AlterNet shapes the no-remat stats arm outright LOSES:
      alternet50 same-ambient 37.07 ms vs 34.97 recompute (the large
      saved qkv + packed-stats residuals displace the prefetch schedule).

    FR_ATTN_STORED_STATS=1 opts the model in (A/B switch); direct callers
    of the ops (probes, tests, user code without remat) keep the op-level
    stored_stats=True default, where the kernel win is real.
    """
    return os.environ.get("FR_ATTN_STORED_STATS") == "1"


def attention_remat_default() -> bool:
    """Remat the attention module unless the model opted into stored stats.

    With the recompute backward, nn.remat(prevent_cse=False) is free (CSE
    merges primal and replay — see attention_stats_inmodel). When stats
    are forced on in-model (FR_ATTN_STORED_STATS=1), remat comes OFF so
    the stats forward runs once — the two choices always compose, so
    FR_ATTN_STORED_STATS is the ONE in-model A/B switch (the former
    independent FR_ATTN_REMAT/FR_ATTN_BF16_VJP knobs were folded into the
    ROUND4/5_NOTES measurement history; both arms of each are recorded
    there)."""
    return not attention_stats_inmodel()


def make_window_attention(dim, window, heads, dtype,
                          remat: Optional[bool] = None,
                          fused: bool = True, block_rows: int = 1024):
    """WindowAttention factory; remat defaults to attention_remat_default().

    Attention intermediates dominate the transformer blocks' HBM traffic on
    TPU (the f32 score tensors alone are ~42 MB per stage-2 block at b=128;
    saved qkv/normalised heads add more — measured, ROUND2_NOTES.md). Under
    jax.checkpoint the backward recomputes the window attention from its
    18.9 MB input instead of round-tripping every intermediate; the extra
    FLOPs are negligible (the attention GEMMs are ~1.4 GFLOP/step total).
    prevent_cse=False is the under-jit setting (no CSE hazard, better code).
    See attention_remat_default for why the stored-stats backward turns
    remat OFF.
    """
    if remat is None:
        remat = attention_remat_default()
    cls = nn.remat(WindowAttention, prevent_cse=False) if remat \
        else WindowAttention
    # pin the auto-name the un-lifted class would get, so parameter paths
    # (and therefore checkpoints) are identical with and without remat
    return cls(dim, window, heads, dtype=dtype, fused=fused,
               block_rows=block_rows, name="WindowAttention_0")


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm DropPath semantics)."""
    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(self.make_rng("dropout"), keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


def adaptive_avg_pool(x: jnp.ndarray, oh: int, ow: int) -> jnp.ndarray:
    """torch AdaptiveAvgPool2d semantics on NHWC: bin i covers
    [floor(i·H/oh), ceil((i+1)·H/oh)) (reference AlterNet head uses (6,6),
    nets/AlterNet_SwinV2_FAN.py:670)."""
    B, H, W, C = x.shape
    if H == oh and W == ow:
        return x
    if H % oh == 0 and W % ow == 0:
        return x.reshape(B, oh, H // oh, ow, W // ow, C).mean(axis=(2, 4))
    rows = []
    for i in range(oh):
        h0, h1 = (i * H) // oh, -((-(i + 1) * H) // oh)
        cols = []
        for j in range(ow):
            w0, w1 = (j * W) // ow, -((-(j + 1) * W) // ow)
            cols.append(x[:, h0:h1, w0:w1, :].mean(axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)

"""Fused margin-softmax cross-entropy Pallas kernel (the north-star kernel).

Fuses the PartialFC hot path — cosine logits → clamp(±1) → ArcFace/CosFace
margin → scale → online-softmax cross-entropy — into flash-style Pallas
kernels that never materialise the (N, K) logit matrix in HBM (the reference
materialises it and walks it several times: nets/PartialFC.py:198-207 +
nets/ArcFace.py:76-91 + nets/PartialFC.py:441-484).

Forward: one kernel pass computes per-sample online-softmax statistics
(row max m, denominator d, target numerator t) over class tiles streamed
through VMEM; the distributed case pmax/psums the statistics over the
'model' axis exactly like the reference's three all_reduces
(nets/PartialFC.py:446-459).

Backward (custom VJP): two recomputation kernels (one accumulating grad_emb
over class tiles, one accumulating grad_w over batch tiles) with the
reference's backward semantics: d/dy = softmax − onehot, ignoring the 1e-30
log clamp (nets/PartialFC.py:463-484); the margin and ±1-clamp derivatives
are applied elementwise in-register.

All matmuls run on the MXU (bf16 inputs when mixed_precision, f32
accumulate); the softmax bookkeeping is f32 on the VPU.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK = -1e30
DEFAULT_BT = 128   # batch-tile rows
DEFAULT_KT = 512   # class-tile columns


def _interpret() -> bool:
    """Pallas interpret mode off-TPU (CPU test meshes)."""
    return jax.default_backend() != "tpu"


def _out_vma(*arrays):
    """Variance (vma) for kernel outputs under shard_map check_vma: the union
    of the inputs' manual-axes variance; empty outside shard_map."""
    vma = frozenset()
    for a in arrays:
        v = getattr(jax.typeof(a), "vma", None)
        if v:
            vma |= v
    return vma


def _sds(shape, vma):
    return jax.ShapeDtypeStruct(shape, jnp.float32, vma=vma)


def _align_vma(*arrays):
    """Make all arrays vary over the union of their manual axes (kernel
    operands must agree under check_vma)."""
    union = frozenset()
    for a in arrays:
        union |= getattr(jax.typeof(a), "vma", None) or frozenset()
    out = []
    for a in arrays:
        have = getattr(jax.typeof(a), "vma", None) or frozenset()
        missing = tuple(sorted(union - have))
        out.append(jax.lax.pcast(a, missing, to="varying")
                   if missing else a)
    return out


def _match_cotangent_vma(cot, primal):
    """shard_map's built-in AD auto-psums cotangents over mesh axes the primal
    is replicated on; a custom_vjp must do this itself. psum the cotangent
    over (cot.vma − primal.vma)."""
    cvma = getattr(jax.typeof(cot), "vma", None) or frozenset()
    pvma = getattr(jax.typeof(primal), "vma", None) or frozenset()
    extra = tuple(sorted(cvma - pvma))
    if extra:
        cot = lax.psum(cot, extra)
    return cot


def _margin_consts(margin: str, m: float, easy_margin: bool = False):
    if margin == "ArcFace":
        # easy_margin (reference nets/ArcFace.py:71-85) is the hard-margin
        # formula with fallback threshold 0 and fallback value z itself,
        # i.e. theta=0, sinmm=0 — no separate kernel branch needed.
        if easy_margin:
            return dict(cos_m=math.cos(m), sin_m=math.sin(m),
                        theta=0.0, sinmm=0.0)
        return dict(cos_m=math.cos(m), sin_m=math.sin(m),
                    theta=math.cos(math.pi - m),
                    sinmm=math.sin(math.pi - m) * m)
    if margin == "CosFace":
        return dict(m=m)
    raise ValueError(margin)


def _apply_margin_tile(z, onehot, margin: str, s: float, mc):
    """Elementwise margin on a (BT, KT) cosine tile; z already clamped."""
    if margin == "ArcFace":
        sq = 1.0 - z * z
        sin_theta = jnp.where(sq > 0, jnp.sqrt(jnp.where(sq > 0, sq, 1.0)), 0.0)
        margined = jnp.where(z > mc["theta"],
                             z * mc["cos_m"] - sin_theta * mc["sin_m"],
                             z - mc["sinmm"])
    else:  # CosFace
        margined = z - mc["m"]
    return jnp.where(onehot, margined, z) * s


def _margin_deriv_tile(z, onehot, margin: str, s: float, mc):
    """d(margined)/dz on the same tile (see _apply_margin_tile)."""
    if margin == "ArcFace":
        sq = 1.0 - z * z
        safe = jnp.where(sq > 0, sq, 1.0)
        dmarg = jnp.where(sq > 0,
                          mc["cos_m"] + mc["sin_m"] * z * lax.rsqrt(safe),
                          mc["cos_m"])
        dmarg = jnp.where(z > mc["theta"], dmarg, 1.0)
    else:
        dmarg = jnp.ones_like(z)
    return jnp.where(onehot, dmarg, 1.0) * s


def _tile_logits(emb_ref, w_ref, compute_dtype):
    e = emb_ref[...].astype(compute_dtype)
    w = w_ref[...].astype(compute_dtype)
    raw = jax.lax.dot_general(
        e, w, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    return raw


def _fwd_kernel(emb_ref, w_ref, lab_ref, cv_ref, m_out, d_out, t_out,
                acc_m, acc_d, acc_t, *, margin, s, mc, kt, nk, compute_dtype):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_m[...] = jnp.full_like(acc_m, -jnp.inf)
        acc_d[...] = jnp.zeros_like(acc_d)
        acc_t[...] = jnp.zeros_like(acc_t)

    raw = _tile_logits(emb_ref, w_ref, compute_dtype)
    z = jnp.clip(raw, -1.0, 1.0)
    bt = z.shape[0]
    col = j * kt + jax.lax.broadcasted_iota(jnp.int32, (bt, kt), 1)
    lab = lab_ref[...]  # (BT, 1)
    onehot = col == lab
    y = _apply_margin_tile(z, onehot, margin, s, mc)
    y = jnp.where(cv_ref[...].T > 0, y, MASK)  # (1, KT) valid mask

    tile_max = jnp.max(y, axis=1, keepdims=True)
    m_new = jnp.maximum(acc_m[...], tile_max)
    alpha = jnp.exp(acc_m[...] - m_new)
    e = jnp.exp(y - m_new)
    acc_d[...] = acc_d[...] * alpha + jnp.sum(e, axis=1, keepdims=True)
    acc_t[...] = acc_t[...] * alpha + jnp.sum(
        jnp.where(onehot, e, 0.0), axis=1, keepdims=True)
    acc_m[...] = m_new

    @pl.when(j == nk - 1)
    def _():
        m_out[...] = acc_m[...]
        d_out[...] = acc_d[...]
        t_out[...] = acc_t[...]


def _coeff_tile(emb_ref, w_ref, lab_ref, cv_ref, m_ref, d_ref, g_ref,
                j, *, margin, s, mc, kt, compute_dtype):
    """Recompute coeff_ij = ḡ_i·s·margin'·clamp'·(p_ij − onehot_ij)."""
    raw = _tile_logits(emb_ref, w_ref, compute_dtype)
    clamp_pass = (raw >= -1.0) & (raw <= 1.0)
    z = jnp.clip(raw, -1.0, 1.0)
    bt = z.shape[0]
    col = j * kt + jax.lax.broadcasted_iota(jnp.int32, (bt, kt), 1)
    onehot = col == lab_ref[...]
    valid = cv_ref[...].T > 0
    y = _apply_margin_tile(z, onehot, margin, s, mc)
    y = jnp.where(valid, y, MASK)
    p = jnp.exp(y - m_ref[...]) / d_ref[...]
    dy = p - jnp.where(onehot, 1.0, 0.0)
    dmargin = _margin_deriv_tile(z, onehot, margin, s / 1.0, mc)
    coeff = g_ref[...] * dy * dmargin
    coeff = jnp.where(clamp_pass & valid, coeff, 0.0)
    return coeff


def _bwd_emb_kernel(emb_ref, w_ref, lab_ref, cv_ref, m_ref, d_ref, g_ref,
                    ge_out, *, margin, s, mc, kt, nk, compute_dtype):
    j = pl.program_id(1)
    coeff = _coeff_tile(emb_ref, w_ref, lab_ref, cv_ref, m_ref, d_ref, g_ref,
                        j, margin=margin, s=s, mc=mc, kt=kt,
                        compute_dtype=compute_dtype)
    part = jax.lax.dot_general(
        coeff.astype(compute_dtype), w_ref[...].astype(compute_dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        ge_out[...] = part

    @pl.when(j > 0)
    def _():
        ge_out[...] = ge_out[...] + part


def _bwd_w_kernel(emb_ref, w_ref, lab_ref, cv_ref, m_ref, d_ref, g_ref,
                  gw_out, *, margin, s, mc, kt, nb, compute_dtype):
    j = pl.program_id(0)  # class tile (slow)
    i = pl.program_id(1)  # batch tile (fast)
    coeff = _coeff_tile(emb_ref, w_ref, lab_ref, cv_ref, m_ref, d_ref, g_ref,
                        j, margin=margin, s=s, mc=mc, kt=kt,
                        compute_dtype=compute_dtype)
    part = jax.lax.dot_general(
        coeff.astype(compute_dtype), emb_ref[...].astype(compute_dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _():
        gw_out[...] = part

    @pl.when(i > 0)
    def _():
        gw_out[...] = gw_out[...] + part


def _pad_rows(x, mult, value=0.0):
    n = x.shape[0]
    pad = (-n) % mult
    if pad == 0:
        return x
    width = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, width, constant_values=value)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_margin_softmax_ce(emb, w, label_cols, col_valid, cfg, model_axis,
                            tiles):
    """Per-sample margin-softmax CE over (possibly sharded) class columns.

    emb        : (N, D) L2-normalised embeddings (f32, or bf16 under mixed
                 precision — feed the compute dtype so tile traffic matches
                 the jnp path; kernels accumulate f32 either way)
    w          : (K, D) L2-normalised activated class centers (same dtype)
    label_cols : (N,) int32 local column of the target, or -1
    col_valid  : (K,) bool — False for padding class columns
    cfg        : PFCConfig-like (margin, s, m, mixed_precision, num_classes…)
    model_axis : mesh axis name for the class sharding, or None
    tiles      : (BT, KT)

    Returns per-sample loss (N,), replicated over model_axis.
    """
    loss, _ = _fwd_impl(emb, w, label_cols, col_valid, cfg, model_axis, tiles)
    return loss


def _stats_jnp(emb, w, label_cols, col_valid, cfg):
    """jnp equivalent of the forward kernel (off-TPU fallback; identical
    semantics, used under interpret-mode meshes where in-kernel vma checks
    reject mixed-variance constants)."""
    mc = _margin_consts(cfg.margin, cfg.m, getattr(cfg, "easy_margin", False))
    compute = jnp.bfloat16 if cfg.mixed_precision else jnp.float32
    raw = jnp.dot(emb.astype(compute), w.astype(compute).T,
                  preferred_element_type=jnp.float32)
    z = jnp.clip(raw, -1.0, 1.0)
    onehot = jnp.arange(w.shape[0])[None, :] == label_cols[:, None]
    y = _apply_margin_tile(z, onehot, cfg.margin, cfg.s, mc)
    y = jnp.where(col_valid[None, :], y, MASK)
    m = jnp.max(y, axis=1)
    e = jnp.exp(y - m[:, None])
    d = jnp.sum(e, axis=1)
    t = jnp.sum(jnp.where(onehot, e, 0.0), axis=1)
    return m, d, t


def _bwd_jnp(emb, w, label_cols, col_valid, m_g, d_g, g, cfg):
    mc = _margin_consts(cfg.margin, cfg.m, getattr(cfg, "easy_margin", False))
    compute = jnp.bfloat16 if cfg.mixed_precision else jnp.float32
    raw = jnp.dot(emb.astype(compute), w.astype(compute).T,
                  preferred_element_type=jnp.float32)
    clamp_pass = (raw >= -1.0) & (raw <= 1.0)
    z = jnp.clip(raw, -1.0, 1.0)
    onehot = jnp.arange(w.shape[0])[None, :] == label_cols[:, None]
    valid = col_valid[None, :]
    y = _apply_margin_tile(z, onehot, cfg.margin, cfg.s, mc)
    y = jnp.where(valid, y, MASK)
    p = jnp.exp(y - m_g[:, None]) / d_g[:, None]
    dy = p - jnp.where(onehot, 1.0, 0.0)
    dmargin = _margin_deriv_tile(z, onehot, cfg.margin, cfg.s, mc)
    coeff = g[:, None] * dy * dmargin
    coeff = jnp.where(clamp_pass & valid, coeff, 0.0)
    ge = jnp.dot(coeff.astype(compute), w.astype(compute),
                 preferred_element_type=jnp.float32)
    gw = jnp.dot(coeff.T.astype(compute), emb.astype(compute),
                 preferred_element_type=jnp.float32)
    return ge, gw


def _stats(emb, w, label_cols, col_valid, cfg, tiles):
    if _interpret():
        return _stats_jnp(emb, w, label_cols, col_valid, cfg)
    bt, kt = tiles
    n, d_dim = emb.shape
    k = w.shape[0]
    emb_p = _pad_rows(emb, bt)
    w_p = _pad_rows(w, kt)
    # padded batch rows: label -1 (no target)
    lab_p = _pad_rows(label_cols.reshape(-1, 1), bt, value=-1)
    cv = _pad_rows(col_valid.astype(jnp.float32).reshape(-1, 1), kt)
    nb = emb_p.shape[0] // bt
    nk = w_p.shape[0] // kt
    mc = _margin_consts(cfg.margin, cfg.m, getattr(cfg, "easy_margin", False))
    compute = jnp.bfloat16 if cfg.mixed_precision else jnp.float32
    emb_p, w_p, lab_p, cv = _align_vma(emb_p, w_p, lab_p, cv)

    kernel = functools.partial(
        _fwd_kernel, margin=cfg.margin, s=cfg.s, mc=mc, kt=kt, nk=nk,
        compute_dtype=compute)
    vma = _out_vma(emb_p, w_p, lab_p)
    out_shape = [_sds((emb_p.shape[0], 1), vma)] * 3
    m, d, t = pl.pallas_call(
        kernel,
        grid=(nb, nk),
        in_specs=[
            pl.BlockSpec((bt, d_dim), lambda i, j: (i, 0)),
            pl.BlockSpec((kt, d_dim), lambda i, j: (j, 0)),
            pl.BlockSpec((bt, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((kt, 1), lambda i, j: (j, 0)),
        ],
        out_specs=[pl.BlockSpec((bt, 1), lambda i, j: (i, 0))] * 3,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((bt, 1), jnp.float32)] * 3,
        interpret=_interpret(),
    )(emb_p, w_p, lab_p, cv)
    return m[:n, 0], d[:n, 0], t[:n, 0]


def _fwd_impl(emb, w, label_cols, col_valid, cfg, model_axis, tiles):
    m, d, t = _stats(emb, w, label_cols, col_valid, cfg, tiles)
    if model_axis is not None:
        m_g = lax.pmax(m, model_axis)
        scale = jnp.exp(m - m_g)
        d_g = lax.psum(d * scale, model_axis)
        t_g = lax.psum(t * scale, model_axis)
    else:
        m_g, d_g, t_g = m, d, t
    p = t_g / d_g
    loss = -jnp.log(jnp.clip(p, 1e-30, None))
    return loss, (emb, w, label_cols, col_valid, m_g, d_g, p)


def _fwd_rule(emb, w, label_cols, col_valid, cfg, model_axis, tiles):
    loss, res = _fwd_impl(emb, w, label_cols, col_valid, cfg, model_axis,
                          tiles)
    return loss, res


def _bwd_rule(cfg, model_axis, tiles, res, g):
    emb, w, label_cols, col_valid, m_g, d_g, p = res
    # match jnp-path AD of -log(clip(p, 1e-30)): rows whose target prob
    # underflowed the clamp carry no gradient. (The reference's hand-written
    # backward would instead push all their logits down,
    # nets/PartialFC.py:463-484 — divergence only in this pathological
    # dropped-positive corner.)
    g = jnp.where(p >= 1e-30, g, 0.0)
    if _interpret():
        ge, gw = _bwd_jnp(emb, w, label_cols, col_valid, m_g, d_g, g, cfg)
        return (_match_cotangent_vma(ge.astype(emb.dtype), emb),
                _match_cotangent_vma(gw.astype(w.dtype), w),
                None, None)
    bt, kt = tiles
    n, d_dim = emb.shape
    k = w.shape[0]
    emb_p = _pad_rows(emb, bt)
    w_p = _pad_rows(w, kt)
    lab_p = _pad_rows(label_cols.reshape(-1, 1), bt, value=-1)
    cv = _pad_rows(col_valid.astype(jnp.float32).reshape(-1, 1), kt)
    m_p = _pad_rows(m_g.reshape(-1, 1), bt)
    d_p = _pad_rows(d_g.reshape(-1, 1), bt, value=1.0)
    g_p = _pad_rows(g.reshape(-1, 1), bt)
    nb = emb_p.shape[0] // bt
    nk = w_p.shape[0] // kt
    mc = _margin_consts(cfg.margin, cfg.m, getattr(cfg, "easy_margin", False))
    compute = jnp.bfloat16 if cfg.mixed_precision else jnp.float32
    emb_p, w_p, lab_p, cv, m_p, d_p, g_p = _align_vma(
        emb_p, w_p, lab_p, cv, m_p, d_p, g_p)

    in_specs_ij = [
        pl.BlockSpec((bt, d_dim), lambda i, j: (i, 0)),
        pl.BlockSpec((kt, d_dim), lambda i, j: (j, 0)),
        pl.BlockSpec((bt, 1), lambda i, j: (i, 0)),
        pl.BlockSpec((kt, 1), lambda i, j: (j, 0)),
        pl.BlockSpec((bt, 1), lambda i, j: (i, 0)),
        pl.BlockSpec((bt, 1), lambda i, j: (i, 0)),
        pl.BlockSpec((bt, 1), lambda i, j: (i, 0)),
    ]
    ge = pl.pallas_call(
        functools.partial(_bwd_emb_kernel, margin=cfg.margin, s=cfg.s, mc=mc,
                          kt=kt, nk=nk, compute_dtype=compute),
        grid=(nb, nk),
        in_specs=in_specs_ij,
        out_specs=pl.BlockSpec((bt, d_dim), lambda i, j: (i, 0)),
        out_shape=_sds(emb_p.shape, _out_vma(emb_p, w_p, g_p)),
        interpret=_interpret(),
    )(emb_p, w_p, lab_p, cv, m_p, d_p, g_p)[:n]

    in_specs_ji = [
        pl.BlockSpec((bt, d_dim), lambda j, i: (i, 0)),
        pl.BlockSpec((kt, d_dim), lambda j, i: (j, 0)),
        pl.BlockSpec((bt, 1), lambda j, i: (i, 0)),
        pl.BlockSpec((kt, 1), lambda j, i: (j, 0)),
        pl.BlockSpec((bt, 1), lambda j, i: (i, 0)),
        pl.BlockSpec((bt, 1), lambda j, i: (i, 0)),
        pl.BlockSpec((bt, 1), lambda j, i: (i, 0)),
    ]
    gw = pl.pallas_call(
        functools.partial(_bwd_w_kernel, margin=cfg.margin, s=cfg.s, mc=mc,
                          kt=kt, nb=nb, compute_dtype=compute),
        grid=(nk, nb),
        in_specs=in_specs_ji,
        out_specs=pl.BlockSpec((kt, d_dim), lambda j, i: (j, 0)),
        out_shape=_sds(w_p.shape, _out_vma(emb_p, w_p, g_p)),
        interpret=_interpret(),
    )(emb_p, w_p, lab_p, cv, m_p, d_p, g_p)[:k]

    # cotangent dtype must match the primal dtype (bf16 operands under mixed
    # precision — the f32→bf16 cast outside this custom_vjp converts back)
    return (_match_cotangent_vma(ge.astype(emb.dtype), emb),
            _match_cotangent_vma(gw.astype(w.dtype), w),
            None, None)


fused_margin_softmax_ce.defvjp(_fwd_rule, _bwd_rule)


def fused_available() -> bool:
    return jax.default_backend() == "tpu"

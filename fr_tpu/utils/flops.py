"""Analytic FLOP counting by walking a jaxpr.

Counts matmul (dot_general) and convolution (conv_general_dilated) FLOPs —
the MXU work that dominates encoder cost — for roofline reporting
(BASELINE.md: ≥95% of roofline imgs/sec/chip target).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _dot_flops(eqn) -> float:
    a = eqn.invars[0].aval.shape
    b = eqn.invars[1].aval.shape
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    batch = math.prod(a[i] for i in lb)
    m = math.prod(a[i] for i in range(len(a)) if i not in tuple(lc) + tuple(lb))
    k = math.prod(a[i] for i in lc)
    n = math.prod(b[i] for i in range(len(b)) if i not in tuple(rc) + tuple(rb))
    return 2.0 * batch * m * n * k


def _conv_flops(eqn) -> float:
    out = eqn.outvars[0].aval.shape
    rhs = eqn.invars[1].aval.shape
    dn = eqn.params["dimension_numbers"]
    fgc = eqn.params.get("feature_group_count", 1)
    bgc = eqn.params.get("batch_group_count", 1)
    # output spatial * batch * out_channels
    out_elems = math.prod(out)
    # kernel spatial * in_channels_per_group
    k_spatial = math.prod(rhs[i] for i in dn.rhs_spec[2:])
    cin_per_group = rhs[dn.rhs_spec[1]]
    return 2.0 * out_elems * k_spatial * cin_per_group / max(bgc, 1)


def count_flops(fn, *args, **kwargs) -> float:
    """Total dot/conv FLOPs of fn(*args) by jaxpr traversal (recurses into
    pjit/custom_jvp/scan/while/cond sub-jaxprs; scan multiplies by length)."""
    jaxpr = jax.make_jaxpr(fn, **kwargs)(*args)
    return _walk(jaxpr.jaxpr)


def _walk(jaxpr) -> float:
    total = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            total += _dot_flops(eqn)
        elif name == "conv_general_dilated":
            total += _conv_flops(eqn)
        elif name == "scan":
            total += eqn.params["length"] * _walk(eqn.params["jaxpr"].jaxpr)
        elif name == "while":
            # unknowable trip count; count one iteration
            total += _walk(eqn.params["body_jaxpr"].jaxpr)
        elif name == "cond":
            branches = eqn.params["branches"]
            total += max(_walk(b.jaxpr) for b in branches)
        elif name == "pallas_call":
            # the kernel jaxpr describes ONE grid program; total work is
            # grid-many executions of it
            total += _pallas_grid_size(eqn) * _walk(_as_jaxpr(
                eqn.params["jaxpr"]))
        else:
            for k in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                sub = eqn.params.get(k)
                if sub is not None:
                    total += _walk(_as_jaxpr(sub))
                    break
    return total


def _as_jaxpr(sub):
    return sub.jaxpr if hasattr(sub, "jaxpr") else sub


def _pallas_grid_size(eqn) -> float:
    grid = getattr(eqn.params.get("grid_mapping"), "grid", ()) or ()
    # dynamic grid dims trace as non-int objects; count them as 1
    return math.prod(g for g in grid if isinstance(g, int)) if grid else 1.0


# ---------------------------------------------------------------------------
# Achievable (occupancy-aware) MXU roofline
# ---------------------------------------------------------------------------
#
# The naive roofline (peak_bf16 / 3·fwd_FLOPs) assumes every contraction can
# fill the 128×128 systolic array. Measured XPlane profiles of the R100
# training step on v5e (ROUND2_NOTES.md, scripts/trace_probe.py +
# xplane_analyze.py) show that is physically wrong for two op classes:
#
#   * 3×3 convs with C_in = 64 (ResNet stage 1): the MXU contraction depth is
#     C_in per tap in every formulation that does not materialise im2col
#     patches (which loses 5×, scripts/stem_probe.py) or relayout lanes
#     (which loses more than it gains, scripts/stage1_probe.py analysis) —
#     so at most 64 of 128 sublanes carry data. Measured: 50-55% of peak,
#     exactly min(C_in,128)/128.
#   * conv weight-gradients write a (kh,kw,C_in,C_out) output whose lane dim
#     is C_out: stage-1 wgrad measured at 46-50% of peak = min(C_out,128)/128
#     while stages 2-4 (C ≥ 128) measured 93-99%.
#
# The achievable-roofline model below encodes those *hardware* ceilings and
# nothing else (no allowance for elementwise, copies, optimizer, pooling or
# dispatch — those must still be driven to zero to reach 1.0):
#
#   fwd    : occupancy = min(K_eff, 128)/128,  K_eff = C_in   (C_in ≥ 8)
#                                             K_eff = C_in·kh·kw (tiny C_in:
#            the 3-channel stem is worth folding taps for, and XLA partially
#            does; using the full im2col depth keeps the bound unbeatable)
#   dgrad  : occupancy = min(C_out,128)/128, skipped for convs consuming the
#            network input (no gradient w.r.t. data is computed)
#   wgrad  : occupancy = min(C_out,128)/128
#   dots   : occupancy = min(K,128)/128
#   f32 @ Precision.HIGHEST runs as 6-pass bf16 on the MXU → 6× time.
#
# Validation against the measured step (R100, b=256, bf16, v5e @197 TF/s):
# this model gives ≈99 ms of MXU-floor time vs 99.5 ms measured conv+dot
# device time — i.e. the compiled program's matmuls already run at the
# model's ceiling (ROUND2_NOTES.md "Ceiling accounting").

_F32_HIGHEST_PASSES = 6.0

# ---------------------------------------------------------------------------
# Per-family achievable step floors (VERDICT r4 weak #3 / next #3)
# ---------------------------------------------------------------------------
#
# The achievable_mxu_seconds denominator counts the window-attention's
# normalize/softmax/VPU work as ZERO — correct for the conv-only ResNet
# families (their measured 0.78-0.93 closes against it), but structurally
# unreachable for the transformer families: swin50 with its attention at the
# measured Mosaic floor would still read ≈0.4 of "achievable", so the ≥0.95
# north star was unfalsifiable for half the matrix. The family floor adds
# the MEASURED best-known Mosaic kernel time for the family's attention
# call sites — the kernel-design optimum established by the round-2..5
# probe/A-B program (per-head vs packed vs grouped vs grid-axis vs batched
# vs stored-stats vs unfused-jnp, each parity-tested and timed on-chip;
# ROUND4_NOTES/ROUND5_NOTES) — to the occupancy-aware MXU bound:
#
#     step_floor = achievable_mxu_seconds + ATTN_KERNEL_FLOOR_MS[family]
#
# Provenance of the table values (all b=128, v5e, XPlane 'XLA Ops'
# decompositions of the full training step — in-model custom-call times,
# which match the standalone probe within noise since the round-4 probe
# fix):
#   AlterNet50  8.8 ms  — ROUND4_NOTES "Fresh AlterNet50 decomposition"
#                         (packed-lane kernel, stages s2/s3/s4)
#   Swin50     11.76 ms — ROUND5_NOTES fresh decomposition after the
#                         batched kernel bodies landed (sw3 4×(0.46+0.84),
#                         sw4 10×(~0.19+0.42); was 14.67 in round 4)
#   EffiAlter_m 2.0 ms  — ROUND3_NOTES EffiAlter decomposition ("attention
#                         ~2 (solved)"; its blocks are all N=49)
# Families with no attention (ResNet*) have floor 0 — their family floor
# IS the MXU bound and vs_family_floor coincides with vs_baseline.
#
# The floor scales linearly in batch (W — the window count — is the only
# batch-dependent kernel dimension and every per-call time above is
# throughput-bound at these W). Update the table when a kernel A/B moves
# the measured optimum (ROUND5_NOTES records each change).

ATTN_KERNEL_FLOOR_MS = {
    "AlterNet50": 8.8,
    "Swin50": 11.76,
    "EffiAlter_m": 2.0,
}
_ATTN_FLOOR_BATCH = 128  # batch size the table was measured at


def family_attn_floor_seconds(network: str, batch: int) -> float:
    """Measured Mosaic attention-kernel floor for one training step of
    `network` at `batch` (0.0 for attention-free families)."""
    ms = ATTN_KERNEL_FLOOR_MS.get(network, 0.0)
    return ms * 1e-3 * batch / _ATTN_FLOOR_BATCH


def pfc_head_floor_seconds(batch: int, num_sample: int, emb_dim: int,
                           optimizer: str,
                           hbm_gbps: float = 819.0,
                           peak_flops: float = 197e12) -> float:
    """HBM+MXU floor of the sampled PartialFC head per step: the sampled
    rows must be gathered (read + write S·D f32), the logits GEMM runs
    fwd + 2 backward dots (K = D = 512 → full MXU occupancy), and the
    sampled-row optimizer update reads/writes weight + slots + grad
    (SGD: w,m,g in / w,m out; AdamW: w,m,v,g in / w,m,v out). Softmax/CE
    elementwise work counts as zero, consistent with the MXU-floor
    philosophy of achievable_mxu_seconds. At WebFace42M scale
    (S≈206k, D=512) this is ~4.4 ms of a measured ~10.3 ms head — the
    ROUND5_NOTES webface decomposition derives the gap."""
    S, D = num_sample, emb_dim
    row_bytes = S * D * 4
    gather = 2 * row_bytes
    update = (7 if optimizer == "AdamW" else 5) * row_bytes
    gemm = 3 * 2.0 * batch * S * D
    return (gather + update) / (hbm_gbps * 1e9) + gemm / peak_flops


def _eqn_dtype_penalty(eqn) -> float:
    if eqn.invars[0].aval.dtype == jnp.bfloat16:
        return 1.0
    return _F32_HIGHEST_PASSES


def achievable_mxu_seconds(fn, peak_flops: float, *args,
                           backward: bool = True, **kwargs) -> float:
    """Lower bound on MXU seconds for one call of fn(*args) on a chip
    with `peak_flops` bf16 FLOP/s, under the occupancy model above. fn is the
    *forward* computation; with backward=True (default) the backward cost is
    derived per-op (dgrad + wgrad for convs, 2 sibling dots for dot_general);
    backward=False bounds inference/eval (the embed path)."""
    jaxpr = jax.make_jaxpr(fn, **kwargs)(*args)
    return _walk_time(jaxpr.jaxpr, backward) / peak_flops


def _walk_time(jaxpr, backward: bool = True) -> float:
    total = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            f = _dot_flops(eqn)
            a = eqn.invars[0].aval.shape
            (lc, _), _ = eqn.params["dimension_numbers"]
            k = math.prod(a[i] for i in lc)
            occ = min(k, 128) / 128.0
            pen = _eqn_dtype_penalty(eqn)
            # fwd + two backward dots (d/dA and d/dB); their contraction
            # depths differ but are ≥ min(m,n,k) which is large for every
            # dot in these nets — keep occupancy 1.0 on the backward
            total += pen * (f / occ + (2.0 * f if backward else 0.0))
        elif name == "conv_general_dilated":
            f = _conv_flops(eqn)
            rhs = eqn.invars[1].aval.shape
            dn = eqn.params["dimension_numbers"]
            cin = rhs[dn.rhs_spec[1]]
            cout = rhs[dn.rhs_spec[0]]
            k_spatial = math.prod(rhs[i] for i in dn.rhs_spec[2:])
            k_eff = cin if cin >= 8 else cin * k_spatial
            occ_fwd = min(k_eff, 128) / 128.0
            occ_bwd = min(cout, 128) / 128.0
            pen = _eqn_dtype_penalty(eqn)
            t = f / occ_fwd
            if backward:
                t += f / occ_bwd                      # wgrad
                if cin >= 8:                          # dgrad (skip stem)
                    t += f / occ_bwd
            total += pen * t
        elif name == "scan":
            total += eqn.params["length"] * _walk_time(
                eqn.params["jaxpr"].jaxpr, backward)
        elif name == "while":
            total += _walk_time(eqn.params["body_jaxpr"].jaxpr, backward)
        elif name == "cond":
            total += max(_walk_time(b.jaxpr, backward)
                         for b in eqn.params["branches"])
        elif name == "pallas_call":
            total += _pallas_grid_size(eqn) * _walk_time(_as_jaxpr(
                eqn.params["jaxpr"]), backward)
        else:
            for k in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                sub = eqn.params.get(k)
                if sub is not None:
                    total += _walk_time(_as_jaxpr(sub), backward)
                    break
    return total

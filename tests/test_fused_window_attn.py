"""Parity of the fused window-attention op (fr_tpu/ops/fused_window_attn.py)
against the unfused jnp path of WindowAttention — forward and gradients,
masked (SW-MSA) and unmasked, f32 and bf16, plus full-module equivalence
fused vs unfused.

Off-TPU the op runs its pure-jnp twin (same decomposition as the Mosaic
kernels); the real lowering is covered by scripts/tpu_smoke.py on-chip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fr_tpu.models.swin_common import WindowAttention, shifted_window_mask
from fr_tpu.ops.fused_window_attn import fused_window_attention
from fr_tpu.models.common import l2_normalize


def _ref_attn(qkv, scale, bias16, mask, num_heads):
    """The unfused math, straight from WindowAttention's jnp branch."""
    B_, N, C3 = qkv.shape
    C = C3 // 3
    hd = C // num_heads
    dt = qkv.dtype
    q = qkv[..., :C].reshape(B_, N, num_heads, hd)
    k = qkv[..., C:2 * C].reshape(B_, N, num_heads, hd)
    v = qkv[..., 2 * C:].reshape(B_, N, num_heads, hd)
    qn = l2_normalize(q.astype(jnp.float32)).astype(dt)
    kn = l2_normalize(k.astype(jnp.float32)).astype(dt)
    attn = jnp.einsum("bnhd,bmhd->bhnm", qn, kn,
                      preferred_element_type=jnp.float32)
    attn = attn * scale[None, :, None, None] + bias16[None]
    if mask is not None:
        nW = mask.shape[0]
        attn = (attn.reshape(B_ // nW, nW, num_heads, N, N)
                + mask[:, None]).reshape(B_, num_heads, N, N)
    p = jax.nn.softmax(attn.astype(jnp.float32), -1)
    out = jnp.einsum("bhnm,bmhd->bnhd", p.astype(dt), v,
                     preferred_element_type=jnp.float32)
    return out.reshape(B_, N, C)


CASES = [
    # (B_, N, C, heads, nW, masked, dtype, tol)
    (32, 36, 128, 4, 16, True, jnp.float32, 5e-5),
    (32, 36, 128, 4, 16, False, jnp.float32, 5e-5),
    (16, 9, 512, 16, 4, True, jnp.bfloat16, 3e-2),
    (8, 49, 96, 8, 4, False, jnp.bfloat16, 3e-2),  # hd=12, C%128 != 0
]


@pytest.mark.parametrize("B_,N,C,h,nW,masked,dt,tol", CASES)
def test_fused_matches_unfused(B_, N, C, h, nW, masked, dt, tol):
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((B_, N, 3 * C)), dt)
    scale = jnp.asarray(np.abs(rng.standard_normal(h)) + 1.0, jnp.float32)
    bias16 = jnp.asarray(rng.standard_normal((h, N, N)), jnp.float32)
    mask = (jnp.asarray(np.where(rng.random((nW, N, N)) > 0.8, -100.0, 0.0),
                        jnp.float32) if masked else None)

    out_f = fused_window_attention(qkv, scale, bias16, h, nW, mask)
    out_r = _ref_attn(qkv, scale, bias16, mask, h)
    ref_mag = float(jnp.abs(out_r).max())
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               atol=tol * max(ref_mag, 1.0))

    f = lambda *a: fused_window_attention(a[0], a[1], a[2], h, nW, mask).sum()
    r = lambda *a: _ref_attn(a[0], a[1], a[2], mask, h).sum()
    gf = jax.grad(f, argnums=(0, 1, 2))(qkv, scale, bias16)
    gr = jax.grad(r, argnums=(0, 1, 2))(qkv, scale, bias16)
    for a, b in zip(gf, gr):
        mag = float(jnp.abs(b.astype(jnp.float32)).max())
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=tol * max(mag, 1.0))


def test_v1_out_dtype_bf16():
    """out_dtype=bf16 on the per-head kernel (the Swin/EffiAlter N=49
    dispatch): output dtype honoured, values and grads within bf16 noise
    of the f32-out call — the cotangent round-trips HBM in bf16."""
    B_, N, C, h, nW = 16, 49, 256, 8, 4
    rng = np.random.default_rng(11)
    qkv = jnp.asarray(rng.standard_normal((B_, N, 3 * C)), jnp.bfloat16)
    scale = jnp.asarray(np.abs(rng.standard_normal(h)) + 1.0, jnp.float32)
    bias16 = jnp.asarray(rng.standard_normal((h, N, N)), jnp.float32)

    out_b = fused_window_attention(qkv, scale, bias16, h, nW, None, 1024,
                                   jnp.bfloat16)
    assert out_b.dtype == jnp.bfloat16
    out_r = _ref_attn(qkv, scale, bias16, None, h)
    mag = float(jnp.abs(out_r).max())
    np.testing.assert_allclose(np.asarray(out_b, np.float32),
                               np.asarray(out_r), atol=3e-2 * max(mag, 1.0))

    fb = lambda *a: fused_window_attention(  # noqa: E731
        a[0], a[1], a[2], h, nW, None, 1024, jnp.bfloat16
    ).astype(jnp.float32).sum()
    rr = lambda *a: _ref_attn(a[0], a[1], a[2], None, h).sum()  # noqa: E731
    gf = jax.grad(fb, argnums=(0, 1, 2))(qkv, scale, bias16)
    gr = jax.grad(rr, argnums=(0, 1, 2))(qkv, scale, bias16)
    for a, b in zip(gf, gr):
        m = float(jnp.abs(b.astype(jnp.float32)).max())
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=3e-2 * max(m, 1.0))


BATCHED_CASES = [
    # (B_, N, C, heads, nW, masked) — the head-batched bodies
    # (_fwd_body_batched/_bwd_body_batched: every per-head tensor stacked
    # on axis 0, one fixed op sequence instead of num_heads unrolled
    # chains). The interpret short-circuit in _fwd/_bwd_rule bypasses the
    # kernel bodies off-TPU, so this drives them directly through
    # pallas_call(interpret=True) against the unfused oracle.
    (8, 49, 256, 8, 4, False),
    (8, 49, 256, 8, 4, True),
    (8, 9, 64, 4, 2, True),
]


@pytest.mark.parametrize("B_,N,C,h,nW,masked", BATCHED_CASES)
def test_batched_bodies_interpret_match_oracle(B_, N, C, h, nW, masked):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from fr_tpu.ops import fused_window_attn as fwa

    rng = np.random.default_rng(3)
    qkv = jnp.asarray(rng.standard_normal((B_, N, 3 * C)), jnp.bfloat16)
    scale = jnp.asarray(np.abs(rng.standard_normal(h)) + 1.0, jnp.float32)
    bias16 = jnp.asarray(rng.standard_normal((h, N, N)), jnp.float32)
    mask = (jnp.asarray(np.where(rng.random((nW, N, N)) > 0.8, -100.0, 0.0),
                        jnp.float32) if masked else None)
    g = jnp.asarray(rng.standard_normal((B_, N, C)), jnp.bfloat16)

    wb = B_ // 2
    grid = (B_ // wb,)
    in_specs = fwa._specs(grid[0], wb, N, 3 * C, h, masked, nW)
    args = [qkv, jnp.reshape(scale, (1, h)), bias16]
    if masked:
        args.append(mask)

    if masked:
        def fkern(q, s, b, m, o):
            fwa._fwd_body_batched(q, s, b, m, o, h, jnp.bfloat16)
    else:
        def fkern(q, s, b, o):
            fwa._fwd_body_batched(q, s, b, None, o, h, jnp.bfloat16)
    out = pl.pallas_call(
        fkern, grid=grid, in_specs=in_specs,
        out_specs=pl.BlockSpec((wb, N, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B_, N, C), jnp.float32),
        interpret=True)(*args)
    out_r = _ref_attn(qkv, scale, bias16, mask, h)
    mag = float(jnp.abs(out_r).max())
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(out_r), atol=3e-2 * max(mag, 1.0))

    bw_specs = list(in_specs) + [pl.BlockSpec((wb, N, C), lambda i: (i, 0, 0),
                                              memory_space=pltpu.VMEM)]
    if masked:
        def bkern(q, s, b, m, gg, dq, dsc, db):
            fwa._bwd_body_batched(q, s, b, m, gg, dq, dsc, db, h,
                                  jnp.bfloat16)
    else:
        def bkern(q, s, b, gg, dq, dsc, db):
            fwa._bwd_body_batched(q, s, b, None, gg, dq, dsc, db, h,
                                  jnp.bfloat16)
    dqkv, dscale, dbias = pl.pallas_call(
        bkern, grid=grid, in_specs=bw_specs,
        out_specs=[
            pl.BlockSpec((wb, N, 3 * C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, N, N), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B_, N, 3 * C), jnp.bfloat16),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
            jax.ShapeDtypeStruct((h, N, N), jnp.float32),
        ],
        interpret=True)(*(args + [g]))
    rr = lambda *a: (_ref_attn(a[0], a[1], a[2], mask, h)  # noqa: E731
                     * g.astype(jnp.float32)).sum()
    gr = jax.grad(rr, argnums=(0, 1, 2))(qkv, scale, bias16)
    for a, b in zip((dqkv, dscale.reshape(h), dbias), gr):
        m = float(jnp.abs(b.astype(jnp.float32)).max())
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=3e-2 * max(m, 1.0))


STATS_CASES = [
    # (B_, N, C, heads, nW, masked, out_bf16) — the stored-stats VJP (fwd
    # saves per-head p/s_raw, bwd skips the score/softmax recompute) runs
    # its REAL kernels under the Pallas interpreter; the custom-vjp rule
    # gates it off in interpret mode, so this drives the pair directly.
    (8, 49, 128, 4, 4, False, False),
    (8, 49, 128, 4, 4, True, True),
    (8, 9, 256, 8, 4, True, False),
]


@pytest.mark.parametrize("B_,N,C,h,nW,masked,out_bf16", STATS_CASES)
def test_stored_stats_interpret_matches_unfused(B_, N, C, h, nW, masked,
                                                out_bf16):
    """_fwd_stats/_bwd_stats (the N=49 stored-stats backward) vs the
    unfused oracle's value and grad — including the f32 stat round-trip
    and the zero-dmask contract."""
    from fr_tpu.ops import fused_window_attn as fwa

    rng = np.random.default_rng(9)
    qkv = jnp.asarray(rng.standard_normal((B_, N, 3 * C)), jnp.bfloat16)
    scale = jnp.asarray(np.abs(rng.standard_normal(h)) + 1.0, jnp.float32)
    bias16 = jnp.asarray(rng.standard_normal((h, N, N)), jnp.float32)
    mask = (jnp.asarray(np.where(rng.random((nW, N, N)) > 0.8, -100.0, 0.0),
                        jnp.float32) if masked else None)
    g = jnp.asarray(rng.standard_normal((B_, N, C)), jnp.float32)
    out_dt = jnp.bfloat16 if out_bf16 else None

    out, p_st = fwa._fwd_stats(qkv, scale, bias16, h, nW, mask,
                               1024, out_dt, interpret=True)
    if out_bf16:
        assert out.dtype == jnp.bfloat16
    out_r = _ref_attn(qkv, scale, bias16, mask, h)
    mag = float(jnp.abs(out_r).max())
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(out_r), atol=3e-2 * max(mag, 1.0))

    gc = g.astype(out.dtype)
    dqkv, dscale, dbias = fwa._bwd_stats(qkv, scale, p_st, gc,
                                         h, nW, 1024, interpret=True)
    rr = lambda *a: (_ref_attn(a[0], a[1], a[2], mask, h)  # noqa: E731
                     * gc.astype(jnp.float32)).sum()
    gr = jax.grad(rr, argnums=(0, 1, 2))(qkv, scale, bias16)
    for a, b in zip((dqkv, dscale.reshape(h), dbias), gr):
        m = float(jnp.abs(b.astype(jnp.float32)).max())
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=3e-2 * max(m, 1.0))


@pytest.mark.parametrize("B_,N,C,h,nW,masked,dt,tol", CASES)
def test_packed_interpret_matches_unfused(B_, N, C, h, nW, masked, dt, tol):
    """The packed-lane kernel's REAL program (repeat/mask/segment matrices,
    global-max softmax, head fold, dscale/dbias unpack) under the Pallas
    interpreter vs the unfused oracle — off-TPU this is the only coverage
    of the packed math itself (the jnp twin never packs)."""
    from fr_tpu.ops.fused_window_attn import fused_window_attention_packed

    rng = np.random.default_rng(4)
    qkv = jnp.asarray(rng.standard_normal((B_, N, 3 * C)), dt)
    scale = jnp.asarray(np.abs(rng.standard_normal(h)) + 1.0, jnp.float32)
    bias16 = jnp.asarray(rng.standard_normal((h, N, N)), jnp.float32)
    mask = (jnp.asarray(np.where(rng.random((nW, N, N)) > 0.8, -100.0, 0.0),
                        jnp.float32) if masked else None)

    out_f = fused_window_attention_packed(qkv, scale, bias16, h, nW, mask,
                                          1024, True)
    out_r = _ref_attn(qkv, scale, bias16, mask, h)
    ref_mag = float(jnp.abs(out_r).max())
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               atol=tol * max(ref_mag, 1.0))

    r = lambda *a: _ref_attn(a[0], a[1], a[2], mask, h).sum()  # noqa: E731
    gr = jax.grad(r, argnums=(0, 1, 2))(qkv, scale, bias16)
    # both backward arms under the interpreter: stored_stats=False is the
    # recompute kernel (_pk_bwd_body, the model default), True the
    # packed-softmax-store pair (_pk_fwd_body_stats/_pk_bwd_body_stats,
    # the op default for direct callers)
    for stored in (False, True):
        f = lambda *a: fused_window_attention_packed(  # noqa: E731
            a[0], a[1], a[2], h, nW, mask, 1024, True,
            stored_stats=stored).sum()
        gf = jax.grad(f, argnums=(0, 1, 2))(qkv, scale, bias16)
        for a, b in zip(gf, gr):
            mag = float(jnp.abs(b.astype(jnp.float32)).max())
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                atol=tol * max(mag, 1.0))


PK_STATS_CASES = [
    # (B_, N, C, heads, nW, hg, masked, out_bf16) — the packed stored-stats
    # pair driven directly: full pack (ng=1), an ng=2 unrolled-group case
    # with non-lane-aligned Cg (the grid path is gated off there, so the
    # stats rule covers it), masked and bf16-out combinations.
    (8, 36, 128, 4, 4, 0, False, False),
    (8, 36, 128, 4, 4, 0, True, True),
    (8, 9, 256, 16, 4, 0, True, False),
    (4, 25, 96, 8, 1, 4, True, False),    # ng=2, Cg=48: unrolled stats loop
]


@pytest.mark.parametrize("B_,N,C,h,nW,hg,masked,out_bf16", PK_STATS_CASES)
def test_packed_stored_stats_interpret_matches_unfused(B_, N, C, h, nW, hg,
                                                       masked, out_bf16):
    """_pk_fwd_stats/_pk_bwd_stats (the packed stored-stats backward) vs
    the unfused oracle's value and grad — including the f32 packed-softmax
    round-trip, the dscale-from-norm-VJP identity and the lane unpack."""
    from fr_tpu.ops import fused_window_attn as fwa

    rng = np.random.default_rng(11)
    qkv = jnp.asarray(rng.standard_normal((B_, N, 3 * C)), jnp.bfloat16)
    scale = jnp.asarray(np.abs(rng.standard_normal(h)) + 1.0, jnp.float32)
    bias16 = jnp.asarray(rng.standard_normal((h, N, N)), jnp.float32)
    mask = (jnp.asarray(np.where(rng.random((nW, N, N)) > 0.8, -100.0, 0.0),
                        jnp.float32) if masked else None)
    g = jnp.asarray(rng.standard_normal((B_, N, C)), jnp.float32)
    out_dt = jnp.bfloat16 if out_bf16 else None

    out, p_st = fwa._pk_fwd_stats(qkv, scale, bias16, h, nW, mask,
                                  1024, out_dt, hg, interpret=True)
    if out_bf16:
        assert out.dtype == jnp.bfloat16
    out_r = _ref_attn(qkv, scale, bias16, mask, h)
    mag = float(jnp.abs(out_r).max())
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(out_r), atol=3e-2 * max(mag, 1.0))

    gc = g.astype(out.dtype)
    dqkv, dscalep, dbiasp = fwa._pk_bwd_stats(qkv, scale, p_st, gc,
                                              h, nW, 1024, hg,
                                              interpret=True)
    hgr = hg or h
    ng = h // hgr
    dscale = jnp.sum(dscalep.reshape(h, N), axis=1)
    dbias = dbiasp.reshape(ng, N, hgr, N).transpose(0, 2, 1, 3).reshape(
        h, N, N)
    rr = lambda *a: (_ref_attn(a[0], a[1], a[2], mask, h)  # noqa: E731
                     * gc.astype(jnp.float32)).sum()
    gr = jax.grad(rr, argnums=(0, 1, 2))(qkv, scale, bias16)
    for a, b in zip((dqkv, dscale, dbias), gr):
        m = float(jnp.abs(b.astype(jnp.float32)).max())
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=3e-2 * max(m, 1.0))


GROUPED_CASES = [
    # (B_, N, C, heads, nW, hg, masked, dtype, tol) — the head-grouped
    # packed kernel (ng = heads/hg channel-sliced group loop): sw4-like
    # winning shape (hg = heads/2 → 392 lanes), plus a masked f32 case and
    # a non-aligned hd=12 case to exercise the fold/unpack on odd widths.
    (4, 49, 512, 16, 1, 8, False, jnp.bfloat16, 3e-2),   # Cg=256: grid path
    (8, 49, 256, 8, 4, 4, True, jnp.float32, 5e-5),      # Cg=128: grid, mask
    (8, 49, 128, 8, 4, 4, True, jnp.float32, 5e-5),      # Cg=64: unrolled
    (8, 36, 96, 4, 4, 2, True, jnp.float32, 5e-5),  # hd=24, Cg=48
]


@pytest.mark.parametrize("B_,N,C,h,nW,hg,masked,dt,tol", GROUPED_CASES)
def test_grouped_interpret_matches_unfused(B_, N, C, h, nW, hg, masked, dt,
                                           tol):
    """head_group < heads runs the channel-sliced group loop (per-group
    packed params, ng-indexed dscale/dbias accumulators, group unpack) —
    real program under the Pallas interpreter vs the unfused oracle."""
    from fr_tpu.ops.fused_window_attn import fused_window_attention_packed

    rng = np.random.default_rng(7)
    qkv = jnp.asarray(rng.standard_normal((B_, N, 3 * C)), dt)
    scale = jnp.asarray(np.abs(rng.standard_normal(h)) + 1.0, jnp.float32)
    bias16 = jnp.asarray(rng.standard_normal((h, N, N)), jnp.float32)
    mask = (jnp.asarray(np.where(rng.random((nW, N, N)) > 0.8, -100.0, 0.0),
                        jnp.float32) if masked else None)

    out_f = fused_window_attention_packed(qkv, scale, bias16, h, nW, mask,
                                          1024, True, None, hg)
    out_r = _ref_attn(qkv, scale, bias16, mask, h)
    ref_mag = float(jnp.abs(out_r).max())
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               atol=tol * max(ref_mag, 1.0))

    f = lambda *a: fused_window_attention_packed(  # noqa: E731
        a[0], a[1], a[2], h, nW, mask, 1024, True, None, hg).sum()
    r = lambda *a: _ref_attn(a[0], a[1], a[2], mask, h).sum()  # noqa: E731
    gf = jax.grad(f, argnums=(0, 1, 2))(qkv, scale, bias16)
    gr = jax.grad(r, argnums=(0, 1, 2))(qkv, scale, bias16)
    for a, b in zip(gf, gr):
        mag = float(jnp.abs(b.astype(jnp.float32)).max())
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=tol * max(mag, 1.0))


def test_pick_head_group_rule():
    """The measured dispatch rule: full pack at the AlterNet shapes
    (heads·N ≤ 288), per-head (0) at every N=49 shape — all packed/grouped
    variants measured ties or losses there (ROUND4_NOTES.md)."""
    from fr_tpu.models.swin_common import pick_head_group

    assert pick_head_group(4, 36) == 4      # s2: 144
    assert pick_head_group(8, 36) == 8      # s3: 288
    assert pick_head_group(16, 9) == 16     # s4: 144
    assert pick_head_group(8, 49) == 0      # sw3: 392 → per-head
    assert pick_head_group(16, 49) == 0     # sw4: 784 → per-head
    assert pick_head_group(32, 49) == 0     # EffiAlter_l s7: 1568


def test_pk_block_pick_grouped_vmem():
    """The grouped estimator must model the UNROLLED group loop: Mosaic
    does not share stack across the ng bodies, so every group's repeat
    buffers AND score tensors accumulate (measured: sw3 hg=2 wb=16 hit a
    16.65 MB stack where the ng=1 model predicted 0.8 MB)."""
    from fr_tpu.ops.fused_window_attn import _pk_pick_block

    # sw4 hg=8 (W=128, N=49, nW=1, C=512, heads=16): ng=2 → wb=2
    assert _pk_pick_block(128, 49, 1, 512, 16, 1024, hg=8) == 2
    # sw3 hg=2 (W=512, N=49, nW=4, C=256, heads=8): ng=4 must come in
    # well under the wb=16 that OOM'd at 16.65 MB
    wb = _pk_pick_block(512, 49, 4, 256, 8, 1024, hg=2)
    assert wb <= 8 and wb % 4 == 0
    # estimate at the picked block stays under the 10 MB budget
    ng, gN, Cg = 4, 2 * 49, 64
    per_win = ng * (gN * Cg * 8 + 7 * 49 * gN * 4)
    assert per_win * wb <= 10 * 1024 * 1024


def test_pk_block_pick_caps_vmem():
    """The packed block picker must keep the dominant per-window buffers
    (≈ hN·C·8 bytes: head-repeated k/v + f32 fold inputs) under 10 MB —
    s4's rows-targeted wb=64 measured a 35.6 MB Mosaic stack OOM."""
    from fr_tpu.ops.fused_window_attn import _pick_block, _pk_pick_block

    # s4 (W=512, N=9, nW=4, C=512, heads=16): rows target alone says 64
    assert _pick_block(512, 9, 4, target_rows=1024) == 64
    wb = _pk_pick_block(512, 9, 4, 512, 16, target_rows=1024)
    assert wb == 16 and wb % 4 == 0
    assert wb * 16 * 9 * 512 * 8 <= 10 * 1024 * 1024
    # s2/s3 stay at the measured-optimal blocks
    assert _pk_pick_block(2048, 36, 16, 128, 4, 1024) == 16
    assert _pk_pick_block(512, 36, 4, 256, 8, 1024) == 16


def test_batched_block_pick_caps_vmem():
    """The batched bodies keep EVERY head's score tensors live at once
    (ADVICE r4 low #3), so _pick_block_batched clamps the window block so
    ~8 live (heads·wb, N, pad128(N)) f32 tensors stay inside the budget
    (default 24 MB; FR_ATTN_BATCHED_VMEM_MB sweeps it)."""
    from fr_tpu.ops.fused_window_attn import (_pick_block,
                                              _pick_block_batched)

    def live_bytes(wb, heads, N):
        pad = -(-N // 128) * 128
        return heads * wb * N * pad * 4 * 8

    # sw3 (W=512, N=49, nW=4, heads=8): unclamped target says 16 windows
    assert _pick_block(512, 49, 4, target_rows=1024) == 16
    wb = _pick_block_batched(512, 49, 4, 8, 1024)
    assert wb % 4 == 0 and 512 % wb == 0
    assert live_bytes(wb, 8, 49) <= 24 * 1024 * 1024
    # sw4 (W=128, N=49, nW=1, heads=16)
    wb4 = _pick_block_batched(128, 49, 1, 16, 1024)
    assert 128 % wb4 == 0
    assert live_bytes(wb4, 16, 49) <= 24 * 1024 * 1024
    # tiny shapes are not clamped below the plain pick
    assert (_pick_block_batched(64, 9, 1, 2, 1024)
            == _pick_block(64, 9, 1, target_rows=1024))


def test_pfc_head_floor():
    """pfc_head_floor_seconds prices the gather + sampled-row update HBM
    bytes and the logits GEMM MACs (ROUND5_NOTES webface audit)."""
    from fr_tpu.utils.flops import pfc_head_floor_seconds

    s_sgd = pfc_head_floor_seconds(256, 205952, 512, "SGD")
    s_adamw = pfc_head_floor_seconds(256, 205952, 512, "AdamW")
    assert 0.003 < s_sgd < 0.006          # ~4.4 ms at WebFace42M scale
    assert s_adamw > s_sgd                # two extra slot arrays
    assert pfc_head_floor_seconds(256, 26007, 512, "SGD") < 1e-3


def test_pk_constants_structure():
    from fr_tpu.ops.fused_window_attn import _pk_constants

    heads, N, C = 4, 9, 64
    hm, blockC, segsum, segexp, segC = _pk_constants(heads, N, C)
    hd = C // heads
    assert hm.shape == (heads * N, C) and hm.sum() == heads * N * hd
    # lane hj = h*N + j sees exactly head h's channels
    assert hm[2 * N + 1, 2 * hd] == 1.0 and hm[2 * N + 1, hd] == 0.0
    assert (blockC @ blockC[:, 0] == hd * blockC[:, 0]).all()
    assert (segsum.sum(0) == N).all() and (segexp.sum(1) == N).all()
    assert (segC.sum(0) == 1).all()  # channel partition


@pytest.mark.parametrize("shift", [0, 3])
def test_spatial_matches_windowed(shift):
    """fused_window_attention_spatial == window_partition → windows math →
    window_reverse, values and grads."""
    from fr_tpu.models.swin_common import window_partition, window_reverse
    from fr_tpu.ops.fused_window_attn_variants import fused_window_attention_spatial

    B, H, W, C, h, ws = 4, 12, 12, 64, 4, 6
    N = ws * ws
    nW = (H // ws) * (W // ws)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((B, H, W, 3 * C)), jnp.float32)
    scale = jnp.asarray(np.abs(rng.standard_normal(h)) + 1.0, jnp.float32)
    bias16 = jnp.asarray(rng.standard_normal((h, N, N)), jnp.float32)
    mask = (jnp.asarray(shifted_window_mask(H, W, ws, shift))
            if shift else None)

    def spatial(x_, s_, b_):
        return fused_window_attention_spatial(x_, s_, b_, h, ws, mask)

    def windowed(x_, s_, b_):
        win = window_partition(x_, ws)
        out = _ref_attn(win, s_, b_, mask, h)
        return window_reverse(out, ws, H, W)

    o1 = spatial(x, scale, bias16)
    o2 = windowed(x, scale, bias16)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-4)

    g1 = jax.grad(lambda *a: (spatial(*a) ** 2).sum(), argnums=(0, 1, 2))(
        x, scale, bias16)
    g2 = jax.grad(lambda *a: (windowed(*a) ** 2).sum(), argnums=(0, 1, 2))(
        x, scale, bias16)
    for a, b in zip(g1, g2):
        mag = max(float(jnp.abs(b).max()), 1.0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4 * mag)


@pytest.mark.parametrize("shift", [0, 3])
def test_module_spatial_vs_unfused(shift):
    """Full WindowAttention module, rank-4 spatial fused input vs the
    rank-3 unfused path (partition/reverse outside)."""
    from fr_tpu.models.swin_common import window_partition, window_reverse

    H = W = 12
    ws = 6
    C, heads = 64, 4
    B = 8
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    mask = shifted_window_mask(H, W, ws, shift) if shift else None

    mod_f = WindowAttention(C, (ws, ws), heads, dtype=jnp.float32,
                            fused=True)
    v = mod_f.init(jax.random.key(0), x, mask)
    out_f = mod_f.apply(v, x, mask)

    mod_u = WindowAttention(C, (ws, ws), heads, dtype=jnp.float32,
                            fused=False)
    out_u = window_reverse(
        mod_u.apply(v, window_partition(x, ws), mask), ws, H, W)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u),
                               atol=2e-4)

    gf = jax.grad(lambda p: (mod_f.apply({"params": p}, x, mask) ** 2).sum())(
        v["params"])
    gu = jax.grad(lambda p: (window_reverse(
        mod_u.apply({"params": p}, window_partition(x, ws), mask),
        ws, H, W) ** 2).sum())(v["params"])
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gu)):
        mag = max(float(jnp.abs(b).max()), 1.0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3 * mag)


@pytest.mark.parametrize("shift", [0, 3])
def test_module_fused_vs_unfused(shift):
    """Full WindowAttention module: fused=True == fused=False (values and
    grads) on a realistic windowed input with the real SW-MSA mask."""
    H = W = 12
    ws = 6
    N = ws * ws
    C, heads = 64, 4
    B_ = 8 * (H // ws) * (W // ws)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((B_, N, C)), jnp.float32)
    mask = shifted_window_mask(H, W, ws, shift) if shift else None

    outs, grads = [], []
    for fused in (True, False):
        mod = WindowAttention(C, (ws, ws), heads, dtype=jnp.float32,
                              fused=fused)
        variables = mod.init(jax.random.key(0), x, mask)

        def loss(p):
            return (mod.apply({"params": p}, x, mask) ** 2).sum()

        outs.append(mod.apply(variables, x, mask))
        grads.append(jax.grad(loss)(variables["params"]))

    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(outs[1]),
                               atol=2e-4)
    flat0 = jax.tree.leaves(grads[0])
    flat1 = jax.tree.leaves(grads[1])
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3 * max(float(jnp.abs(b).max()),
                                                   1.0))


XW_CASES = [
    # (B_, N, C, heads, nW, hg, masked, dtype, tol) — entry-fused kernel
    # (qkv GEMM inside): the three AlterNet-like full-pack shapes plus a
    # grouped (ng>1) case exercising the group-sliced dqkv reassembly.
    (32, 36, 128, 4, 16, 4, True, jnp.float32, 5e-5),
    (16, 9, 512, 16, 4, 16, False, jnp.bfloat16, 4e-2),
    (8, 36, 96, 4, 4, 2, True, jnp.float32, 5e-5),   # hd=24, grouped
]


def _ref_chain(x, w, b, scale, bias16, mask, h):
    """qkv projection exactly as the kernel does it (f32 MXU accumulation,
    f32 bias add, cast to compute) feeding the unfused oracle."""
    dt = x.dtype
    qkv32 = jax.lax.dot_general(x, w.astype(dt), (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    qkv = (qkv32 + b.astype(jnp.float32)).astype(dt)
    return _ref_attn(qkv, scale, bias16, mask, h)


@pytest.mark.parametrize("B_,N,C,h,nW,hg,masked,dt,tol", XW_CASES)
def test_entry_fused_interpret_matches_chain(B_, N, C, h, nW, hg, masked,
                                             dt, tol):
    """The entry-fused packed kernel's REAL program (in-kernel qkv GEMM,
    dx/dW/dbias chain, grid-step accumulation) under the Pallas
    interpreter vs the qkv-projection + unfused-attention chain."""
    from fr_tpu.ops.fused_window_attn_variants import fused_window_attention_packed_qkv

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((B_, N, C)), dt)
    w = jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(3 * C) * 0.1, jnp.float32)
    scale = jnp.asarray(np.abs(rng.standard_normal(h)) + 1.0, jnp.float32)
    bias16 = jnp.asarray(rng.standard_normal((h, N, N)), jnp.float32)
    mask = (jnp.asarray(np.where(rng.random((nW, N, N)) > 0.8, -100.0, 0.0),
                        jnp.float32) if masked else None)

    out_f = fused_window_attention_packed_qkv(
        x, w, b, scale, bias16, h, nW, mask, 1024, True, None, hg)
    out_r = _ref_chain(x, w, b, scale, bias16, mask, h)
    mag = float(jnp.abs(out_r).max())
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               atol=tol * max(mag, 1.0))

    f = lambda *a: fused_window_attention_packed_qkv(  # noqa: E731
        *a, h, nW, mask, 1024, True, None, hg).sum()
    r = lambda *a: _ref_chain(*a, mask, h).sum()  # noqa: E731
    gf = jax.grad(f, argnums=(0, 1, 2, 3, 4))(x, w, b, scale, bias16)
    gr = jax.grad(r, argnums=(0, 1, 2, 3, 4))(x, w, b, scale, bias16)
    for name, a, bb in zip(("dx", "dw", "db", "dscale", "dbias16"), gf, gr):
        m = float(jnp.abs(bb.astype(jnp.float32)).max())
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(bb, np.float32),
            atol=tol * max(m, 1.0), err_msg=name)


def test_entry_fused_out_dtype_and_fallback():
    """out_dtype honoured by the interpret program AND the off-TPU jnp
    fallback (interpret=False on CPU) returns the same values."""
    from fr_tpu.ops.fused_window_attn_variants import fused_window_attention_packed_qkv

    B_, N, C, h, nW = 16, 36, 128, 4, 4
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((B_, N, C)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(3 * C) * 0.1, jnp.float32)
    scale = jnp.asarray(np.abs(rng.standard_normal(h)) + 1.0, jnp.float32)
    bias16 = jnp.asarray(rng.standard_normal((h, N, N)), jnp.float32)

    out_k = fused_window_attention_packed_qkv(
        x, w, b, scale, bias16, h, nW, None, 1024, True, jnp.bfloat16)
    assert out_k.dtype == jnp.bfloat16
    out_t = fused_window_attention_packed_qkv(
        x, w, b, scale, bias16, h, nW, None, 1024, False, jnp.bfloat16)
    assert out_t.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out_k, np.float32),
                               np.asarray(out_t, np.float32), atol=3e-2)


def test_pk_block_pick_qkv_fused_term():
    """The entry-fused picker must model the in-register qkv/dqkv buffers
    (N·3C·8 bytes/window on top of the repeat buffers)."""
    from fr_tpu.ops.fused_window_attn import _pk_pick_block

    for (Wn, N, nW, C, h) in [(2048, 36, 16, 128, 4),
                              (512, 36, 4, 256, 8),
                              (512, 9, 4, 512, 16)]:
        wb_f = _pk_pick_block(Wn, N, nW, C, h, 1024, hg=h, qkv_fused=True)
        wb_0 = _pk_pick_block(Wn, N, nW, C, h, 1024, hg=h)
        assert wb_f <= wb_0 and wb_f >= nW and Wn % wb_f == 0
        per_win = h * N * C * 8 + N * 3 * C * 8
        assert per_win * wb_f <= 10 * 1024 * 1024 or wb_f == nW


def test_entry_fused_allkernel_bwd_interpret(monkeypatch):
    """The all-in-kernel backward (dx/dW/dbias inside the kernel, grid-step
    accumulation) is kept behind _PKX_HYBRID_BWD=False as a measured
    negative — keep its real program covered under the interpreter."""
    import fr_tpu.ops.fused_window_attn_variants as fwa

    monkeypatch.setattr(fwa, "_PKX_HYBRID_BWD", False)
    B_, N, C, h, nW = 32, 36, 128, 4, 16
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((B_, N, C)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(3 * C) * 0.1, jnp.float32)
    scale = jnp.asarray(np.abs(rng.standard_normal(h)) + 1.0, jnp.float32)
    bias16 = jnp.asarray(rng.standard_normal((h, N, N)), jnp.float32)
    mask = jnp.asarray(np.where(rng.random((nW, N, N)) > 0.8, -100.0, 0.0),
                       jnp.float32)

    f = lambda *a: fwa.fused_window_attention_packed_qkv(  # noqa: E731
        *a, h, nW, mask, 1024, True).sum()
    r = lambda *a: _ref_chain(*a, mask, h).sum()  # noqa: E731
    gf = jax.grad(f, argnums=(0, 1, 2, 3, 4))(x, w, b, scale, bias16)
    gr = jax.grad(r, argnums=(0, 1, 2, 3, 4))(x, w, b, scale, bias16)
    for name, a, bb in zip(("dx", "dw", "db", "dscale", "dbias16"), gf, gr):
        m = float(jnp.abs(bb).max())
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(bb, np.float32),
            atol=5e-5 * max(m, 1.0), err_msg=name)


def test_inmodel_stats_and_remat_defaults(monkeypatch):
    """The MODEL defaults to the recompute backward (stored-stats nets
    zero-to-negative under nn.remat — swin_common.attention_stats_inmodel
    docstring); FR_ATTN_STORED_STATS is the ONE in-model A/B switch: =1
    opts into stats and turns remat off so the stats forward runs once
    (the former independent FR_ATTN_REMAT knob is retired)."""
    from fr_tpu.models.swin_common import (attention_remat_default,
                                           attention_stats_inmodel)

    monkeypatch.delenv("FR_ATTN_STORED_STATS", raising=False)
    assert not attention_stats_inmodel()
    assert attention_remat_default()

    monkeypatch.setenv("FR_ATTN_STORED_STATS", "1")
    assert attention_stats_inmodel()
    assert not attention_remat_default()

    monkeypatch.setenv("FR_ATTN_STORED_STATS", "0")
    assert not attention_stats_inmodel()
    assert attention_remat_default()

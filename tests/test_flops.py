"""Roofline model tests: analytic FLOP counting + the occupancy-aware
achievable-MXU bound used by bench.py's vs_baseline.

The occupancy model is calibrated against measured XPlane profiles of the
R100 step on v5e (ROUND2_NOTES.md): convs with C >= 128 run at 93-99% of
peak, C_in=64 convs at the min(C_in,128)/128 = 50% hardware ceiling, and
wgrad at min(C_out,128)/128. These tests pin the arithmetic, not the
hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np

from fr_tpu.utils.flops import achievable_mxu_seconds, count_flops

PEAK = 100e12  # arbitrary peak for exact ratios


def _conv(x, w, stride=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_count_flops_conv_exact():
    x = jnp.zeros((2, 8, 8, 32), jnp.bfloat16)
    w = jnp.zeros((3, 3, 32, 64), jnp.bfloat16)
    f = count_flops(_conv, x, w)
    # 2 * out_elems * k_spatial * cin
    assert f == 2.0 * (2 * 8 * 8 * 64) * 9 * 32


def test_count_flops_dot_exact():
    a = jnp.zeros((4, 256), jnp.bfloat16)
    b = jnp.zeros((256, 128), jnp.bfloat16)
    f = count_flops(lambda a_, b_: a_ @ b_, a, b)
    assert f == 2.0 * 4 * 256 * 128


def test_achievable_full_occupancy_conv():
    # C_in = C_out = 128: fwd + dgrad + wgrad all at full occupancy ->
    # t = 3F / peak
    x = jnp.zeros((2, 8, 8, 128), jnp.bfloat16)
    w = jnp.zeros((3, 3, 128, 128), jnp.bfloat16)
    f = count_flops(_conv, x, w)
    t = achievable_mxu_seconds(_conv, PEAK, x, w)
    np.testing.assert_allclose(t, 3.0 * f / PEAK, rtol=1e-12)


def test_achievable_half_occupancy_conv():
    # C_in = C_out = 64: every pass at 50% occupancy -> t = 2 * 3F / peak
    x = jnp.zeros((2, 8, 8, 64), jnp.bfloat16)
    w = jnp.zeros((3, 3, 64, 64), jnp.bfloat16)
    f = count_flops(_conv, x, w)
    t = achievable_mxu_seconds(_conv, PEAK, x, w)
    np.testing.assert_allclose(t, 2.0 * 3.0 * f / PEAK, rtol=1e-12)


def test_achievable_stem_conv_skips_dgrad():
    # C_in = 3 (network input): K_eff = 27, no dgrad term
    x = jnp.zeros((2, 8, 8, 3), jnp.bfloat16)
    w = jnp.zeros((3, 3, 3, 64), jnp.bfloat16)
    f = count_flops(_conv, x, w)
    t = achievable_mxu_seconds(_conv, PEAK, x, w)
    expect = f / (27 / 128) + f / (64 / 128)  # fwd + wgrad only
    np.testing.assert_allclose(t, expect / PEAK, rtol=1e-12)


def test_achievable_f32_highest_penalty():
    x32 = jnp.zeros((2, 8, 8, 128), jnp.float32)
    w32 = jnp.zeros((3, 3, 128, 128), jnp.float32)
    conv32 = lambda a, b: jax.lax.conv_general_dilated(  # noqa: E731
        a, b, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    t32 = achievable_mxu_seconds(conv32, PEAK, x32, w32)
    x16, w16 = x32.astype(jnp.bfloat16), w32.astype(jnp.bfloat16)
    t16 = achievable_mxu_seconds(_conv, PEAK, x16, w16)
    np.testing.assert_allclose(t32, 6.0 * t16, rtol=1e-12)


def test_achievable_r100_between_naive_and_measured():
    """The R100 b=256 bound must sit between the naive 3x-fwd roofline
    (89.2 ms @197T) and the measured conv+dot device time (~99.5 ms,
    ROUND2_NOTES.md) — i.e. tighter than naive, never claiming more time
    than the compiled program actually spends on the MXU."""
    from fr_tpu.configs import load_config
    from fr_tpu.models import build_encoder

    conf = load_config("ms1m_arcface_122", network="ResNet100")
    conf.mixed_precision = True
    enc = build_encoder(conf)
    x = jnp.zeros((256, 112, 112, 3), jnp.bfloat16)
    v = jax.eval_shape(lambda k: enc.init(k, x, train=False),
                       jax.random.key(0))
    p = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), v["params"])
    bs = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                      v.get("batch_stats", {}))
    fn = lambda p_, b_, im: enc.apply(  # noqa: E731
        {"params": p_, "batch_stats": b_}, im, train=False)
    peak = 197e12
    naive_s = 3.0 * count_flops(fn, p, bs, x) / peak
    t = achievable_mxu_seconds(fn, peak, p, bs, x)
    assert naive_s < t < 99.5e-3, (naive_s, t)

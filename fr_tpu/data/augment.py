"""Fused on-device train-time augmentation.

TPU-native replacement for the reference's host-side albumentations pipeline
(reference utils/data_partial.py:134-164):

    RandomGamma(80-120, p=.5) → MotionBlur(p=.5) →
    ISONoise(color_shift 0-.05, intensity 0-.3, p=.5) → Resize(img) →
    HorizontalFlip(p=.5) → Normalize(mean .5, std .5) →
    CoarseDropout(1 hole ≤20×20, p=.5)

The host delivers fixed-size uint8 NHWC batches (decode+resize stay on CPU —
the only dynamic-shape work); everything else runs as ONE jitted program on
device, per-sample randomised, fused by XLA into a handful of elementwise
kernels feeding the encoder directly (no H2D of float32 images: 4× less
PCIe/ICI traffic than shipping normalised floats).

Semantic parity notes (albumentations internals reproduced, not bit-exact —
albumentations isn't RNG-compatible with JAX):
- RandomGamma: img^(gamma/100) in [0,1] domain, gamma ~ U(80, 120).
- MotionBlur: depthwise conv with a random-angle line kernel, ksize ∈ {3,5,7}.
- ISONoise: HLS decomposition; hue jitter ~ N(0, color_shift·360·intensity),
  luminance Poisson noise scaled by per-image std — matching
  albumentations.functional.iso_noise.
- CoarseDropout: one hole of exactly max_h×max_w, zero fill
  (fill happens after Normalize in the reference order, so the hole is 0 in
  normalised space).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

BLUR_SIZES = (3, 5, 7)


def _rgb_to_hls(rgb):
    """Vectorised RGB→HLS (cv2 convention: H ∈ [0,360), L,S ∈ [0,1])."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    l = (maxc + minc) / 2.0
    c = maxc - minc
    safe_c = jnp.where(c > 0, c, 1.0)
    rc = (maxc - r) / safe_c
    gc = (maxc - g) / safe_c
    bc = (maxc - b) / safe_c
    h = jnp.where(r == maxc, bc - gc,
                  jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(c > 0, (h / 6.0) % 1.0, 0.0) * 360.0
    denom = 1.0 - jnp.abs(2.0 * l - 1.0)
    s = jnp.where(c > 0, c / jnp.where(denom > 0, denom, 1.0), 0.0)
    return h, l, s


def _hls_to_rgb(h, l, s):
    h = (h % 360.0) / 360.0
    c = (1.0 - jnp.abs(2.0 * l - 1.0)) * s
    hp = h * 6.0
    x = c * (1.0 - jnp.abs(hp % 2.0 - 1.0))
    z = jnp.zeros_like(c)
    conds = [(hp < 1), (hp < 2), (hp < 3), (hp < 4), (hp < 5)]
    r1 = jnp.select(conds, [c, x, z, z, x], c)
    g1 = jnp.select(conds, [x, c, c, x, z], z)
    b1 = jnp.select(conds, [z, z, x, c, c], x)
    m = l - c / 2.0
    return jnp.stack([r1 + m, g1 + m, b1 + m], axis=-1)


def _motion_blur_batch(x, key):
    """Batched random line blur: ONE depthwise conv for the whole batch with
    per-sample 7×7 line kernels (random angle; effective ksize ∈ {3,5,7} by
    masking the kernel to the central k×k window). Replaces a per-sample
    lax.switch over conv branches, which serialises on TPU.

    x: (B, H, W, 3) float."""
    B, H, W, C = x.shape
    kmax = BLUR_SIZES[-1]
    k_angle, k_size = jax.random.split(key)
    angle = jax.random.uniform(k_angle, (B, 1, 1), minval=0.0, maxval=jnp.pi)
    ks = jnp.asarray(BLUR_SIZES)[jax.random.randint(k_size, (B,), 0,
                                                    len(BLUR_SIZES))]
    r = (kmax - 1) / 2.0
    yy = jnp.arange(kmax, dtype=jnp.float32)[None, :, None] - r
    xx = jnp.arange(kmax, dtype=jnp.float32)[None, None, :] - r
    d = jnp.abs(-jnp.sin(angle) * xx + jnp.cos(angle) * yy)  # (B, 7, 7)
    half = ((ks - 1) // 2).astype(jnp.float32)[:, None, None]
    inside = (jnp.abs(yy) <= half) & (jnp.abs(xx) <= half)
    kern = ((d <= 0.5) & inside).astype(jnp.float32)
    kern = kern / jnp.maximum(kern.sum(axis=(1, 2), keepdims=True), 1.0)

    # (B, H, W, C) → (1, H, W, B·C); per-sample-per-channel depthwise filters
    xt = x.transpose(1, 2, 0, 3).reshape(1, H, W, B * C)
    filt = jnp.repeat(kern[:, :, :, None], C, axis=3)      # (B, 7, 7, C)
    filt = filt.transpose(1, 2, 0, 3).reshape(kmax, kmax, 1, B * C)
    out = jax.lax.conv_general_dilated(
        xt, filt, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=B * C)
    return out.reshape(H, W, B, C).transpose(2, 0, 1, 3)


def _iso_noise_batch(img01, key, color_shift, intensity):
    """albumentations.functional.iso_noise, batched (B, H, W, 3).

    The luminance Poisson(λ) draw is approximated by max(N(λ, λ), 0) — true
    Poisson sampling uses data-dependent rejection loops that serialise on
    TPU; λ = per-image-std·intensity·255 is large enough for the Gaussian
    moment match (documented divergence from albumentations)."""
    k_pois, k_col = jax.random.split(key)
    h, l, s = _rgb_to_hls(img01)
    stddev = jnp.std(l, axis=(1, 2), keepdims=True)
    lam = jnp.maximum(stddev * intensity[:, None, None] * 255.0, 1e-6)
    lum_noise = jnp.maximum(
        lam + jnp.sqrt(lam) * jax.random.normal(k_pois, l.shape), 0.0)
    col_noise = jax.random.normal(k_col, h.shape) * (
        (color_shift * 360.0 * intensity)[:, None, None])
    h = h + col_noise
    l = l + (lum_noise / 255.0) * (1.0 - l)
    out = _hls_to_rgb(h, jnp.clip(l, 0.0, 1.0), s)
    return jnp.clip(out, 0.0, 1.0)


def augment_impl(key, images_u8, cfg) -> jnp.ndarray:
    """uint8 (B,H,W,3) → normalised float (B,H,W,3).

    cfg is a hashable tuple:
      (gamma_lo, gamma_hi, gamma_p, blur_p, c_shift_lo, c_shift_hi,
       int_lo, int_hi, iso_p, flip_p, erase_p, erase_max_h, erase_max_w)
    """
    (g_lo, g_hi, g_p, blur_p, cs_lo, cs_hi, in_lo, in_hi, iso_p,
     flip_p, erase_p, emax_h, emax_w) = cfg
    B, H, W, _ = images_u8.shape
    keys = jax.random.split(key, 12)
    x = images_u8.astype(jnp.float32) / 255.0

    # RandomGamma (reference utils/data_partial.py:139)
    gamma = jax.random.uniform(keys[0], (B, 1, 1, 1), minval=g_lo, maxval=g_hi) / 100.0
    do_g = jax.random.uniform(keys[1], (B, 1, 1, 1)) < g_p
    x = jnp.where(do_g, jnp.power(jnp.maximum(x, 1e-8), gamma), x)

    # MotionBlur (reference :143)
    do_b = jax.random.uniform(keys[2], (B, 1, 1, 1)) < blur_p
    blurred = _motion_blur_batch(x, keys[3])
    x = jnp.where(do_b, blurred, x)

    # ISONoise (reference :144) — independent keys for the parameter draws,
    # the noise bits, and the apply gate
    cs = jax.random.uniform(keys[4], (B,), minval=cs_lo, maxval=cs_hi)
    it = jax.random.uniform(keys[5], (B,), minval=in_lo, maxval=in_hi)
    noised = _iso_noise_batch(x, keys[8], cs, it)
    do_n = jax.random.uniform(keys[9], (B, 1, 1, 1)) < iso_p
    x = jnp.where(do_n, noised, x)

    # HorizontalFlip (reference :150)
    do_f = jax.random.uniform(keys[6], (B, 1, 1, 1)) < flip_p
    x = jnp.where(do_f, x[:, :, ::-1, :], x)

    # Normalize mean .5 std .5 (reference :151-156)
    x = (x - 0.5) / 0.5

    # CoarseDropout: 1 hole of exactly emax_h×emax_w, fill 0 in normalised
    # space (reference :157-162; albumentations defaults min_height to
    # max_height, so the reference hole is always exactly 20×20)
    ke = jax.random.split(keys[7], 5)
    hh = jnp.full((B, 1, 1), emax_h, jnp.int32)
    ww = jnp.full((B, 1, 1), emax_w, jnp.int32)
    y0 = jax.random.randint(ke[2], (B, 1, 1), 0, jnp.maximum(H - emax_h, 1))
    x0 = jax.random.randint(ke[3], (B, 1, 1), 0, jnp.maximum(W - emax_w, 1))
    do_e = jax.random.uniform(ke[4], (B, 1, 1)) < erase_p
    yy = jax.lax.broadcasted_iota(jnp.int32, (B, H, W), 1)
    xx = jax.lax.broadcasted_iota(jnp.int32, (B, H, W), 2)
    hole = ((yy >= y0) & (yy < y0 + hh) & (xx >= x0) & (xx < x0 + ww) & do_e)
    x = jnp.where(hole[..., None], 0.0, x)
    return x


augment_batch = partial(jax.jit, static_argnames=("cfg",))(augment_impl)


def augment_cfg_from_conf(conf) -> Tuple:
    """Build the static cfg tuple from conf.img_augmentation
    (reference configs/ms1m_arcface_122.py:113-128)."""
    a = conf.img_augmentation
    return (float(a.gamma_s[0]), float(a.gamma_s[1]), float(a.gamma_p),
            float(a.blur_p),
            float(a.c_shift[0]), float(a.c_shift[1]),
            float(a.intensity[0]), float(a.intensity[1]), float(a.iso_p),
            0.5,  # HorizontalFlip p (reference utils/data_partial.py:150)
            float(a.erase_p), int(a.erase_max_h), int(a.erase_max_w))


def normalize_only(images_u8) -> jnp.ndarray:
    """Eval-time transform: Normalize(mean .5, std .5) only
    (reference utils/data_partial.py:45-53,88)."""
    return (images_u8.astype(jnp.float32) / 255.0 - 0.5) / 0.5

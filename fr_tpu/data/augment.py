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
- CoarseDropout: one hole with size ~ U(1..max_h)×U(1..max_w), zero fill
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


def _line_kernel(angle, ksize: int):
    """Normalised line kernel through the center at `angle` (MotionBlur)."""
    r = (ksize - 1) / 2.0
    ys = jnp.linspace(-r, r, ksize)
    xs = jnp.linspace(-r, r, ksize)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    # distance from pixel center to the line through origin at `angle`
    d = jnp.abs(-jnp.sin(angle) * xx + jnp.cos(angle) * yy)
    k = (d <= 0.5).astype(jnp.float32)
    return k / jnp.maximum(k.sum(), 1.0)


def _motion_blur_one(img, key):
    """Per-image random line blur; ksize randomly 3/5/7 via lax.switch."""
    k_angle, k_size = jax.random.split(key)
    angle = jax.random.uniform(k_angle, (), minval=0.0, maxval=jnp.pi)
    branch = jax.random.randint(k_size, (), 0, len(BLUR_SIZES))

    def blur(ksize: int):
        def f(x):
            kern = _line_kernel(angle, ksize)
            kern = jnp.broadcast_to(kern[:, :, None, None],
                                    (ksize, ksize, 1, 3))
            return jax.lax.conv_general_dilated(
                x[None], kern, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=3)[0]
        return f

    return jax.lax.switch(branch, [blur(k) for k in BLUR_SIZES], img)


def _iso_noise_one(img01, key, color_shift, intensity):
    """albumentations.functional.iso_noise on one [0,1] float image."""
    k_pois, k_col = jax.random.split(key)
    h, l, s = _rgb_to_hls(img01)
    stddev = jnp.std(l)
    lam = jnp.maximum(stddev * intensity * 255.0, 1e-6)
    lum_noise = jax.random.poisson(k_pois, lam, l.shape).astype(jnp.float32)
    col_noise = jax.random.normal(k_col, h.shape) * (color_shift * 360.0 * intensity)
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
    keys = jax.random.split(key, 8)
    x = images_u8.astype(jnp.float32) / 255.0

    # RandomGamma (reference utils/data_partial.py:139)
    gamma = jax.random.uniform(keys[0], (B, 1, 1, 1), minval=g_lo, maxval=g_hi) / 100.0
    do_g = jax.random.uniform(keys[1], (B, 1, 1, 1)) < g_p
    x = jnp.where(do_g, jnp.power(jnp.maximum(x, 1e-8), gamma), x)

    # MotionBlur (reference :143)
    do_b = jax.random.uniform(keys[2], (B, 1, 1, 1)) < blur_p
    blurred = jax.vmap(_motion_blur_one)(x, jax.random.split(keys[3], B))
    x = jnp.where(do_b, blurred, x)

    # ISONoise (reference :144)
    k_iso = jax.random.split(keys[4], B)
    cs = jax.random.uniform(keys[4], (B,), minval=cs_lo, maxval=cs_hi)
    it = jax.random.uniform(keys[5], (B,), minval=in_lo, maxval=in_hi)
    noised = jax.vmap(_iso_noise_one)(x, k_iso, cs, it)
    do_n = jax.random.uniform(keys[5], (B, 1, 1, 1)) < iso_p
    x = jnp.where(do_n, noised, x)

    # HorizontalFlip (reference :150)
    do_f = jax.random.uniform(keys[6], (B, 1, 1, 1)) < flip_p
    x = jnp.where(do_f, x[:, :, ::-1, :], x)

    # Normalize mean .5 std .5 (reference :151-156)
    x = (x - 0.5) / 0.5

    # CoarseDropout: 1 hole ≤ emax_h×emax_w, fill 0 in normalised space
    # (reference :157-162)
    ke = jax.random.split(keys[7], 5)
    hh = jax.random.randint(ke[0], (B, 1, 1), 1, emax_h + 1)
    ww = jax.random.randint(ke[1], (B, 1, 1), 1, emax_w + 1)
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

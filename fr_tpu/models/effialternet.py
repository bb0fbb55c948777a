"""EffiAlterNet: EfficientNetV2 trunk × SwinV2+FAN transformer blocks.

Re-design of reference nets/EffiAlterNet_SwinV2_FAN.py:

- MBConv / fused-MBConv with SE and SiLU (reference :539-587);
- stage config tuples [t, c, n, s, SE, n_transformer, heads]
  (reference :712-779), channels rounded by _make_divisible;
- the SwinV2 transformer block here actively includes the FAN
  ChannelProcessing channel-attention branch as a second residual
  (reference :411-415, 458-460) — the one live file where it executes;
- transformer slots placed by the same alt_seq scheme; the reference's
  resolution bookkeeping halves after *every* stage regardless of stride
  (reference :656-658) and gates whether the SW-MSA partner block is added
  (res > window) — reproduced verbatim, including its divergence from the
  actual tensor resolution, because it determines the architecture;
- head: AdaptiveAvgPool(7,7) → Dense(c·49 → emd) → BN1d (reference :629-631);
- init: trunc_normal(std .02) for conv/linear (reference :577-585) —
  torch's trunc_normal_ bounds (±2 absolute) are effectively untruncated at
  σ=.02; jax truncates at ±2σ (negligible).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from fr_tpu.models.common import BatchNorm, matmul_precision
from fr_tpu.models.swin_common import (
    DropPath,
    make_window_attention,
    use_spatial_attention,
    adaptive_avg_pool,
    shifted_window_mask,
    window_partition,
    window_reverse,
)

trunc02 = jax.nn.initializers.truncated_normal(stddev=0.02)


def _make_divisible(v, divisor=8, min_value=None):
    """(reference nets/EffiAlterNet_SwinV2_FAN.py:475-492)."""
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class EConv(nn.Module):
    """Conv with trunc-normal(.02) init (EffiAlterNet convention)."""
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) // 2
        return nn.Conv(self.features, (self.kernel, self.kernel),
                       (self.stride, self.stride),
                       padding=[(pad, pad), (pad, pad)],
                       feature_group_count=self.groups,
                       use_bias=self.use_bias, kernel_init=trunc02,
                       dtype=self.dtype, param_dtype=jnp.float32,
                       precision=matmul_precision(self.dtype))(x)


class _DWKernel(nn.Module):
    """Bare depthwise-conv kernel param, named to match nn.Conv's tree
    (EConv → Conv_0 → kernel, shape (kh, kw, 1, C)) so checkpoints are
    interchangeable with the lax.conv path."""
    channels: int
    kernel: int = 3

    @nn.compact
    def __call__(self):
        return self.param("kernel", trunc02,
                          (self.kernel, self.kernel, 1, self.channels),
                          jnp.float32)


class DepthwiseTaps(nn.Module):
    """Depthwise 3×3 conv as 9 explicit shifted multiply-adds.

    Identical math to lax.conv_general_dilated with feature_group_count=C
    (same params, same padding (1,1), same stride; bit-exact parity test in
    tests/test_backbones.py), written so XLA COULD fuse the surrounding
    elementwise work (BN-apply+SiLU before, BN statistics after) into one
    loop fusion over the MBConv hidden map.

    MEASURED NEGATIVE (kept as the documented experiment, default OFF):
    EffiAlter_m b=128 on v5e trains at 116.6 ms/step with taps vs 78.4 with
    the native depthwise conv — XLA:TPU materialises the 9 strided slices
    instead of folding them into one fusion, multiplying hidden-map traffic
    ~9× and dwarfing the BN-pass savings the rewrite targeted (same failure
    mode as the round-2 maxpool-backward reformulation, ROUND2_NOTES.md #3).
    Enable with conf.dw_taps=true only to reproduce the measurement."""
    channels: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = _DWKernel(self.channels, name="Conv_0")().astype(self.dtype)
        B, H, W, C = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        s = self.stride
        # output spatial = floor((H-3+2)/s)+1, torch/lax 'same-ish' padding 1
        oh = (H - 1) // s + 1
        ow = (W - 1) // s + 1
        acc = None
        for a in range(3):
            for b in range(3):
                sl = jax.lax.slice(
                    xp, (0, a, b, 0),
                    (B, a + (oh - 1) * s + 1, b + (ow - 1) * s + 1, C),
                    (1, s, s, 1))
                term = sl * k[a, b, 0][None, None, None, :]
                acc = term if acc is None else acc + term
        return acc


class SELayer(nn.Module):
    """Squeeze-excitation (reference :505-520); fc widths follow the
    reference's (inp, hidden) argument convention."""
    inp: int
    oup: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = x.astype(jnp.float32).mean(axis=(1, 2))
        mid = _make_divisible(self.inp // 4, 8)
        y = nn.Dense(mid, kernel_init=trunc02, param_dtype=jnp.float32)(y)
        y = nn.silu(y)
        y = nn.Dense(self.oup, kernel_init=trunc02, param_dtype=jnp.float32)(y)
        y = jax.nn.sigmoid(y)
        return x * y[:, None, None, :].astype(x.dtype)


class MBConv(nn.Module):
    """(reference :539-587): SE variant = pw-expand → dw3x3 → SE → pw-linear;
    no-SE variant = fused 3x3 expand → pw-linear. SiLU activations,
    identity residual iff stride 1 and inp == oup."""
    inp: int
    oup: int
    stride: int
    expand_ratio: int
    use_se: bool
    dtype: Any = jnp.float32
    dw_taps: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        hidden = round(self.inp * self.expand_ratio)
        identity = self.stride == 1 and self.inp == self.oup
        h = x
        if self.use_se:
            # explicit EConv_{0,1,2} names: the dw_taps variant swaps in
            # DepthwiseTaps under the SAME "EConv_1/Conv_0/kernel" path so
            # both formulations share checkpoints / the torch import-export
            h = EConv(hidden, kernel=1, dtype=self.dtype, name="EConv_0")(h)
            h = BatchNorm()(h, use_running_average=not train)
            h = nn.silu(h)
            if self.dw_taps:
                h = DepthwiseTaps(hidden, stride=self.stride,
                                  dtype=self.dtype, name="EConv_1")(h)
            else:
                h = EConv(hidden, kernel=3, stride=self.stride,
                          groups=hidden, dtype=self.dtype, name="EConv_1")(h)
            h = BatchNorm()(h, use_running_average=not train)
            h = nn.silu(h)
            h = SELayer(self.inp, hidden, dtype=self.dtype)(h)
            h = EConv(self.oup, kernel=1, dtype=self.dtype, name="EConv_2")(h)
            h = BatchNorm()(h, use_running_average=not train)
        else:
            h = EConv(hidden, kernel=3, stride=self.stride,
                      dtype=self.dtype)(h)
            h = BatchNorm()(h, use_running_average=not train)
            h = nn.silu(h)
            h = EConv(self.oup, kernel=1, dtype=self.dtype)(h)
            h = BatchNorm()(h, use_running_average=not train)
        return x + h if identity else h


class ChannelProcessing(nn.Module):
    """FAN channel attention (reference :13-73): q softmax over tokens,
    k token-softmaxed then channel-averaged, attn = sigmoid(qᵀk)·T applied
    to vᵀ."""
    dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # x: (B, H, W, C)
        B, H, W, C = x.shape
        N = H * W
        hd = C // self.num_heads
        t = x.reshape(B, N, C)
        # the reference block constructs ChannelProcessing with
        # qkv_bias=True (nets/EffiAlterNet_SwinV2_FAN.py:411-415), so the
        # qv projection carries a bias
        qv = nn.Dense(2 * C, use_bias=True, kernel_init=trunc02,
                      bias_init=jax.nn.initializers.zeros,
                      dtype=self.dtype, param_dtype=jnp.float32,
                      precision=matmul_precision(self.dtype))(
            t.astype(self.dtype))
        qv = qv.reshape(B, N, C, 2)
        q = qv[..., 0].reshape(B, N, self.num_heads, hd).transpose(0, 2, 1, 3)
        v = qv[..., 1].reshape(B, N, self.num_heads, hd).transpose(0, 2, 1, 3)
        k = t.reshape(B, N, self.num_heads, hd).transpose(0, 2, 1, 3)

        temperature = self.param(
            "temperature",
            lambda *_: jnp.ones((self.num_heads, 1, 1), jnp.float32),
            (self.num_heads, 1, 1), jnp.float32)
        qs = jax.nn.softmax(q.astype(jnp.float32), axis=-2)  # over tokens
        qs = qs.transpose(0, 1, 3, 2)  # (B, h, hd, N)
        ks = jax.nn.softmax(k.astype(jnp.float32), axis=-2).mean(
            axis=-1, keepdims=True)  # adaptive_avg_pool2d(·, (N,1))
        attn = jax.nn.sigmoid(jnp.einsum(
            "bhdn,bhne->bhde", qs, ks,
            precision=jax.lax.Precision.HIGHEST)) * temperature
        # attn (B,h,hd,1) broadcast onto vᵀ (B,h,hd,N) (reference :66-67)
        out = attn * v.transpose(0, 1, 3, 2).astype(jnp.float32)
        out = out.transpose(0, 3, 1, 2).reshape(B, N, C)
        return out.reshape(B, H, W, C).astype(x.dtype)


class FANSwinBlock(nn.Module):
    """SwinV2 attention + FAN ChannelProcessing residuals
    (reference :306-462): x += DropPath(BN(attn(x)));
    x += DropPath(BN(channel_processing(x)))."""
    dim: int
    heads: int
    input_resolution: Tuple[int, int]
    window: int = 7
    shift: int = 0
    drop_path: float = 0.1
    dtype: Any = jnp.float32
    fused_attn: bool = True

    @nn.compact
    def __call__(self, x, train: bool):
        B, H, W, C = x.shape
        shortcut = x
        if self.shift > 0:
            shifted = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
            mask = shifted_window_mask(H, W, self.window, self.shift)
        else:
            shifted = x
            mask = None
        if use_spatial_attention(self.window, self.dim, self.fused_attn):
            # spatial fused path: windowing happens inside the kernel
            shifted = make_window_attention(
                self.dim, (self.window, self.window), self.heads,
                self.dtype, fused=True)(shifted, mask)
        else:
            # partition OUTSIDE the (remat'd) attention so backward does
            # not replay the transpose (measured +2 ms/step otherwise)
            windows = window_partition(shifted, self.window)
            # block_rows=512: EffiAlter's deeper block graph overflows
            # Mosaic's scoped-VMEM stack at the default kernel block size
            # on the N=49/C=512 backward (fused_window_attn._pick_block)
            attn = make_window_attention(
                self.dim, (self.window, self.window), self.heads,
                self.dtype, fused=self.fused_attn,
                block_rows=512)(windows, mask)
            shifted = window_reverse(attn, self.window, H, W)
        if self.shift > 0:
            out = jnp.roll(shifted, (self.shift, self.shift), axis=(1, 2))
        else:
            out = shifted
        out = BatchNorm()(out, use_running_average=not train)
        x = shortcut + DropPath(self.drop_path)(out, deterministic=not train)

        shortcut2 = x
        cp = ChannelProcessing(self.dim, self.heads, dtype=self.dtype)(x)
        cp = BatchNorm()(cp, use_running_average=not train)
        return shortcut2 + DropPath(self.drop_path)(cp, deterministic=not train)


class EffNetV2(nn.Module):
    """(reference nets/EffiAlterNet_SwinV2_FAN.py:590-703)."""
    cfgs: Sequence[Sequence[int]]  # [t, c, n, s, SE, n_transformer, heads]
    img_size: int = 112
    emd_size: int = 512
    width_mult: float = 1.0
    dtype: Any = jnp.float32
    fused_attn: bool = True
    dw_taps: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        in_ch = _make_divisible(24 * self.width_mult, 8)
        x = EConv(in_ch, kernel=3, stride=1, dtype=self.dtype)(x)
        x = BatchNorm()(x, use_running_average=not train)
        x = nn.silu(x)

        res = self.img_size  # reference's bookkeeping: halves every stage
        window = 7
        for t, c, n, s, use_se, n_tr, heads in self.cfgs:
            out_ch = _make_divisible(c * self.width_mult, 8)
            # alt_seq with the reference's res>window gating (reference :656-703)
            if res > window:
                num_blocks = 2 * (n // 3) + (n % 3) - 1
                assert 3 * n_tr <= n, "The number of transformers must not exceed cnn !!!"
            else:
                num_blocks = n - 1
                assert 2 * n_tr <= n, "The number of transformers must not exceed cnn !!!"
            seq = [False] * num_blocks
            for i in range(n_tr):
                seq[-2 * i - 1] = True

            x = MBConv(in_ch, out_ch, s, t, bool(use_se),
                       dtype=self.dtype, dw_taps=self.dw_taps)(x, train)
            for is_alt in seq:
                if not is_alt:
                    x = MBConv(out_ch, out_ch, 1, t, bool(use_se),
                               dtype=self.dtype,
                               dw_taps=self.dw_taps)(x, train)
                else:
                    x = FANSwinBlock(out_ch, heads, (res, res),
                                     window=window, dtype=self.dtype,
                                     fused_attn=self.fused_attn)(x, train)
                    if res > window:
                        x = FANSwinBlock(out_ch, heads, (res, res),
                                         window=window, shift=window // 2,
                                         dtype=self.dtype,
                                         fused_attn=self.fused_attn)(x, train)
            in_ch = out_ch
            res //= 2

        x = x.astype(jnp.float32)
        x = adaptive_avg_pool(x, 7, 7)
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        x = nn.Dense(self.emd_size, kernel_init=trunc02,
                     param_dtype=jnp.float32)(x)
        x = BatchNorm()(x, use_running_average=not train)
        return x


EFFIALTER_CFGS = {
    # reference :708-779 — [t, c, n, s, SE, n_transformer, heads]
    "EffiAlter_s": [
        [1, 24, 1, 1, 0, 0, 2], [2, 48, 3, 2, 0, 0, 2],
        [2, 64, 4, 2, 0, 0, 2], [2, 128, 5, 2, 1, 0, 4],
        [3, 160, 9, 1, 1, 0, 8], [3, 256, 4, 2, 1, 0, 8],
    ],
    "EffiAlter_m": [
        [1, 24, 3, 1, 0, 0, 2], [4, 48, 5, 2, 0, 0, 2],
        [4, 80, 5, 2, 0, 0, 2], [4, 160, 7, 2, 1, 0, 4],
        [6, 176, 14, 1, 1, 0, 8], [6, 304, 18, 2, 1, 2, 8],
        [6, 512, 5, 1, 1, 2, 16],
    ],
    "EffiAlter_l": [
        [1, 32, 4, 1, 0, 0, 2], [4, 64, 7, 2, 0, 0, 2],
        [4, 96, 7, 2, 0, 0, 2], [4, 192, 10, 2, 1, 0, 4],
        [6, 224, 19, 1, 1, 2, 8], [6, 384, 25, 2, 1, 2, 16],
        [6, 640, 7, 1, 1, 2, 32],
    ],
    "EffiAlter_xl": [
        [1, 32, 4, 1, 0, 0, 2], [4, 64, 8, 2, 0, 0, 2],
        [4, 96, 8, 2, 0, 0, 2], [4, 192, 16, 2, 1, 0, 4],
        [6, 256, 24, 1, 1, 2, 8], [6, 512, 32, 2, 1, 2, 16],
        [6, 640, 8, 1, 1, 2, 32],
    ],
}


def build_effialternet(conf) -> EffNetV2:
    """Encoder factory (reference nets/EffiAlterNet_SwinV2_FAN.py:785-793)."""
    dtype = jnp.bfloat16 if conf.get("mixed_precision", False) else jnp.float32
    return EffNetV2(cfgs=EFFIALTER_CFGS[conf.network], img_size=conf.img_size,
                    emd_size=conf.emd_size, dtype=dtype,
                    fused_attn=bool(conf.get("fused_attn", True)),
                    dw_taps=bool(conf.get("dw_taps", False)))

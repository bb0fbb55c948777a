"""SwinV2 backbone (reference nets/SwinV2.py:183-656).

- conv stem: conv3x3 s1 → BN → ReLU → maxpool3x3 s2 (reference :505-508);
- stages of SwinV2 blocks only, downsampled between stages by a
  Conv2d(k=2, s=2) (reference :537-538);
- block = W-MSA + BN residual, then 1×1-conv MLP (ratio 4, GELU) + BN
  residual (reference :263-300); all blocks unshifted (the reference's
  shift path references an undefined attribute, nets/SwinV2.py:240 — it is
  dead code and not reproduced);
- head: BN → Dropout → AdaptiveAvgPool(7,7) → Dense(emd·49 → emd) → BN1d
  (reference :515-519, 558-564).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from fr_tpu.models.common import BatchNorm, Conv, Dense, max_pool_3x3_s2
from fr_tpu.models.swin_common import (
    DropPath,
    make_window_attention,
    use_spatial_attention,
    adaptive_avg_pool,
    window_partition,
    window_reverse,
)


class SwinBlock(nn.Module):
    """W-MSA + conv-MLP block (reference nets/SwinV2.py:183-300)."""
    dim: int
    heads: int
    window: int = 7
    drop_path: float = 0.0
    dtype: Any = jnp.float32
    fused_attn: bool = True

    @nn.compact
    def __call__(self, x, train: bool):
        B, H, W, C = x.shape
        shortcut = x
        if use_spatial_attention(self.window, self.dim, self.fused_attn):
            out = make_window_attention(
                self.dim, (self.window, self.window), self.heads,
                self.dtype, fused=True)(x, None)
        else:
            windows = window_partition(x, self.window)
            attn = make_window_attention(
                self.dim, (self.window, self.window), self.heads,
                self.dtype, fused=self.fused_attn)(windows, None)
            out = window_reverse(attn, self.window, H, W)
        out = BatchNorm()(out, use_running_average=not train)
        x = shortcut + DropPath(self.drop_path)(out, deterministic=not train)

        shortcut = x
        h = Conv(4 * self.dim, kernel=1, use_bias=True, dtype=self.dtype)(x)
        h = nn.gelu(h)
        h = Conv(self.dim, kernel=1, use_bias=True, dtype=self.dtype)(h)
        h = BatchNorm()(h, use_running_average=not train)
        return shortcut + DropPath(self.drop_path)(h, deterministic=not train)


class Swin(nn.Module):
    """(reference nets/SwinV2.py:487-565)."""
    num_blocks: Sequence[int]
    heads: Sequence[int]
    emd_size: int = 512
    dtype: Any = jnp.float32
    fused_attn: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = Conv(64, kernel=3, stride=1, dtype=self.dtype)(x)
        x = BatchNorm()(x, use_running_average=not train)
        x = nn.relu(x)
        x = max_pool_3x3_s2(x)

        planes_per_stage = (64, 128, 256, self.emd_size)
        strides = (1, 2, 2, 2)
        for planes, blocks, heads, stride in zip(
                planes_per_stage, self.num_blocks, self.heads, strides):
            if stride > 1:
                x = Conv(planes, kernel=2, stride=2, padding=0,
                         dtype=self.dtype)(x)
            for _ in range(blocks):
                x = SwinBlock(planes, heads, dtype=self.dtype,
                              fused_attn=self.fused_attn)(x, train)

        x = BatchNorm()(x, use_running_average=not train)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = x.astype(jnp.float32)
        x = adaptive_avg_pool(x, 7, 7)
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        x = Dense(self.emd_size, dtype=jnp.float32)(x)
        x = BatchNorm()(x, use_running_average=not train)
        return x


SWIN_PLANS = {
    # reference nets/SwinV2.py:570-643
    "Swin18": ((0, 1, 1, 1), (2, 4, 8, 16)),
    "Swin34": ((0, 0, 4, 6), (2, 4, 8, 16)),
    "Swin50": ((0, 0, 4, 10), (2, 4, 8, 16)),
    "Swin100": ((0, 0, 6, 14), (2, 4, 8, 16)),
    "Swin200": ((0, 0, 10, 40), (2, 4, 8, 16)),
}


def build_swin(conf) -> Swin:
    """Encoder factory (reference nets/SwinV2.py:645-656)."""
    blocks, heads = SWIN_PLANS[conf.network]
    dtype = jnp.bfloat16 if conf.get("mixed_precision", False) else jnp.float32
    return Swin(num_blocks=blocks, heads=heads, emd_size=conf.emd_size,
                dtype=dtype,
                fused_attn=bool(conf.get("fused_attn", True)))

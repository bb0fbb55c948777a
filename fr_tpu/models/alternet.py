"""AlterNet-SwinV2-FAN hybrid backbone (the active "AlterNet").

Re-design of reference nets/AlterNet_SwinV2_FAN.py:306-839: ResNet IR
BasicBlocks interleaved with SwinV2 W-MSA/SW-MSA pairs.

- stem: conv3x3 **stride 2** → BN → ReLU → maxpool3x3 s2 (hence 192×192
  input; reference :656 + main/main.py:102);
- stage plan: first block strided BasicBlock, then
  num_blocks = 2·(blocks//3) + blocks%3 − 1 slots with transformer pairs
  placed from the end at every other slot (reference :704-729); each
  transformer slot = W-MSA block + SW-MSA block (shift = window//2);
- windows 6,6,6,3 per stage (reference :661-664);
- Swin block: residual `x + DropPath(BN(attn(x)))`, BatchNorm2d as norm,
  drop_path 0.1 (reference :306-450; the FAN ChannelProcessing branch is
  commented out in this reference file and therefore not built here);
- head: BN → ReLU → Dropout → AdaptiveAvgPool(6,6) → Dense(emd·36 → emd)
  → BN1d (reference :666-670, 743-749).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from fr_tpu.models.common import BatchNorm, Conv, Dense, max_pool_3x3_s2
from fr_tpu.models.resnet import BasicBlock
from fr_tpu.models.swin_common import (
    DropPath,
    make_window_attention,
    use_spatial_attention,
    adaptive_avg_pool,
    shifted_window_mask,
    window_partition,
    window_reverse,
)


class AlterSwinBlock(nn.Module):
    """SwinV2 block, AlterNet variant (reference AlterNet_SwinV2_FAN.py:306-450)."""
    dim: int
    dim_out: int
    heads: int
    input_resolution: Tuple[int, int]
    window: int = 7
    shift: int = 0
    drop_path: float = 0.1
    dtype: Any = jnp.float32
    fused_attn: bool = True

    @nn.compact
    def __call__(self, x, train: bool):
        # pre-activated conv shortcut only on channel change (reference
        # :347-352, 410-416); in the reference stage plans dim == dim_out.
        if self.dim != self.dim_out:
            x = BatchNorm()(x, use_running_average=not train)
            x = nn.gelu(x)
            shortcut = Conv(self.dim_out, kernel=1, dtype=self.dtype)(x)
        else:
            shortcut = x

        B, H, W, C = x.shape
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
            attn = make_window_attention(
                self.dim, (self.window, self.window), self.heads,
                self.dtype, fused=self.fused_attn)(windows, mask)
            shifted = window_reverse(attn, self.window, H, W)
        if self.shift > 0:
            out = jnp.roll(shifted, (self.shift, self.shift), axis=(1, 2))
        else:
            out = shifted
        out = BatchNorm()(out, use_running_average=not train)
        out = DropPath(self.drop_path)(out, deterministic=not train)
        return shortcut + out


def alt_sequence(blocks: int, blocks2: int) -> Sequence[bool]:
    """Transformer-slot placement (reference AlterNet_SwinV2_FAN.py:704-720):
    after the first (strided) block, num_blocks slots; transformer pairs at
    every other slot from the end."""
    num_blocks = 2 * (blocks // 3) + (blocks % 3) - 1
    assert 2 * blocks2 + blocks2 <= blocks, \
        "The number of transformers must not exceed cnn !!!"
    seq = [False] * num_blocks
    for i in range(blocks2):
        seq[-2 * i - 1] = True
    return seq


class AlterNet(nn.Module):
    """(reference nets/AlterNet_SwinV2_FAN.py:637-751)."""
    num_blocks: Sequence[int]
    num_blocks2: Sequence[int]
    heads: Sequence[int]
    img_size: int = 192
    emd_size: int = 512
    # reference defaults (AlterNet_SwinV2_FAN.py:427 drop_path, :668 Dropout);
    # zeroable so training-dynamics parity tests can run deterministically
    drop_path_rate: float = 0.1
    head_drop: float = 0.5
    dtype: Any = jnp.float32
    fused_attn: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = Conv(64, kernel=3, stride=2, dtype=self.dtype)(x)
        x = BatchNorm()(x, use_running_average=not train)
        x = nn.relu(x)
        x = max_pool_3x3_s2(x)

        res = self.img_size // 4
        windows = (6, 6, 6, 3)
        planes_per_stage = (64, 128, 256, self.emd_size)
        strides = (1, 2, 2, 2)
        for si, (planes, blocks, blocks2, heads, win, stride) in enumerate(
                zip(planes_per_stage, self.num_blocks, self.num_blocks2,
                    self.heads, windows, strides)):
            if si > 0:
                res //= 2
            x = BasicBlock(planes, stride, dtype=self.dtype)(x, train)
            for is_alt in alt_sequence(blocks, blocks2):
                if not is_alt:
                    x = BasicBlock(planes, 1, dtype=self.dtype)(x, train)
                else:
                    x = AlterSwinBlock(planes, planes, heads, (res, res),
                                       window=win,
                                       drop_path=self.drop_path_rate,
                                       dtype=self.dtype,
                                       fused_attn=self.fused_attn)(x, train)
                    x = AlterSwinBlock(planes, planes, heads, (res, res),
                                       window=win, shift=win // 2,
                                       drop_path=self.drop_path_rate,
                                       dtype=self.dtype,
                                       fused_attn=self.fused_attn)(x, train)

        x = BatchNorm()(x, use_running_average=not train)
        x = nn.relu(x)
        x = nn.Dropout(self.head_drop, deterministic=not train)(x)
        x = x.astype(jnp.float32)
        x = adaptive_avg_pool(x, 6, 6)
        # flatten in torch NCHW order for checkpoint transferability
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        x = Dense(self.emd_size, dtype=jnp.float32)(x)
        x = BatchNorm()(x, use_running_average=not train)
        return x


ALTERNET_PLANS = {
    # name: (num_blocks, num_blocks2, heads) — reference :756-829
    "AlterNet18": ((2, 2, 2, 2), (0, 1, 1, 1), (2, 4, 8, 16)),
    "AlterNet34": ((3, 4, 6, 3), (0, 1, 3, 2), (2, 4, 8, 16)),
    "AlterNet50": ((3, 4, 14, 4), (0, 1, 4, 1), (2, 4, 8, 16)),
    "AlterNet100": ((3, 13, 30, 4), (0, 1, 1, 2), (2, 4, 8, 16)),
    "AlterNet200": ((3, 43, 50, 3), (0, 1, 3, 2), (2, 4, 8, 16)),
}


def build_alternet(conf) -> AlterNet:
    """Encoder factory (reference nets/AlterNet_SwinV2_FAN.py:831-839)."""
    blocks, blocks2, heads = ALTERNET_PLANS[conf.network]
    dtype = jnp.bfloat16 if conf.get("mixed_precision", False) else jnp.float32
    return AlterNet(num_blocks=blocks, num_blocks2=blocks2, heads=heads,
                    img_size=conf.img_size, emd_size=conf.emd_size,
                    dtype=dtype,
                    fused_attn=bool(conf.get("fused_attn", True)))


def alt_sequence_sep(blocks: int, blocks2: int) -> Sequence[bool]:
    """Seperate-variant placement (reference
    nets/AlterNet_SwinV2_FAN_Seperate.py:533): blocks−1 slots after the
    strided block, SINGLE transformer blocks (not W/SW pairs) at every other
    slot from the end."""
    return [False] * (blocks - blocks2 * 2 - 1) + [False, True] * blocks2


class AlterNetSep(nn.Module):
    """The 'Seperate' architecture-ablation AlterNet (reference
    nets/AlterNet_SwinV2_FAN_Seperate.py:476-565): ResNet-shaped — stride-1
    stem (112px input), stages of IR BasicBlocks with single unshifted
    window-7 SwinV2 blocks placed by alt_sequence_sep, head
    BN → Dropout → GAP(7,7) → Dense(emd·49 → emd) → BN1d (no ReLU).
    Dead in the reference dispatch but a distinct, constructible network
    (inventory C11)."""
    num_blocks: Sequence[int]
    num_blocks2: Sequence[int]
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
        for planes, blocks, blocks2, heads, stride in zip(
                planes_per_stage, self.num_blocks, self.num_blocks2,
                self.heads, strides):
            x = BasicBlock(planes, stride, dtype=self.dtype)(x, train)
            for is_alt in alt_sequence_sep(blocks, blocks2):
                if not is_alt:
                    x = BasicBlock(planes, 1, dtype=self.dtype)(x, train)
                else:
                    # window_size=7, shift_size=0, drop_path=0 defaults
                    # (reference :189-194,543 — stack_layers passes only heads)
                    x = AlterSwinBlock(planes, planes, heads,
                                       (x.shape[1], x.shape[2]), window=7,
                                       shift=0, drop_path=0.0,
                                       dtype=self.dtype,
                                       fused_attn=self.fused_attn)(x, train)

        x = BatchNorm()(x, use_running_average=not train)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = x.astype(jnp.float32)
        x = adaptive_avg_pool(x, 7, 7)
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        x = Dense(self.emd_size, dtype=jnp.float32)(x)
        x = BatchNorm()(x, use_running_average=not train)
        return x


ALTERNET_SEP_PLANS = {
    # reference nets/AlterNet_SwinV2_FAN_Seperate.py:570-644 — note the 50
    # plan differs from the active AlterNet50 ([3,4,14,3]/[0,1,7,2]).
    "AlterNetSep18": ((2, 2, 2, 2), (0, 1, 1, 1), (2, 4, 8, 16)),
    "AlterNetSep34": ((3, 4, 6, 3), (0, 1, 3, 2), (2, 4, 8, 16)),
    "AlterNetSep50": ((3, 4, 14, 3), (0, 1, 7, 2), (2, 4, 8, 16)),
    "AlterNetSep100": ((3, 13, 30, 4), (0, 1, 1, 2), (2, 4, 8, 16)),
    "AlterNetSep200": ((3, 43, 50, 3), (0, 1, 3, 2), (2, 4, 8, 16)),
}


def build_alternet_sep(conf) -> AlterNetSep:
    blocks, blocks2, heads = ALTERNET_SEP_PLANS[conf.network]
    dtype = jnp.bfloat16 if conf.get("mixed_precision", False) else jnp.float32
    return AlterNetSep(num_blocks=blocks, num_blocks2=blocks2, heads=heads,
                       emd_size=conf.emd_size, dtype=dtype,
                       fused_attn=bool(conf.get("fused_attn", True)))

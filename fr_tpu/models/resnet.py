"""IR-style face-recognition ResNet.

Re-design of the reference backbone (reference nets/resnet.py:55-316) in flax,
NHWC, bf16-compute / fp32-param:

- IR BasicBlock: conv3x3(in→in, s1) → BN → ReLU → conv3x3(in→out, stride) → BN,
  plus identity or conv1x1(stride)+BN shortcut, **no output ReLU**
  (reference nets/resnet.py:89-103).
- Stem: conv3x3 s1 → BN → ReLU → maxpool3x3 s2 p1 (reference nets/resnet.py:186-189).
- Four stages at 64/128/256/emd_size channels, strides 1,2,2,2
  (reference nets/resnet.py:191-194).
- Head: BN2d → flatten → Dense(emd·7·7 → emd) → BN1d, no ReLU
  ("BN-FC-BN" insightface style, reference nets/resnet.py:196-199, 242-247).
- Depths: R18 [2,2,2,2], R34 [3,4,6,4], R50 [3,4,14,4], R100 [3,13,30,4],
  R200 [3,43,50,4] — all BasicBlock (reference nets/resnet.py:253-306; the
  reference's Bottleneck has a use-before-assign bug at nets/resnet.py:151 and
  is dead code — deliberately not reproduced).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from fr_tpu.models.common import BatchNorm, Conv, Dense, max_pool_3x3_s2


class BasicBlock(nn.Module):
    """IR BasicBlock (reference nets/resnet.py:55-103)."""
    planes: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        inplanes = x.shape[-1]
        out = Conv(inplanes, kernel=3, stride=1, dtype=self.dtype)(x)
        out = BatchNorm()(out, use_running_average=not train)
        out = nn.relu(out)
        out = Conv(self.planes, kernel=3, stride=self.stride, dtype=self.dtype)(out)
        out = BatchNorm()(out, use_running_average=not train)

        if self.stride != 1 or inplanes != self.planes:
            residual = Conv(self.planes, kernel=1, stride=self.stride,
                            dtype=self.dtype)(x)
            residual = BatchNorm()(residual, use_running_average=not train)
        else:
            residual = x
        return out + residual  # no final ReLU (reference nets/resnet.py:101-103)


class ResNet(nn.Module):
    """Face-embedding ResNet (reference nets/resnet.py:172-248)."""
    layers: Sequence[int]
    emd_size: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = Conv(64, kernel=3, stride=1, dtype=self.dtype)(x)
        x = BatchNorm()(x, use_running_average=not train)
        x = nn.relu(x)
        x = max_pool_3x3_s2(x)

        for planes, blocks, stride in zip(
                (64, 128, 256, self.emd_size), self.layers, (1, 2, 2, 2)):
            x = BasicBlock(planes, stride, dtype=self.dtype)(x, train)
            for _ in range(1, blocks):
                x = BasicBlock(planes, 1, dtype=self.dtype)(x, train)

        x = BatchNorm()(x, use_running_average=not train)
        x = x.astype(jnp.float32)
        # NHWC → flatten in torch's NCHW order (C, H, W) so weights are
        # transferable from / comparable to the reference layout
        # (reference nets/resnet.py:244).
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        x = Dense(self.emd_size, dtype=jnp.float32)(x)
        x = BatchNorm()(x, use_running_average=not train)
        return x


RESNET_LAYERS = {
    "ResNet18": (2, 2, 2, 2),
    "ResNet34": (3, 4, 6, 4),
    "ResNet50": (3, 4, 14, 4),
    "ResNet100": (3, 13, 30, 4),
    "ResNet200": (3, 43, 50, 4),
}


def build_resnet(conf) -> ResNet:
    """Encoder factory (reference nets/resnet.py:308-316)."""
    dtype = jnp.bfloat16 if conf.get("mixed_precision", False) else jnp.float32
    return ResNet(layers=RESNET_LAYERS[conf.network], emd_size=conf.emd_size,
                  dtype=dtype)

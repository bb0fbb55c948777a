"""Shared model building blocks and initialisers.

Layout convention: NHWC (TPU-native; XLA tiles the channel dim onto the
128-lane axis). The reference is NCHW torch (reference nets/resnet.py), but
the math is layout-independent.

Initialisation matches the reference: Xavier-normal (untruncated) for conv and
dense kernels, BN gamma=1 beta=0, dense bias=0 (reference nets/resnet.py:201-209).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch's xavier_normal_ draws from an untruncated normal with
# std = sqrt(2 / (fan_in + fan_out)).
xavier_normal = jax.nn.initializers.variance_scaling(
    1.0, "fan_avg", "normal")

Dtype = Any


def matmul_precision(dtype) -> Optional[jax.lax.Precision]:
    """f32 compute must not silently run as one-pass bf16 on the MXU; bf16
    compute uses the native default."""
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None


class Conv(nn.Module):
    """Bias-free conv with torch-style 'same-ish' fixed padding
    (reference nets/resnet.py:9-46)."""
    features: int
    kernel: int = 3
    stride: int = 1
    padding: Optional[int] = None  # default: (kernel-1)//2, torch convention
    groups: int = 1
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) // 2 if self.padding is None else self.padding
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            kernel_init=xavier_normal,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            precision=matmul_precision(self.dtype),
        )(x)


class BatchNorm(nn.Module):
    """BatchNorm with torch defaults (eps 1e-5, running-stat momentum 0.1 →
    flax momentum 0.9). Stats and affine math run in float32 regardless of the
    compute dtype; under shard_map this is per-device (local) BN, matching the
    reference's broadcast_buffers=False DDP setup
    (reference model/FR_PartialFC.py:98)."""
    use_running_average: Optional[bool] = None

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        ura = nn.merge_param("use_running_average", self.use_running_average,
                             use_running_average)
        in_dtype = x.dtype
        y = nn.BatchNorm(
            use_running_average=ura,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
        )(x.astype(jnp.float32))
        return y.astype(in_dtype)


class Dense(nn.Module):
    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            features=self.features,
            use_bias=self.use_bias,
            kernel_init=xavier_normal,
            bias_init=jax.nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            precision=matmul_precision(self.dtype),
        )(x)


def max_pool_3x3_s2(x):
    """torch MaxPool2d(kernel_size=3, stride=2, padding=1)
    (reference nets/resnet.py:189). Pads with -inf so padding never wins.

    reduce_window on purpose: its select-and-scatter gradient (1.73 ms/step
    on the R100 stem, b=256) is already near its bandwidth floor — an
    elementwise custom-VJP reformulation (9 interior-padded masked adds,
    tried in round 2) measured +28 ms/step: the extra passes at 112^2 and
    the lost stem conv+BN+ReLU fusion cost far more than select-and-scatter
    (ROUND2_NOTES.md)."""
    return nn.max_pool(x, window_shape=(3, 3), strides=(2, 2),
                       padding=((1, 1), (1, 1)))


def l2_normalize(x, axis: int = -1, eps: float = 1e-12):
    """torch F.normalize semantics: x / max(‖x‖₂, eps)
    (reference model/FR_PartialFC.py:171).

    Written as x·rsqrt(max(Σx², eps²)) so the gradient at x = 0 is finite
    (‖·‖₂ has a NaN derivative at 0, and `0·NaN` leaks through downstream
    masking; all-zero rows occur e.g. for zero-padded class centers)."""
    sum_sq = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(sum_sq, eps * eps))

"""Original AlterNet (einsum local-attention generation) + post-norm variant.

Re-design of reference nets/AlterNet.py (C10) and nets/AlterNet_post_norm.py
(C11): the "How Do Vision Transformers Work?"-style hybrid preceding the
SwinV2 generation. Not reachable from the reference's Model dispatch
(model/FR_PartialFC.py:62-72 maps 'AlterNet' to the SwinV2-FAN file) — kept
for inventory completeness.

- LocalAttention: Attention2d (1×1-conv q, k-strided kv, scaled dot-product)
  over p×p windows with a learned 2D relative position bias table indexed by
  pairwise offsets (reference nets/AlterNet.py:189-226); the window shrinks
  to 2 when the feature map is 4×4 (reference :204-206 — a static shape
  check here);
- AttentionBasicBlockB: pre-activation BN→GELU→1×1 conv→BN→local-attn→
  DropPath + skip (reference :229-275, expansion 1 variant :272-275);
- alt_seq = [False]·(blocks − 2·blocks2 − 1) + [False, True]·blocks2
  (reference :514), single attention block per slot;
- stem conv3x3 s1 (112px), head BN→Dropout→GAP(7,7)→FC→BN1d (reference
  :476-493);
Note on nets/AlterNet_post_norm.py (C11): its only delta vs nets/AlterNet.py
is the FeedForward norm ordering inside the 1-D Transformer block
(post_norm.py:205-206), which is NOT on any model path in either file (the
live blocks are AttentionBasicBlockB, which have no FeedForward). The
variant is therefore behaviourally identical to this model and needs no
separate implementation.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from fr_tpu.models.common import (
    BatchNorm, Conv, Dense, matmul_precision, max_pool_3x3_s2, xavier_normal,
)
from fr_tpu.models.resnet import BasicBlock
from fr_tpu.models.swin_common import adaptive_avg_pool


def _rel_index(p: int) -> np.ndarray:
    """(p², p², 2) pairwise offsets shifted to [0, 2p-2]
    (reference nets/AlterNet.py:221-226)."""
    coords = np.array([[x, y] for x in range(p) for y in range(p)])
    d = coords[None, :, :] - coords[:, None, :]
    return (d + p - 1).astype(np.int32)


class Attention2d(nn.Module):
    """(reference nets/AlterNet.py:70-103)."""
    dim_out: int
    heads: int
    dim_head: int = 64
    k: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, bias):  # x: (B, p, p, C); bias: (p², kv²)
        B, H, W, C = x.shape
        inner = self.heads * self.dim_head
        prec = matmul_precision(self.dtype)
        q = Conv(inner, kernel=1, dtype=self.dtype, use_bias=False)(x)
        kv = nn.Conv(2 * inner, (self.k, self.k), (self.k, self.k),
                     padding="VALID", use_bias=False,
                     kernel_init=xavier_normal, dtype=self.dtype,
                     param_dtype=jnp.float32, precision=prec)(x)
        kk, vv = jnp.split(kv, 2, axis=-1)

        def shape_heads(t):
            b, h, w, _ = t.shape
            t = t.reshape(b, h * w, self.heads, self.dim_head)
            return t.transpose(0, 2, 1, 3)

        q, kk, vv = shape_heads(q), shape_heads(kk), shape_heads(vv)
        dots = jnp.einsum("bhid,bhjd->bhij", q, kk, precision=prec,
                          preferred_element_type=jnp.float32)
        dots = dots * (self.dim_head ** -0.5) + bias[None, None]
        attn = jax.nn.softmax(dots, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, vv, precision=prec,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(B, H, W, inner)
        out = out.astype(self.dtype)
        return Conv(self.dim_out, kernel=1, use_bias=True,
                    dtype=self.dtype)(out)


class LocalAttention(nn.Module):
    """(reference nets/AlterNet.py:189-226)."""
    dim_out: int
    heads: int
    dim_head: int = 64
    window: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        p = 2 if H == 4 else self.window  # reference :204-206
        n1, n2 = H // p, W // p
        rel = _rel_index(p)
        pos = self.param("pos_embedding",
                         jax.nn.initializers.normal(0.02),
                         (2 * p - 1, 2 * p - 1), jnp.float32)
        bias = pos[rel[:, :, 0], rel[:, :, 1]]  # (p², p²)

        xw = x.reshape(B, n1, p, n2, p, C).transpose(0, 1, 3, 2, 4, 5)
        xw = xw.reshape(B * n1 * n2, p, p, C)
        out = Attention2d(self.dim_out, self.heads, self.dim_head,
                          dtype=self.dtype)(xw, bias)
        out = out.reshape(B, n1, n2, p, p, self.dim_out)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, self.dim_out)
        return out


class AttentionBasicBlockB(nn.Module):
    """Pre-activation local-attention block, expansion 1
    (reference nets/AlterNet.py:229-275)."""
    dim_out: int
    heads: int
    dim_head: int = 64
    stride: int = 1
    window: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        dim_in = x.shape[-1]
        if self.stride != 1 or dim_in != self.dim_out:
            x = BatchNorm()(x, use_running_average=not train)
            x = nn.gelu(x)
            skip = Conv(self.dim_out, kernel=1, stride=self.stride,
                        dtype=self.dtype)(x)
        else:
            skip = x
            x = BatchNorm()(x, use_running_average=not train)
            x = nn.gelu(x)
        h = Conv(dim_in, kernel=1, dtype=self.dtype)(x)  # width = dim_in
        h = BatchNorm()(h, use_running_average=not train)
        h = LocalAttention(self.dim_out, self.heads, self.dim_head,
                           self.window, dtype=self.dtype)(h)
        return h + skip


class AlterNetV1(nn.Module):
    """(reference nets/AlterNet.py:461-547)."""
    num_blocks: Sequence[int]
    num_blocks2: Sequence[int]
    heads: Sequence[int]
    emd_size: int = 512
    dtype: Any = jnp.float32

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
            # reference :514: single attention block per True slot
            alt_seq = ([False] * (blocks - blocks2 * 2 - 1)
                       + [False, True] * blocks2)
            x = BasicBlock(planes, stride, dtype=self.dtype)(x, train)
            for is_alt in alt_seq:
                if not is_alt:
                    x = BasicBlock(planes, 1, dtype=self.dtype)(x, train)
                else:
                    x = AttentionBasicBlockB(planes, heads,
                                             dtype=self.dtype)(x, train)

        x = BatchNorm()(x, use_running_average=not train)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = x.astype(jnp.float32)
        x = adaptive_avg_pool(x, 7, 7)
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        x = Dense(self.emd_size, dtype=jnp.float32)(x)
        x = BatchNorm()(x, use_running_average=not train)
        return x


ALTERNET_V1_PLANS = {
    # reference nets/AlterNet.py:552-635 — heads (3, 6, 12, 24)
    "AlterNetV1_18": ((2, 2, 2, 2), (0, 1, 1, 2)),
    "AlterNetV1_34": ((3, 4, 6, 3), (0, 1, 1, 2)),
    "AlterNetV1_50": ((3, 4, 14, 3), (0, 1, 1, 2)),
    "AlterNetV1_100": ((3, 13, 30, 3), (0, 1, 1, 2)),
    "AlterNetV1_200": ((3, 43, 50, 3), (0, 1, 1, 2)),
}


def build_alternet_v1(conf) -> AlterNetV1:
    blocks, blocks2 = ALTERNET_V1_PLANS[conf.network]
    dtype = jnp.bfloat16 if conf.get("mixed_precision", False) else jnp.float32
    return AlterNetV1(num_blocks=blocks, num_blocks2=blocks2,
                      heads=(3, 6, 12, 24), emd_size=conf.emd_size,
                      dtype=dtype)

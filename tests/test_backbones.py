"""SwinV2 / AlterNet / EffiAlterNet backbones: attention parity vs the torch
reference (timm shimmed) and shape/train smoke tests."""

import numpy as np
import pytest

from conftest import add_reference_to_path, reference_available

import jax
import jax.numpy as jnp

from fr_tpu.configs.base import Config
from fr_tpu.models.alternet import ALTERNET_PLANS, AlterNet, AlterSwinBlock, alt_sequence
from fr_tpu.models.effialternet import EFFIALTER_CFGS, ChannelProcessing, EffNetV2
from fr_tpu.models.swin_common import (
    WindowAttention, adaptive_avg_pool, shifted_window_mask,
    window_partition, window_reverse,
)
from fr_tpu.models.swinv2 import Swin


def test_window_partition_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 12, 12, 8)).astype(np.float32))
    w = window_partition(x, 6)
    assert w.shape == (2 * 4, 36, 8)
    back = window_reverse(w, 6, 12, 12)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
@pytest.mark.parametrize("shift", [0, 3])
def test_window_attention_matches_reference(shift):
    add_reference_to_path()
    import timm_shim
    timm_shim.install()
    import torch
    from nets.AlterNet_SwinV2_FAN import WindowAttention as RefWA

    dim, heads, ws = 64, 2, 6
    torch.manual_seed(0)
    ref = RefWA(dim, (ws, ws), heads)
    ref.eval()

    rng = np.random.default_rng(0)
    H = W = 12
    nW = (H // ws) * (W // ws)
    B_ = 2 * nW
    x = rng.standard_normal((B_, ws * ws, dim)).astype(np.float32)
    mask = shifted_window_mask(H, W, ws, shift) if shift else None

    with torch.no_grad():
        ref_out = ref(torch.tensor(x),
                      mask=torch.tensor(mask) if mask is not None else None
                      ).numpy()

    wa = WindowAttention(dim, (ws, ws), heads)
    variables = wa.init(jax.random.key(0), jnp.asarray(x), mask)
    sd = ref.state_dict()
    params = {
        "qkv_kernel": sd["qkv.weight"].numpy().T,
        "q_bias": sd["q_bias"].numpy(),
        "v_bias": sd["v_bias"].numpy(),
        "logit_scale": sd["logit_scale"].numpy(),
        "cpb_fc1": {"kernel": sd["cpb_mlp.0.weight"].numpy().T,
                    "bias": sd["cpb_mlp.0.bias"].numpy()},
        "cpb_fc2": {"kernel": sd["cpb_mlp.2.weight"].numpy().T},
        "proj": {"kernel": sd["proj.weight"].numpy().T,
                 "bias": sd["proj.bias"].numpy()},
    }
    # static tables must agree with the reference buffers
    from fr_tpu.models.swin_common import (relative_coords_table,
                                           relative_position_index)
    np.testing.assert_allclose(relative_coords_table((ws, ws)),
                               sd["relative_coords_table"].numpy(), atol=1e-6)
    np.testing.assert_array_equal(relative_position_index((ws, ws)),
                                  sd["relative_position_index"].numpy())

    out = wa.apply({"params": params}, jnp.asarray(x), mask)
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=2e-4, atol=2e-5)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_channel_processing_matches_reference():
    add_reference_to_path()
    import timm_shim
    timm_shim.install()
    import torch
    from nets.EffiAlterNet_SwinV2_FAN import ChannelProcessing as RefCP

    dim, heads = 16, 4
    torch.manual_seed(1)
    # the reference FAN block constructs ChannelProcessing with qkv_bias=True
    # (nets/EffiAlterNet_SwinV2_FAN.py:411-415)
    ref = RefCP(dim, num_heads=heads, qkv_bias=True)
    ref.eval()
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, dim, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.tensor(x)).numpy()

    cp = ChannelProcessing(dim, heads)
    sd = ref.state_dict()
    params = {
        "Dense_0": {"kernel": sd["qv.weight"].numpy().T,
                    "bias": sd["qv.bias"].numpy()},
        "temperature": sd["temperature"].numpy(),
    }
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    out = cp.apply({"params": params}, x_nhwc)
    out_nchw = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out_nchw, ref_out, rtol=2e-4, atol=2e-5)


def test_alt_sequence_alternet50():
    # AlterNet50 stage3: 14 blocks, 4 transformer slots (reference plan)
    seq = alt_sequence(14, 4)
    assert len(seq) == 9
    assert sum(seq) == 4
    # pairs from the end at every other slot
    assert seq[-1] and seq[-3] and seq[-5] and seq[-7]
    # total blocks = 1 (strided) + falses + 2*trues = 14
    assert 1 + (len(seq) - 4) + 2 * 4 == 14


def test_alternet_only_50_constructible():
    """Reference stage-plan asserts make AlterNet18/34/100/200 unbuildable
    (3·blocks2 > blocks in some stage) — parity includes failing the same way."""
    for name in ("AlterNet18", "AlterNet34", "AlterNet100", "AlterNet200"):
        blocks, blocks2, _ = ALTERNET_PLANS[name]
        with pytest.raises(AssertionError):
            for b, b2 in zip(blocks, blocks2):
                alt_sequence(b, b2)


def test_alternet_tiny_shapes_and_smoke():
    model = AlterNet(num_blocks=(3, 3, 3, 3), num_blocks2=(0, 1, 1, 1),
                     heads=(2, 4, 8, 16), img_size=96, emd_size=64)
    x = jnp.zeros((2, 96, 96, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 64)
    out2, _ = model.apply(variables, x, train=True, mutable=["batch_stats"],
                          rngs={"dropout": jax.random.key(1)})
    assert np.isfinite(np.asarray(out2)).all()


def test_swin_tiny_shapes():
    # Swin needs 112px input: stem+strides give stage-3/4 resolutions 14/7
    # matching the default window 7 (reference nets/SwinV2.py stage geometry).
    model = Swin(num_blocks=(0, 0, 1, 1), heads=(2, 4, 8, 16), emd_size=64)
    x = jnp.zeros((2, 112, 112, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 64)


def test_effialternet_tiny_shapes():
    cfgs = [
        [1, 16, 2, 1, 0, 0, 2],
        [2, 24, 2, 2, 1, 0, 2],
        [2, 32, 3, 2, 1, 1, 4],  # res bookkeeping 14 > 7 → W+SW pair
    ]
    model = EffNetV2(cfgs=cfgs, img_size=56, emd_size=32)
    x = jnp.zeros((2, 56, 56, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 32)
    out2, _ = model.apply(variables, x, train=True, mutable=["batch_stats"],
                          rngs={"dropout": jax.random.key(1)})
    assert np.isfinite(np.asarray(out2)).all()


def test_alternet_v1_tiny_shapes():
    """Original einsum local-attention AlterNet (reference nets/AlterNet.py)."""
    from fr_tpu.models.alternet_v1 import AlterNetV1
    model = AlterNetV1(num_blocks=(2, 3, 3, 3), num_blocks2=(0, 1, 1, 1),
                       heads=(3, 6, 12, 24), emd_size=48)
    x = jnp.zeros((2, 112, 112, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 48)
    out2, _ = model.apply(variables, x, train=True, mutable=["batch_stats"],
                          rngs={"dropout": jax.random.key(1)})
    assert np.isfinite(np.asarray(out2)).all()


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_local_attention_matches_reference():
    """Attention2d + LocalAttention parity vs reference nets/AlterNet.py."""
    add_reference_to_path()
    import timm_shim
    timm_shim.install()
    import torch
    from nets.AlterNet import LocalAttention as RefLA

    from fr_tpu.models.alternet_v1 import LocalAttention

    torch.manual_seed(3)
    dim, heads, dim_head, p = 24, 3, 8, 7
    ref = RefLA(dim, dim, window_size=p, heads=heads, dim_head=dim_head)
    ref.eval()
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, dim, 14, 14)).astype(np.float32)
    with torch.no_grad():
        ref_out, _ = ref(torch.tensor(x))
    la = LocalAttention(dim, heads, dim_head, window=p)
    sd = ref.state_dict()
    inner = heads * dim_head
    params = {
        "pos_embedding": sd["pos_embedding"].numpy(),
        "Attention2d_0": {
            "Conv_0": {"Conv_0": {"kernel": np.transpose(
                sd["attn.to_q.weight"].numpy(), (2, 3, 1, 0))}},
            "Conv_1": {"kernel": np.transpose(
                sd["attn.to_kv.weight"].numpy(), (2, 3, 1, 0))},
            "Conv_2": {"Conv_0": {
                "kernel": np.transpose(
                    sd["attn.to_out.0.weight"].numpy(), (2, 3, 1, 0)),
                "bias": sd["attn.to_out.0.bias"].numpy()}},
        },
    }
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    out = la.apply({"params": params}, x_nhwc)
    out_nchw = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out_nchw, ref_out.numpy(), rtol=2e-4, atol=2e-5)


def test_alternet_train_step_smoke():
    """Full sharded train step with a transformer hybrid encoder (exercises
    dropout/drop-path rngs and window attention under shard_map)."""
    from fr_tpu.heads.partial_fc import PFCConfig
    from fr_tpu.parallel import make_mesh
    from fr_tpu.train.state import init_train_state
    from fr_tpu.train.step import make_train_step, shard_batch

    conf = Config(network="AlterNetTiny", emd_size=32, n_classes=12,
                  metric="ArcFace", loss_s=30.0, loss_m=0.35,
                  optimizer_name="SGD", optimizer="SGD", wd=5e-4, mom=0.9,
                  mixed_precision=False, sample_rate=1.0, img_size=96)
    enc = AlterNet(num_blocks=(3, 3, 3, 3), num_blocks2=(0, 1, 1, 1),
                   heads=(2, 4, 8, 16), img_size=96, emd_size=32)
    mesh = make_mesh(data=2, model=4)
    pfc = PFCConfig(12, 32, 4, 1.0, "ArcFace", 30.0, 0.35, False, "SGD")
    state = init_train_state(jax.random.key(0), conf, enc, pfc, 96)
    step = make_train_step(conf, mesh, enc, pfc, donate=False)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((8, 96, 96, 3)).astype(np.float32)
    y = rng.integers(0, 12, 8).astype(np.int32)
    xs, ys = shard_batch(mesh, x, y)
    state, m = step(state, xs, ys, 0.05, jax.random.key(1))
    assert np.isfinite(float(m["loss"]))


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_adaptive_avg_pool_matches_torch():
    import torch
    rng = np.random.default_rng(2)
    for hw, out in [(7, 7), (6, 6), (14, 6), (4, 6), (13, 7)]:
        x = rng.standard_normal((2, hw, hw, 5)).astype(np.float32)
        ref = torch.nn.functional.adaptive_avg_pool2d(
            torch.tensor(np.transpose(x, (0, 3, 1, 2))), (out, out)).numpy()
        mine = np.transpose(
            np.asarray(adaptive_avg_pool(jnp.asarray(x), out, out)),
            (0, 3, 1, 2))
        np.testing.assert_allclose(mine, ref, atol=1e-5)


def test_alternet_sep_alt_sequence():
    """Seperate placement (reference AlterNet_SwinV2_FAN_Seperate.py:533):
    blocks−1 slots, SINGLE transformer blocks at every other slot from end."""
    from fr_tpu.models.alternet import alt_sequence_sep
    assert alt_sequence_sep(14, 7) == [False, True] * 7
    assert alt_sequence_sep(4, 1) == [False, False, True]
    assert alt_sequence_sep(6, 3) == [False, True] * 2 + [False, True]


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_alternet_sep50_param_count_matches_reference():
    """The Seperate AlterNet50 is a distinct network ([3,4,14,3]/[0,1,7,2],
    reference nets/AlterNet_SwinV2_FAN_Seperate.py:600-613) — check total
    trainable parameter count matches the torch module exactly."""
    add_reference_to_path()
    import timm_shim
    timm_shim.install()
    import torch
    from nets.AlterNet_SwinV2_FAN_Seperate import AlterNet50 as RefSep50

    from fr_tpu.configs.base import Config
    from fr_tpu.models.alternet import build_alternet_sep

    torch.manual_seed(0)
    ref = RefSep50(Config(emd_size=512))
    # The reference constructs norm1 in every transformer block but only uses
    # it on channel change (reference :252-260); with dim == dim_out in all
    # plans those BN params are dead — exclude them from the count.
    from nets.AlterNet_SwinV2_FAN_Seperate import (
        SwinTransformerBlock as RefBlock)
    dead = sum(p.numel() for mod in ref.modules()
               if isinstance(mod, RefBlock) and len(mod.shortcut) == 0
               for p in mod.norm1.parameters())
    ref_n = sum(p.numel() for p in ref.parameters()) - dead

    conf = Config(network="AlterNetSep50", emd_size=512,
                  mixed_precision=False, img_size=112)
    enc = build_alternet_sep(conf)
    variables = enc.init(jax.random.key(0),
                         jnp.zeros((1, 112, 112, 3), jnp.float32), train=False)
    ours_n = sum(int(np.prod(p.shape))
                 for p in jax.tree.leaves(variables["params"]))
    assert ours_n == ref_n, (ours_n, ref_n)


def test_alternet_sep_forward_shape():
    from fr_tpu.configs.base import Config
    from fr_tpu.models.alternet import build_alternet_sep

    conf = Config(network="AlterNetSep18", emd_size=64,
                  mixed_precision=False, img_size=112)
    enc = build_alternet_sep(conf)
    x = jnp.zeros((2, 112, 112, 3), jnp.float32)
    variables = enc.init(jax.random.key(0), x, train=False)
    out = enc.apply(variables, x, train=False)
    assert out.shape == (2, 64)


def test_depthwise_taps_matches_lax_conv():
    """DepthwiseTaps (9 explicit shifted multiply-adds; measured NEGATIVE
    on v5e, kept as the documented experiment — ROUND3_NOTES.md) matches the
    lax depthwise conv for the same params, stride 1 and 2, and shares the
    exact parameter tree (checkpoint-interchangeable)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from fr_tpu.models.effialternet import MBConv

    rng = np.random.default_rng(0)
    for stride in (1, 2):
        x = jnp.asarray(rng.standard_normal((2, 14, 14, 8)).astype(np.float32))
        m_tap = MBConv(8, 8, stride, 4, True, dw_taps=True)
        m_lax = MBConv(8, 8, stride, 4, True, dw_taps=False)
        v = m_tap.init(jax.random.key(0), x, train=False)
        assert (jax.tree.structure(v) ==
                jax.tree.structure(m_lax.init(jax.random.key(0), x,
                                              train=False)))
        ya = m_tap.apply(v, x, train=False)
        yb = m_lax.apply(v, x, train=False)
        # tap-sum order differs from the conv emitter's accumulation order
        np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                                   rtol=1e-4, atol=1e-5)

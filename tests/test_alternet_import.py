"""Full-model AlterNet50 weight transfer from the torch reference: structure
match + numerical output parity (the reference's train.sh trains AlterNet50,
so its checkpoints are the realistic migration artifact)."""

import numpy as np
import pytest

from conftest import add_reference_to_path, reference_available

import jax
import jax.numpy as jnp

from fr_tpu.configs.base import Config
from fr_tpu.models.alternet import build_alternet
from fr_tpu.utils.torch_import import alternet_from_torch


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_alternet50_transfer_matches_reference():
    add_reference_to_path()
    import timm_shim
    timm_shim.install()
    import torch
    from nets.AlterNet_SwinV2_FAN import AlterNet50 as RefAlterNet50

    torch.manual_seed(0)
    ref = RefAlterNet50(Config(emd_size=512, img_size=192))
    ref.eval()

    conf = Config(network="AlterNet50", emd_size=512, img_size=192,
                  mixed_precision=False)
    enc = build_alternet(conf)
    params, stats = alternet_from_torch(ref.state_dict(), "AlterNet50")

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 3, 192, 192)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.tensor(x)).numpy()

    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    init_vars = jax.eval_shape(
        lambda: enc.init(jax.random.key(0), x_nhwc, train=False))
    assert (jax.tree.structure(jax.tree.map(np.asarray, params))
            == jax.tree.structure(init_vars["params"]))

    out = enc.apply({"params": params, "batch_stats": stats},
                    x_nhwc, train=False)
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=2e-2, atol=2e-2)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_effialternet_transfer_matches_reference():
    """Tiny custom cfg with a FAN transformer stage exercises MBConv(±SE),
    SELayer, WindowAttention and ChannelProcessing transfer."""
    add_reference_to_path()
    import timm_shim
    timm_shim.install()
    import torch
    from nets.EffiAlterNet_SwinV2_FAN import EffNetV2 as RefEffNetV2

    from fr_tpu.models.effialternet import EffNetV2
    from fr_tpu.utils.torch_import import effialternet_from_torch

    cfgs = [
        [1, 16, 2, 1, 0, 0, 2],
        [2, 24, 2, 2, 1, 0, 2],
        [2, 32, 3, 2, 1, 1, 4],
    ]
    torch.manual_seed(2)
    ref = RefEffNetV2([list(c) for c in cfgs], n_classes=32,
                      input_resolution=(56, 56))
    ref.eval()

    enc = EffNetV2(cfgs=cfgs, img_size=56, emd_size=32)
    params, stats = effialternet_from_torch(ref.state_dict(), cfgs,
                                            img_size=56)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.tensor(x)).numpy()
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    init_vars = jax.eval_shape(
        lambda: enc.init(jax.random.key(0), x_nhwc, train=False))
    assert (jax.tree.structure(jax.tree.map(np.asarray, params))
            == jax.tree.structure(init_vars["params"]))
    out = enc.apply({"params": params, "batch_stats": stats},
                    x_nhwc, train=False)
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=2e-2, atol=2e-2)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_swin34_transfer_matches_reference():
    add_reference_to_path()
    import timm_shim
    timm_shim.install()
    import torch
    from nets.SwinV2 import Swin34 as RefSwin34

    from fr_tpu.models.swinv2 import build_swin
    from fr_tpu.utils.torch_import import swin_from_torch

    torch.manual_seed(1)
    ref = RefSwin34(Config(emd_size=512))
    ref.eval()

    conf = Config(network="Swin34", emd_size=512, mixed_precision=False)
    enc = build_swin(conf)
    params, stats = swin_from_torch(ref.state_dict(), "Swin34")

    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 3, 112, 112)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.tensor(x)).numpy()

    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    init_vars = jax.eval_shape(
        lambda: enc.init(jax.random.key(0), x_nhwc, train=False))
    assert (jax.tree.structure(jax.tree.map(np.asarray, params))
            == jax.tree.structure(init_vars["params"]))

    out = enc.apply({"params": params, "batch_stats": stats},
                    x_nhwc, train=False)
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=2e-2, atol=2e-2)

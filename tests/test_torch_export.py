"""Encoder export to reference .pth (VERDICT round-2 #6 / missing #4):
import a fresh reference state dict, export it back, and require the full
state dict — parameters AND registered buffers (relative_coords_table /
relative_position_index / attn_mask / num_batches_tracked) — to round-trip
bit-equal, plus a strict load into a fresh reference model (the reference's
weight-transfer path is load_state_dict(strict=True),
model/FR_PartialFC.py:76-90)."""

import numpy as np
import pytest

from conftest import add_reference_to_path, reference_available

from fr_tpu.configs.base import Config

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference not mounted")


def _roundtrip(ref_model, network, import_fn, export_fn):
    import torch

    sd_ref = ref_model.state_dict()
    params, stats = import_fn(sd_ref)
    sd_exp = export_fn(params, stats)

    # exact key set (strict-load precondition)
    assert set(sd_exp) == set(sd_ref), (
        sorted(set(sd_ref) - set(sd_exp))[:5],
        sorted(set(sd_exp) - set(sd_ref))[:5])

    # bit-equal values, buffers included
    for k in sd_ref:
        a = sd_ref[k].detach().cpu().numpy()
        b = sd_exp[k].detach().cpu().numpy()
        assert a.dtype == b.dtype, (k, a.dtype, b.dtype)
        np.testing.assert_array_equal(a, b, err_msg=k)

    # the reference's actual transfer path
    missing, unexpected = ref_model.load_state_dict(sd_exp, strict=True)
    assert not missing and not unexpected

    # re-import the export → identical trees
    params2, stats2 = import_fn(sd_exp)
    for t1, t2 in ((params, params2), (stats, stats2)):
        import jax
        leaves1, treedef1 = jax.tree.flatten(t1)
        leaves2, treedef2 = jax.tree.flatten(t2)
        assert treedef1 == treedef2
        for l1, l2 in zip(leaves1, leaves2):
            np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    _ = torch  # keep the import local to reference-gated tests


def test_resnet18_pth_roundtrip():
    add_reference_to_path()
    import torch
    from nets.resnet import ResNet18 as RefResNet18

    from fr_tpu.utils.torch_export import resnet_to_torch
    from fr_tpu.utils.torch_import import resnet_from_torch

    torch.manual_seed(0)
    ref = RefResNet18(Config(emd_size=512))
    ref.eval()
    _roundtrip(ref, "ResNet18",
               lambda sd: resnet_from_torch(sd, "ResNet18"),
               lambda p, s: resnet_to_torch(p, s, "ResNet18"))


def test_alternet50_pth_roundtrip():
    # AlterNet50: the reference's own train.sh workload, and the only
    # AlterNet depth its constructibility assert admits
    # (reference nets/AlterNet_SwinV2_FAN.py:706)
    add_reference_to_path()
    import timm_shim
    timm_shim.install()
    import torch
    from nets.AlterNet_SwinV2_FAN import AlterNet50 as RefAlterNet50

    from fr_tpu.utils.torch_export import alternet_to_torch
    from fr_tpu.utils.torch_import import alternet_from_torch

    torch.manual_seed(0)
    ref = RefAlterNet50(Config(emd_size=512, img_size=192))
    ref.eval()
    _roundtrip(ref, "AlterNet50",
               lambda sd: alternet_from_torch(sd, "AlterNet50"),
               lambda p, s: alternet_to_torch(p, s, "AlterNet50",
                                              img_size=192))


def test_swin34_pth_roundtrip():
    add_reference_to_path()
    import timm_shim
    timm_shim.install()
    import torch
    from nets.SwinV2 import Swin34 as RefSwin34

    from fr_tpu.utils.torch_export import swin_to_torch
    from fr_tpu.utils.torch_import import swin_from_torch

    torch.manual_seed(1)
    ref = RefSwin34(Config(emd_size=512))
    ref.eval()
    _roundtrip(ref, "Swin34",
               lambda sd: swin_from_torch(sd, "Swin34"),
               lambda p, s: swin_to_torch(p, s, "Swin34"))


def test_effialternet_pth_roundtrip():
    add_reference_to_path()
    import timm_shim
    timm_shim.install()
    import torch
    from nets.EffiAlterNet_SwinV2_FAN import EffNetV2 as RefEffNetV2

    from fr_tpu.utils.torch_export import effialternet_to_torch
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
    _roundtrip(ref, "EffiAlter",
               lambda sd: effialternet_from_torch(sd, cfgs, img_size=56),
               lambda p, s: effialternet_to_torch(p, s, cfgs, img_size=56))


def test_export_encoder_pth_file_roundtrip(tmp_path):
    """export_encoder_pth writes the reference snapshot schema
    {model_state_dict, epoch, name} (reference utils/trainer.py:107-115) and
    load_reference_checkpoint reads it back."""
    add_reference_to_path()
    import torch
    from nets.resnet import ResNet18 as RefResNet18

    import jax
    from fr_tpu.utils.torch_export import export_encoder_pth
    from fr_tpu.utils.torch_import import (load_reference_checkpoint,
                                           resnet_from_torch)

    torch.manual_seed(3)
    ref = RefResNet18(Config(emd_size=512))
    params, stats = resnet_from_torch(ref.state_dict(), "ResNet18")

    path = str(tmp_path / "5_epoch_encoder.pth")
    export_encoder_pth(path, params, stats, "ResNet18", epoch=4)

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    assert set(ckpt) == {"model_state_dict", "epoch", "name"}
    assert ckpt["epoch"] == 4 and ckpt["name"] == "ResNet18"

    params2, stats2 = load_reference_checkpoint(path, "ResNet18")
    for t1, t2 in ((params, params2), (stats, stats2)):
        for l1, l2 in zip(jax.tree.leaves(t1), jax.tree.leaves(t2)):
            np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))

"""Export fr_tpu flax encoder params to reference (torch) checkpoints.

The exact inverse of fr_tpu/utils/torch_import.py: maps our flax parameter
trees back onto the reference's state-dict naming so an fr_tpu-trained
encoder can be loaded by the torch reference's weight-transfer path
(reference model/FR_PartialFC.py:76-90, `load_state_dict(..., strict=True)`
over `{model_state_dict, epoch, name}` snapshots written by
utils/trainer.py:107-115) for independent cross-framework accuracy checks.

Because the reference loads strictly, the export must contain every key of
`encoder.state_dict()` — including the registered BUFFERS the import path
never reads (they are deterministic functions of the architecture):
  * per-attention `relative_coords_table` / `relative_position_index`
    (reference nets/AlterNet_SwinV2_FAN.py:234,247) — regenerated with the
    same fr_tpu code the models trace (models/swin_common.py);
  * per-shifted-block `attn_mask` (reference :405) — regenerated with
    shifted_window_mask over the reference's resolution bookkeeping;
  * per-BN `num_batches_tracked` — exported as 0 (fr_tpu BN keeps no batch
    counter; torch only consumes it for momentum=None schedules, which the
    reference never uses).

Conventions (inverse of torch_import):
- flax conv kernel (kh, kw, I, O) → torch conv weight (O, I, kh, kw)
- flax dense kernel (I, O) → torch linear weight (O, I)
- flax BN scale/bias + batch_stats mean/var → torch weight/bias/running_*
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from fr_tpu.models.resnet import RESNET_LAYERS


def _n(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _torch():
    import torch
    return torch


def _conv_out(sd, name, tree):
    sd[f"{name}.weight"] = _torch().from_numpy(
        np.transpose(_n(tree["kernel"]), (3, 2, 0, 1)).copy())
    if "bias" in tree:
        sd[f"{name}.bias"] = _torch().from_numpy(_n(tree["bias"]).copy())


def _bn_out(sd, name, params, stats):
    torch = _torch()
    sd[f"{name}.weight"] = torch.from_numpy(_n(params["scale"]).copy())
    sd[f"{name}.bias"] = torch.from_numpy(_n(params["bias"]).copy())
    sd[f"{name}.running_mean"] = torch.from_numpy(_n(stats["mean"]).copy())
    sd[f"{name}.running_var"] = torch.from_numpy(_n(stats["var"]).copy())
    sd[f"{name}.num_batches_tracked"] = torch.tensor(0, dtype=torch.long)


def _linear_out(sd, name, tree):
    torch = _torch()
    sd[f"{name}.weight"] = torch.from_numpy(
        np.transpose(_n(tree["kernel"])).copy())
    if "bias" in tree:
        sd[f"{name}.bias"] = torch.from_numpy(_n(tree["bias"]).copy())


def _swin_attn_out(sd, prefix: str, tree: Mapping[str, Any],
                   window: int) -> None:
    """Inverse of torch_import._swin_attn + the two deterministic buffers."""
    from fr_tpu.models.swin_common import (relative_coords_table,
                                           relative_position_index)
    torch = _torch()
    sd[f"{prefix}.qkv.weight"] = torch.from_numpy(
        np.transpose(_n(tree["qkv_kernel"])).copy())
    sd[f"{prefix}.q_bias"] = torch.from_numpy(_n(tree["q_bias"]).copy())
    sd[f"{prefix}.v_bias"] = torch.from_numpy(_n(tree["v_bias"]).copy())
    sd[f"{prefix}.logit_scale"] = torch.from_numpy(
        _n(tree["logit_scale"]).copy())
    _linear_out(sd, f"{prefix}.cpb_mlp.0", tree["cpb_fc1"])
    _linear_out(sd, f"{prefix}.cpb_mlp.2", tree["cpb_fc2"])
    _linear_out(sd, f"{prefix}.proj", tree["proj"])
    sd[f"{prefix}.relative_coords_table"] = torch.from_numpy(
        relative_coords_table((window, window)).copy())
    sd[f"{prefix}.relative_position_index"] = torch.from_numpy(
        relative_position_index((window, window)).astype(np.int64))


def _attn_mask_out(sd, prefix: str, res: int, window: int,
                   shift: int) -> None:
    from fr_tpu.models.swin_common import shifted_window_mask
    sd[f"{prefix}.attn_mask"] = _torch().from_numpy(
        shifted_window_mask(res, res, window, shift).copy())


def _wrapped_bn(tree) -> Dict:
    return tree["BatchNorm_0"]


def resnet_to_torch(params: Mapping, stats: Mapping, network: str
                    ) -> Dict[str, Any]:
    """Inverse of torch_import.resnet_from_torch."""
    layers = RESNET_LAYERS[network]
    sd: Dict[str, Any] = {}

    def get_bn(sd_name, flax_name):
        _bn_out(sd, sd_name, _wrapped_bn(params[flax_name]),
                _wrapped_bn(stats[flax_name]))

    _conv_out(sd, "conv1", params["Conv_0"]["Conv_0"])
    get_bn("bn1", "BatchNorm_0")

    block_i = 0
    for stage, blocks in enumerate(layers, start=1):
        for b in range(blocks):
            tb = f"layer{stage}.{b}"
            bp = params[f"BasicBlock_{block_i}"]
            bs = stats[f"BasicBlock_{block_i}"]
            _conv_out(sd, f"{tb}.conv1", bp["Conv_0"]["Conv_0"])
            _conv_out(sd, f"{tb}.conv2", bp["Conv_1"]["Conv_0"])
            _bn_out(sd, f"{tb}.bn1", _wrapped_bn(bp["BatchNorm_0"]),
                    _wrapped_bn(bs["BatchNorm_0"]))
            _bn_out(sd, f"{tb}.bn2", _wrapped_bn(bp["BatchNorm_1"]),
                    _wrapped_bn(bs["BatchNorm_1"]))
            if "Conv_2" in bp:
                _conv_out(sd, f"{tb}.downsample.0", bp["Conv_2"]["Conv_0"])
                _bn_out(sd, f"{tb}.downsample.1",
                        _wrapped_bn(bp["BatchNorm_2"]),
                        _wrapped_bn(bs["BatchNorm_2"]))
            block_i += 1

    get_bn("bn2", "BatchNorm_1")
    _linear_out(sd, "fc", params["Dense_0"]["Dense_0"])
    get_bn("bn3", "BatchNorm_2")
    return sd


def alternet_to_torch(params: Mapping, stats: Mapping, network: str,
                      img_size: int = 192) -> Dict[str, Any]:
    """Inverse of torch_import.alternet_from_torch (reference
    nets/AlterNet_SwinV2_FAN.py naming + buffers)."""
    from fr_tpu.models.alternet import ALTERNET_PLANS, alt_sequence

    num_blocks, num_blocks2, _ = ALTERNET_PLANS[network]
    sd: Dict[str, Any] = {}

    def get_bn(sd_name, flax_name):
        _bn_out(sd, sd_name, _wrapped_bn(params[flax_name]),
                _wrapped_bn(stats[flax_name]))

    _conv_out(sd, "conv1", params["Conv_0"]["Conv_0"])
    get_bn("bn1", "BatchNorm_0")

    basic_i = 0
    swin_i = 0
    res = img_size // 4        # stem stride-2 conv + maxpool (reference :656)
    windows = (6, 6, 6, 3)
    for stage, (blocks, blocks2, win) in enumerate(
            zip(num_blocks, num_blocks2, windows), start=1):
        if stage > 1:
            res //= 2
        k = 0

        def put_basic(tb):
            nonlocal basic_i
            bp = params[f"BasicBlock_{basic_i}"]
            bs = stats[f"BasicBlock_{basic_i}"]
            _conv_out(sd, f"{tb}.conv1", bp["Conv_0"]["Conv_0"])
            _conv_out(sd, f"{tb}.conv2", bp["Conv_1"]["Conv_0"])
            _bn_out(sd, f"{tb}.bn1", _wrapped_bn(bp["BatchNorm_0"]),
                    _wrapped_bn(bs["BatchNorm_0"]))
            _bn_out(sd, f"{tb}.bn2", _wrapped_bn(bp["BatchNorm_1"]),
                    _wrapped_bn(bs["BatchNorm_1"]))
            if "Conv_2" in bp:
                _conv_out(sd, f"{tb}.downsample.0", bp["Conv_2"]["Conv_0"])
                _bn_out(sd, f"{tb}.downsample.1",
                        _wrapped_bn(bp["BatchNorm_2"]),
                        _wrapped_bn(bs["BatchNorm_2"]))
            basic_i += 1

        def put_swin(tb, shift):
            nonlocal swin_i
            bp = params[f"AlterSwinBlock_{swin_i}"]
            bs = stats[f"AlterSwinBlock_{swin_i}"]
            _swin_attn_out(sd, f"{tb}.attn", bp["WindowAttention_0"], win)
            _bn_out(sd, f"{tb}.norm2", _wrapped_bn(bp["BatchNorm_0"]),
                    _wrapped_bn(bs["BatchNorm_0"]))
            if shift > 0:
                _attn_mask_out(sd, tb, res, win, shift)
            swin_i += 1

        put_basic(f"layer{stage}.{k}"); k += 1
        for is_alt in alt_sequence(blocks, blocks2):
            if not is_alt:
                put_basic(f"layer{stage}.{k}"); k += 1
            else:
                put_swin(f"layer{stage}.{k}", 0); k += 1
                put_swin(f"layer{stage}.{k}", win // 2); k += 1

    get_bn("bn2", "BatchNorm_1")
    _linear_out(sd, "fc", params["Dense_0"]["Dense_0"])
    get_bn("bn3", "BatchNorm_2")
    return sd


def swin_to_torch(params: Mapping, stats: Mapping, network: str
                  ) -> Dict[str, Any]:
    """Inverse of torch_import.swin_from_torch (reference nets/SwinV2.py;
    all live blocks are unshifted → no attn_mask buffers)."""
    from fr_tpu.models.swinv2 import SWIN_PLANS

    num_blocks, _ = SWIN_PLANS[network]
    sd: Dict[str, Any] = {}

    def get_bn(sd_name, flax_name):
        _bn_out(sd, sd_name, _wrapped_bn(params[flax_name]),
                _wrapped_bn(stats[flax_name]))

    _conv_out(sd, "conv1", params["Conv_0"]["Conv_0"])
    get_bn("bn1", "BatchNorm_0")

    conv_i = 1
    block_i = 0
    strides = (1, 2, 2, 2)
    window = 7
    for stage, (blocks, stride) in enumerate(zip(num_blocks, strides),
                                             start=1):
        k = 0
        if stride > 1:
            _conv_out(sd, f"layer{stage}.{k}",
                      params[f"Conv_{conv_i}"]["Conv_0"])
            conv_i += 1
            k += 1
        for _ in range(blocks):
            tb = f"layer{stage}.{k}"
            bp = params[f"SwinBlock_{block_i}"]
            bs = stats[f"SwinBlock_{block_i}"]
            _swin_attn_out(sd, f"{tb}.attn", bp["WindowAttention_0"], window)
            _conv_out(sd, f"{tb}.mlp.fc1", bp["Conv_0"]["Conv_0"])
            _conv_out(sd, f"{tb}.mlp.fc2", bp["Conv_1"]["Conv_0"])
            _bn_out(sd, f"{tb}.norm2", _wrapped_bn(bp["BatchNorm_0"]),
                    _wrapped_bn(bs["BatchNorm_0"]))
            _bn_out(sd, f"{tb}.norm3", _wrapped_bn(bp["BatchNorm_1"]),
                    _wrapped_bn(bs["BatchNorm_1"]))
            block_i += 1
            k += 1

    get_bn("bn2", "BatchNorm_1")
    _linear_out(sd, "fc", params["Dense_0"]["Dense_0"])
    get_bn("bn3", "BatchNorm_2")
    return sd


def effialternet_to_torch(params: Mapping, stats: Mapping, cfgs,
                          img_size: int = 112) -> Dict[str, Any]:
    """Inverse of torch_import.effialternet_from_torch (reference
    nets/EffiAlterNet_SwinV2_FAN.py naming + buffers)."""
    torch = _torch()
    sd: Dict[str, Any] = {}

    bn_i = 0
    mb_i = 0
    fan_i = 0

    def get_top_bn(torch_name):
        nonlocal bn_i
        _bn_out(sd, torch_name, _wrapped_bn(params[f"BatchNorm_{bn_i}"]),
                _wrapped_bn(stats[f"BatchNorm_{bn_i}"]))
        bn_i += 1

    _conv_out(sd, "features.0.0", params["EConv_0"]["Conv_0"])
    get_top_bn("features.0.1")

    k = 1

    def put_mbconv(tb, use_se):
        nonlocal mb_i
        bp = params[f"MBConv_{mb_i}"]
        bs = stats[f"MBConv_{mb_i}"]

        def bn_from(name, torch_name):
            _bn_out(sd, torch_name, _wrapped_bn(bp[name]),
                    _wrapped_bn(bs[name]))

        if use_se:
            _conv_out(sd, f"{tb}.conv.0", bp["EConv_0"]["Conv_0"])
            bn_from("BatchNorm_0", f"{tb}.conv.1")
            _conv_out(sd, f"{tb}.conv.3", bp["EConv_1"]["Conv_0"])
            bn_from("BatchNorm_1", f"{tb}.conv.4")
            _linear_out(sd, f"{tb}.conv.6.fc.0", bp["SELayer_0"]["Dense_0"])
            _linear_out(sd, f"{tb}.conv.6.fc.2", bp["SELayer_0"]["Dense_1"])
            _conv_out(sd, f"{tb}.conv.7", bp["EConv_2"]["Conv_0"])
            bn_from("BatchNorm_2", f"{tb}.conv.8")
        else:
            _conv_out(sd, f"{tb}.conv.0", bp["EConv_0"]["Conv_0"])
            bn_from("BatchNorm_0", f"{tb}.conv.1")
            _conv_out(sd, f"{tb}.conv.3", bp["EConv_1"]["Conv_0"])
            bn_from("BatchNorm_1", f"{tb}.conv.4")
        mb_i += 1

    window = 7

    def put_fan(tb, res, shift):
        nonlocal fan_i
        bp = params[f"FANSwinBlock_{fan_i}"]
        bs = stats[f"FANSwinBlock_{fan_i}"]
        _swin_attn_out(sd, f"{tb}.attn", bp["WindowAttention_0"], window)
        cp = bp["ChannelProcessing_0"]
        _linear_out(sd, f"{tb}.chnnel_processing.qv", cp["Dense_0"])
        sd[f"{tb}.chnnel_processing.temperature"] = torch.from_numpy(
            _n(cp["temperature"]).copy())
        _bn_out(sd, f"{tb}.norm2", _wrapped_bn(bp["BatchNorm_0"]),
                _wrapped_bn(bs["BatchNorm_0"]))
        _bn_out(sd, f"{tb}.norm3", _wrapped_bn(bp["BatchNorm_1"]),
                _wrapped_bn(bs["BatchNorm_1"]))
        if shift > 0:
            _attn_mask_out(sd, tb, res, window, shift)
        fan_i += 1

    res = img_size
    for t, c, n, s_, use_se, n_tr, heads in cfgs:
        if res > window:
            nb = 2 * (n // 3) + (n % 3) - 1
        else:
            nb = n - 1
        seq = [False] * nb
        for i in range(n_tr):
            seq[-2 * i - 1] = True

        put_mbconv(f"features.{k}", bool(use_se)); k += 1
        for is_alt in seq:
            if not is_alt:
                put_mbconv(f"features.{k}", bool(use_se)); k += 1
            else:
                put_fan(f"features.{k}", res, 0); k += 1
                if res > window:
                    put_fan(f"features.{k}", res, window // 2); k += 1
        res //= 2

    _linear_out(sd, "fc", params["Dense_0"])
    get_top_bn("bn")
    return sd


def encoder_to_torch_state_dict(params: Mapping, stats: Mapping,
                                network: str, img_size: int = None
                                ) -> Dict[str, Any]:
    """Dispatch by network substring, mirroring the reference's encoder
    dispatch (reference model/FR_PartialFC.py:62-72) and
    torch_import.load_reference_checkpoint."""
    if "ResNet" in network:
        return resnet_to_torch(params, stats, network)
    if "AlterNet" in network and "V1" not in network and "Sep" not in network:
        return alternet_to_torch(params, stats, network,
                                 img_size=img_size or 192)
    if "Swin" in network:
        return swin_to_torch(params, stats, network)
    if "EffiAlter" in network:
        from fr_tpu.models.effialternet import EFFIALTER_CFGS
        return effialternet_to_torch(params, stats, EFFIALTER_CFGS[network],
                                     img_size=img_size or 112)
    raise NotImplementedError(
        f"reference checkpoint export not implemented for {network}")


def export_encoder_pth(path: str, params: Mapping, stats: Mapping,
                       network: str, epoch: int = 0,
                       img_size: int = None) -> None:
    """Write a reference-loadable `{model_state_dict, epoch, name}` snapshot
    (the exact schema of reference utils/trainer.py:107-115) so the torch
    reference can evaluate an fr_tpu-trained encoder."""
    torch = _torch()
    sd = encoder_to_torch_state_dict(params, stats, network, img_size)
    torch.save({"model_state_dict": sd, "epoch": epoch, "name": network},
               path)

"""Import reference (torch) checkpoints into fr_tpu flax params.

The reference saves encoder-only checkpoints `{model_state_dict, epoch, name}`
with an optional DDP 'module.' prefix (reference utils/trainer.py:107-115,
model/FR_PartialFC.py:76-90). This module maps those state dicts onto our
flax ResNet parameter tree so reference-trained encoders can be evaluated or
fine-tuned in fr_tpu, and doubles as the numerical-parity bridge in tests.

Conventions:
- torch conv weight (O, I, kh, kw) → flax kernel (kh, kw, I, O)
- torch linear weight (O, I) → flax kernel (I, O)
- torch BN weight/bias/running_mean/running_var → flax scale/bias + batch_stats
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

from fr_tpu.models.resnet import RESNET_LAYERS


def strip_module_prefix(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Remove the DDP 'module.' prefix (reference model/FR_PartialFC.py:80-88)."""
    return {(k[7:] if k.startswith("module.") else k): v
            for k, v in state_dict.items()}


def _t2n(t) -> np.ndarray:
    if hasattr(t, "detach"):
        # .copy(): .numpy() returns a VIEW sharing storage with the live
        # tensor — without it, in-place mutation of the source model (e.g.
        # opt.step() in a parity test that keeps training the torch side)
        # silently rewrites the "imported" weights.
        return t.detach().cpu().numpy().copy()
    return np.asarray(t)


def _conv(sd, name):
    return {"kernel": np.transpose(_t2n(sd[f"{name}.weight"]), (2, 3, 1, 0))}


def _bn(sd, name) -> Tuple[Dict, Dict]:
    params = {"scale": _t2n(sd[f"{name}.weight"]),
              "bias": _t2n(sd[f"{name}.bias"])}
    stats = {"mean": _t2n(sd[f"{name}.running_mean"]),
             "var": _t2n(sd[f"{name}.running_var"])}
    return params, stats


def _linear(sd, name):
    return {"kernel": np.transpose(_t2n(sd[f"{name}.weight"])),
            "bias": _t2n(sd[f"{name}.bias"])}


def resnet_from_torch(state_dict: Mapping[str, Any], network: str
                      ) -> Tuple[Dict, Dict]:
    """Map a reference nets/resnet.py state_dict to (params, batch_stats) for
    fr_tpu.models.resnet.ResNet."""
    sd = strip_module_prefix(state_dict)
    layers = RESNET_LAYERS[network]

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put_bn(flax_name, torch_name):
        p, s = _bn(sd, torch_name)
        # our BatchNorm wrapper adds one module level
        params[flax_name] = {"BatchNorm_0": p}
        stats[flax_name] = {"BatchNorm_0": s}

    params["Conv_0"] = {"Conv_0": _conv(sd, "conv1")}
    put_bn("BatchNorm_0", "bn1")

    block_i = 0
    for stage, blocks in enumerate(layers, start=1):
        for b in range(blocks):
            tb = f"layer{stage}.{b}"
            bp: Dict[str, Any] = {
                "Conv_0": {"Conv_0": _conv(sd, f"{tb}.conv1")},
                "Conv_1": {"Conv_0": _conv(sd, f"{tb}.conv2")},
            }
            bs: Dict[str, Any] = {}
            p, s = _bn(sd, f"{tb}.bn1")
            bp["BatchNorm_0"] = {"BatchNorm_0": p}
            bs["BatchNorm_0"] = {"BatchNorm_0": s}
            p, s = _bn(sd, f"{tb}.bn2")
            bp["BatchNorm_1"] = {"BatchNorm_0": p}
            bs["BatchNorm_1"] = {"BatchNorm_0": s}
            if f"{tb}.downsample.0.weight" in sd:
                bp["Conv_2"] = {"Conv_0": _conv(sd, f"{tb}.downsample.0")}
                p, s = _bn(sd, f"{tb}.downsample.1")
                bp["BatchNorm_2"] = {"BatchNorm_0": p}
                bs["BatchNorm_2"] = {"BatchNorm_0": s}
            params[f"BasicBlock_{block_i}"] = bp
            stats[f"BasicBlock_{block_i}"] = bs
            block_i += 1

    put_bn("BatchNorm_1", "bn2")
    params["Dense_0"] = {"Dense_0": _linear(sd, "fc")}
    put_bn("BatchNorm_2", "bn3")
    return params, stats


def _swin_attn(sd, prefix: str) -> Dict:
    """WindowAttention params (reference nets/AlterNet_SwinV2_FAN.py:187-302)
    → fr_tpu.models.swin_common.WindowAttention tree."""
    return {
        "qkv_kernel": np.transpose(_t2n(sd[f"{prefix}.qkv.weight"])),
        "q_bias": _t2n(sd[f"{prefix}.q_bias"]),
        "v_bias": _t2n(sd[f"{prefix}.v_bias"]),
        "logit_scale": _t2n(sd[f"{prefix}.logit_scale"]),
        "cpb_fc1": {"kernel": np.transpose(_t2n(sd[f"{prefix}.cpb_mlp.0.weight"])),
                    "bias": _t2n(sd[f"{prefix}.cpb_mlp.0.bias"])},
        "cpb_fc2": {"kernel": np.transpose(_t2n(sd[f"{prefix}.cpb_mlp.2.weight"]))},
        "proj": {"kernel": np.transpose(_t2n(sd[f"{prefix}.proj.weight"])),
                 "bias": _t2n(sd[f"{prefix}.proj.bias"])},
    }


def alternet_from_torch(state_dict: Mapping[str, Any], network: str
                        ) -> Tuple[Dict, Dict]:
    """Map a reference nets/AlterNet_SwinV2_FAN.py state_dict onto
    fr_tpu.models.alternet.AlterNet (params, batch_stats).

    Walks the stage plan in construction order: flax auto-names modules per
    type (BasicBlock_i / AlterSwinBlock_j), the reference names them
    layer{s}.{k}; both follow the same alt_seq placement
    (reference :704-729)."""
    from fr_tpu.models.alternet import ALTERNET_PLANS, alt_sequence

    sd = strip_module_prefix(state_dict)
    num_blocks, num_blocks2, _ = ALTERNET_PLANS[network]

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put_bn(flax_name, torch_name, into_p=params, into_s=stats):
        p, s = _bn(sd, torch_name)
        into_p[flax_name] = {"BatchNorm_0": p}
        into_s[flax_name] = {"BatchNorm_0": s}

    params["Conv_0"] = {"Conv_0": _conv(sd, "conv1")}
    put_bn("BatchNorm_0", "bn1")

    basic_i = 0
    swin_i = 0
    for stage, (blocks, blocks2) in enumerate(zip(num_blocks, num_blocks2),
                                              start=1):
        k = 0  # torch index within layer{stage}

        def put_basic(tb):
            nonlocal basic_i
            bp = {"Conv_0": {"Conv_0": _conv(sd, f"{tb}.conv1")},
                  "Conv_1": {"Conv_0": _conv(sd, f"{tb}.conv2")}}
            bs: Dict[str, Any] = {}
            p, s = _bn(sd, f"{tb}.bn1")
            bp["BatchNorm_0"] = {"BatchNorm_0": p}
            bs["BatchNorm_0"] = {"BatchNorm_0": s}
            p, s = _bn(sd, f"{tb}.bn2")
            bp["BatchNorm_1"] = {"BatchNorm_0": p}
            bs["BatchNorm_1"] = {"BatchNorm_0": s}
            if f"{tb}.downsample.0.weight" in sd:
                bp["Conv_2"] = {"Conv_0": _conv(sd, f"{tb}.downsample.0")}
                p, s = _bn(sd, f"{tb}.downsample.1")
                bp["BatchNorm_2"] = {"BatchNorm_0": p}
                bs["BatchNorm_2"] = {"BatchNorm_0": s}
            params[f"BasicBlock_{basic_i}"] = bp
            stats[f"BasicBlock_{basic_i}"] = bs
            basic_i += 1

        def put_swin(tb):
            nonlocal swin_i
            # dim == dim_out in every reference stage plan → no shortcut conv
            bp = {"WindowAttention_0": _swin_attn(sd, f"{tb}.attn")}
            bs: Dict[str, Any] = {}
            p, s = _bn(sd, f"{tb}.norm2")
            bp["BatchNorm_0"] = {"BatchNorm_0": p}
            bs["BatchNorm_0"] = {"BatchNorm_0": s}
            params[f"AlterSwinBlock_{swin_i}"] = bp
            stats[f"AlterSwinBlock_{swin_i}"] = bs
            swin_i += 1

        put_basic(f"layer{stage}.{k}"); k += 1
        for is_alt in alt_sequence(blocks, blocks2):
            if not is_alt:
                put_basic(f"layer{stage}.{k}"); k += 1
            else:
                put_swin(f"layer{stage}.{k}"); k += 1
                put_swin(f"layer{stage}.{k}"); k += 1

    put_bn("BatchNorm_1", "bn2")
    params["Dense_0"] = {"Dense_0": _linear(sd, "fc")}
    put_bn("BatchNorm_2", "bn3")
    return params, stats


def swin_from_torch(state_dict: Mapping[str, Any], network: str
                    ) -> Tuple[Dict, Dict]:
    """Map a reference nets/SwinV2.py state_dict onto
    fr_tpu.models.swinv2.Swin (params, batch_stats)."""
    from fr_tpu.models.swinv2 import SWIN_PLANS

    sd = strip_module_prefix(state_dict)
    num_blocks, _ = SWIN_PLANS[network]

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put_bn(flax_name, torch_name):
        p, s = _bn(sd, torch_name)
        params[flax_name] = {"BatchNorm_0": p}
        stats[flax_name] = {"BatchNorm_0": s}

    params["Conv_0"] = {"Conv_0": _conv(sd, "conv1")}
    put_bn("BatchNorm_0", "bn1")

    conv_i = 1   # flax top-level Conv counter (stem used Conv_0)
    block_i = 0
    strides = (1, 2, 2, 2)
    for stage, (blocks, stride) in enumerate(zip(num_blocks, strides),
                                             start=1):
        k = 0
        if stride > 1:  # downsample Conv2d(k=2,s=2) (reference :537-538)
            params[f"Conv_{conv_i}"] = {"Conv_0": _conv(sd, f"layer{stage}.{k}")}
            conv_i += 1
            k += 1
        for _ in range(blocks):
            tb = f"layer{stage}.{k}"
            bp: Dict[str, Any] = {
                "WindowAttention_0": _swin_attn(sd, f"{tb}.attn"),
                # conv-MLP fc1/fc2 are 1×1 convs with bias
                "Conv_0": {"Conv_0": {
                    "kernel": np.transpose(_t2n(sd[f"{tb}.mlp.fc1.weight"]),
                                           (2, 3, 1, 0)),
                    "bias": _t2n(sd[f"{tb}.mlp.fc1.bias"])}},
                "Conv_1": {"Conv_0": {
                    "kernel": np.transpose(_t2n(sd[f"{tb}.mlp.fc2.weight"]),
                                           (2, 3, 1, 0)),
                    "bias": _t2n(sd[f"{tb}.mlp.fc2.bias"])}},
            }
            bs: Dict[str, Any] = {}
            p, s = _bn(sd, f"{tb}.norm2")
            bp["BatchNorm_0"] = {"BatchNorm_0": p}
            bs["BatchNorm_0"] = {"BatchNorm_0": s}
            p, s = _bn(sd, f"{tb}.norm3")
            bp["BatchNorm_1"] = {"BatchNorm_0": p}
            bs["BatchNorm_1"] = {"BatchNorm_0": s}
            params[f"SwinBlock_{block_i}"] = bp
            stats[f"SwinBlock_{block_i}"] = bs
            block_i += 1
            k += 1

    put_bn("BatchNorm_1", "bn2")
    params["Dense_0"] = {"Dense_0": _linear(sd, "fc")}
    put_bn("BatchNorm_2", "bn3")
    return params, stats


def effialternet_from_torch(state_dict: Mapping[str, Any], cfgs,
                            img_size: int = 112, width_mult: float = 1.0
                            ) -> Tuple[Dict, Dict]:
    """Map a reference nets/EffiAlterNet_SwinV2_FAN.py EffNetV2 state_dict
    onto fr_tpu.models.effialternet.EffNetV2, walking the stage plan with the
    reference's resolution bookkeeping (which gates SW-MSA placement)."""
    from fr_tpu.models.effialternet import _make_divisible

    sd = strip_module_prefix(state_dict)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    econv_i = 0
    bn_i = 0
    mb_i = 0
    fan_i = 0

    def put_top_bn(torch_name):
        nonlocal bn_i
        p, s = _bn(sd, torch_name)
        params[f"BatchNorm_{bn_i}"] = {"BatchNorm_0": p}
        stats[f"BatchNorm_{bn_i}"] = {"BatchNorm_0": s}
        bn_i += 1

    # stem: features.0 = Sequential(conv, bn, silu)
    params["EConv_0"] = {"Conv_0": _conv(sd, "features.0.0")}
    econv_i = 1
    put_top_bn("features.0.1")

    k = 1  # torch features index

    def put_mbconv(tb, use_se):
        nonlocal mb_i
        # SE variant conv indices: 0 conv,1 bn,3 conv(dw),4 bn,6 SE,7 conv,8 bn
        # no-SE: 0 conv,1 bn,3 conv,4 bn
        bp: Dict[str, Any] = {}
        bs: Dict[str, Any] = {}

        def bn_into(name, torch_name):
            p, s = _bn(sd, torch_name)
            bp[name] = {"BatchNorm_0": p}
            bs[name] = {"BatchNorm_0": s}

        if use_se:
            bp["EConv_0"] = {"Conv_0": _conv(sd, f"{tb}.conv.0")}
            bn_into("BatchNorm_0", f"{tb}.conv.1")
            bp["EConv_1"] = {"Conv_0": _conv(sd, f"{tb}.conv.3")}
            bn_into("BatchNorm_1", f"{tb}.conv.4")
            bp["SELayer_0"] = {
                "Dense_0": _linear(sd, f"{tb}.conv.6.fc.0"),
                "Dense_1": _linear(sd, f"{tb}.conv.6.fc.2"),
            }
            bp["EConv_2"] = {"Conv_0": _conv(sd, f"{tb}.conv.7")}
            bn_into("BatchNorm_2", f"{tb}.conv.8")
        else:
            bp["EConv_0"] = {"Conv_0": _conv(sd, f"{tb}.conv.0")}
            bn_into("BatchNorm_0", f"{tb}.conv.1")
            bp["EConv_1"] = {"Conv_0": _conv(sd, f"{tb}.conv.3")}
            bn_into("BatchNorm_1", f"{tb}.conv.4")
        params[f"MBConv_{mb_i}"] = bp
        stats[f"MBConv_{mb_i}"] = bs
        mb_i += 1

    def put_fan(tb):
        nonlocal fan_i
        bp: Dict[str, Any] = {
            "WindowAttention_0": _swin_attn(sd, f"{tb}.attn"),
            "ChannelProcessing_0": {
                "Dense_0": {"kernel": np.transpose(
                    _t2n(sd[f"{tb}.chnnel_processing.qv.weight"])),
                    "bias": _t2n(sd[f"{tb}.chnnel_processing.qv.bias"])},
                "temperature": _t2n(sd[f"{tb}.chnnel_processing.temperature"]),
            },
        }
        bs: Dict[str, Any] = {}
        p, s = _bn(sd, f"{tb}.norm2")
        bp["BatchNorm_0"] = {"BatchNorm_0": p}
        bs["BatchNorm_0"] = {"BatchNorm_0": s}
        p, s = _bn(sd, f"{tb}.norm3")
        bp["BatchNorm_1"] = {"BatchNorm_0": p}
        bs["BatchNorm_1"] = {"BatchNorm_0": s}
        params[f"FANSwinBlock_{fan_i}"] = bp
        stats[f"FANSwinBlock_{fan_i}"] = bs
        fan_i += 1

    res = img_size
    window = 7
    for t, c, n, s_, use_se, n_tr, heads in cfgs:
        if res > window:
            num_blocks = 2 * (n // 3) + (n % 3) - 1
        else:
            num_blocks = n - 1
        seq = [False] * num_blocks
        for i in range(n_tr):
            seq[-2 * i - 1] = True

        put_mbconv(f"features.{k}", bool(use_se)); k += 1
        for is_alt in seq:
            if not is_alt:
                put_mbconv(f"features.{k}", bool(use_se)); k += 1
            else:
                put_fan(f"features.{k}"); k += 1
                if res > window:
                    put_fan(f"features.{k}"); k += 1
        res //= 2

    params["Dense_0"] = _linear(sd, "fc")
    put_top_bn("bn")
    return params, stats


def load_reference_checkpoint(path: str, network: str) -> Tuple[Dict, Dict]:
    """Load a reference `{epoch}_epoch_encoder.pth` checkpoint
    (reference utils/trainer.py:111-115)."""
    import torch  # CPU torch, used only for deserialisation
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state_dict", ckpt)
    if "ResNet" in network:
        return resnet_from_torch(sd, network)
    if "AlterNet" in network and "V1" not in network:
        return alternet_from_torch(sd, network)
    if "Swin" in network:
        return swin_from_torch(sd, network)
    if "EffiAlter" in network:
        from fr_tpu.models.effialternet import EFFIALTER_CFGS
        return effialternet_from_torch(sd, EFFIALTER_CFGS[network])
    raise NotImplementedError(
        f"reference checkpoint import not implemented for {network}")

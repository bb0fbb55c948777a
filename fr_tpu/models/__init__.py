"""Encoder dispatch by conf.network substring (reference model/FR_PartialFC.py:62-72)."""

from fr_tpu.models.resnet import ResNet, build_resnet  # noqa: F401


def build_encoder(conf):
    name = conf.network
    if "EffiAlter" in name:
        from fr_tpu.models.effialternet import build_effialternet
        return build_effialternet(conf)
    if "AlterNetV1" in name:
        from fr_tpu.models.alternet_v1 import build_alternet_v1
        return build_alternet_v1(conf)
    if "AlterNetSep" in name:
        from fr_tpu.models.alternet import build_alternet_sep
        return build_alternet_sep(conf)
    if "AlterNet" in name:
        from fr_tpu.models.alternet import build_alternet
        return build_alternet(conf)
    if "Swin" in name:
        from fr_tpu.models.swinv2 import build_swin
        return build_swin(conf)
    if "ResNet" in name:
        return build_resnet(conf)
    raise ValueError(f"Unknown network {conf.network!r}")

"""Model zoo: backbones, VPR encoders, matchers, detector.

Heavy modules import lazily via mlis_tpu's top-level __getattr__; import
directly from submodules for explicit control:

    from mlis_tpu.models.vit import ViT, ViTConfig
    from mlis_tpu.models.cricavpr import CricaVPR
    from mlis_tpu.models.lightglue import LightGlue, SuperGlue
    from mlis_tpu.models.loftr import LoFTR
    from mlis_tpu.models.superpoint import SuperPoint
    from mlis_tpu.models.yolo import YOLODetector, DynamicObjectFilter
    from mlis_tpu.models.convert import (
        convert_resnet_torch, convert_dinov2_torch, convert_superpoint_torch,
    )
"""

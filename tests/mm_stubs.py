"""Minimal mmcv/mmdet/mmdet3d stubs so the REFERENCE's vendored torch
modules (/root/reference/bevfusion/mmdet3d/models/...) can be imported and
executed as golden oracles without the mm* packages.

Only the behaviors those files actually use are implemented:
  * build_conv_layer / build_norm_layer / build_upsample_layer / ConvModule
    with the standard conv -> bn -> relu composition and mmcv's
    bias='auto' rule (no bias when a norm follows)
  * BaseModule -> nn.Module; auto_fp16 / force_fp32 -> identity decorators
  * registries whose register_module() is a passthrough decorator
  * mmdet3d.ops.bev_pool -> a torch scatter-add oracle with the vendored
    kernel's output layout ([B, C, D, H, W], bev_pool.py:83-97)
"""
from __future__ import annotations

import importlib.util
import sys
import types

REF = "/root/reference/bevfusion"


def _registry():
    class _Reg:
        def register_module(self, *args, **kwargs):
            if args and callable(args[0]):
                return args[0]

            def deco(cls):
                return cls

            return deco

    return _Reg()


def bev_pool_oracle(feats, coords, B, D, H, W):
    """torch equivalent of the vendored CUDA bev_pool: coords columns are
    (x, y, z, batch); scatter-add into [B, D, H, W, C] with (H, W) = (x, y),
    then permute to [B, C, D, H, W] (bev_pool.py:83-97)."""
    import torch

    C = feats.shape[1]
    out = feats.new_zeros((B, D, H, W, C))
    b = coords[:, 3].long()
    d = coords[:, 2].long()
    h = coords[:, 0].long()
    w = coords[:, 1].long()
    flat = ((b * D + d) * H + h) * W + w
    out = out.view(-1, C).index_add(0, flat, feats).view(B, D, H, W, C)
    return out.permute(0, 4, 1, 2, 3).contiguous()


def install():
    import torch
    from torch import nn

    if "mmcv" in sys.modules:
        return

    def build_conv_layer(cfg, *args, **kwargs):
        cfg = dict(cfg or {})
        t = cfg.pop("type", "Conv2d")
        # mmcv merges the remaining cfg entries into the layer kwargs —
        # e.g. SECOND passes conv_cfg=dict(type="Conv2d", bias=False)
        merged = dict(cfg)
        merged.update(kwargs)
        names = ("in_channels", "out_channels", "kernel_size")
        for name, val in zip(names, args):
            merged[name] = val
        merged["bias"] = bool(merged.get("bias", True))  # 'auto' -> True
        cls = {"Conv1d": nn.Conv1d, "Conv2d": nn.Conv2d, "Conv3d": nn.Conv3d}[t]
        return cls(**merged)

    def build_norm_layer(cfg, ch):
        t = (cfg or {}).get("type", "BN")
        eps = (cfg or {}).get("eps", 1e-5)
        if t in ("BN1d",):
            return "bn", nn.BatchNorm1d(ch, eps=eps)
        return "bn", nn.BatchNorm2d(ch, eps=eps)

    def build_upsample_layer(cfg, in_channels, out_channels, kernel_size,
                             stride, **kw):
        assert (cfg or {}).get("type", "deconv") == "deconv"
        return nn.ConvTranspose2d(in_channels, out_channels, kernel_size,
                                  stride=stride, bias=bool(cfg.get("bias", True)))

    class ConvModule(nn.Module):
        def __init__(self, in_c, out_c, kernel_size, stride=1, padding=0,
                     bias="auto", conv_cfg=None, norm_cfg=None,
                     act_cfg="default", inplace=True, **kw):
            super().__init__()
            self.with_norm = norm_cfg is not None
            if bias == "auto":
                bias = not self.with_norm
            self.conv = build_conv_layer(
                conv_cfg, in_c, out_c, kernel_size, stride=stride,
                padding=padding, bias=bias,
            )
            if self.with_norm:
                self.bn = build_norm_layer(norm_cfg, out_c)[1]
            self.with_act = act_cfg is not None
            self.activate = nn.ReLU(inplace=False)

        def forward(self, x):
            x = self.conv(x)
            if self.with_norm:
                x = self.bn(x)
            return self.activate(x) if self.with_act else x

    def _identity_decorator(*a, **k):
        def deco(fn):
            return fn

        return deco

    class BaseModule(nn.Module):
        def __init__(self, init_cfg=None):
            super().__init__()
            self.init_cfg = init_cfg

        def init_weights(self):
            pass

    mmcv = types.ModuleType("mmcv")
    mmcv_cnn = types.ModuleType("mmcv.cnn")
    for n, v in (("build_conv_layer", build_conv_layer),
                 ("build_norm_layer", build_norm_layer),
                 ("build_upsample_layer", build_upsample_layer),
                 ("ConvModule", ConvModule),
                 ("kaiming_init", lambda *a, **k: None),
                 ("xavier_init", lambda *a, **k: None)):
        setattr(mmcv_cnn, n, v)
    mmcv_runner = types.ModuleType("mmcv.runner")
    mmcv_runner.BaseModule = BaseModule
    mmcv_runner.auto_fp16 = _identity_decorator
    mmcv_runner.force_fp32 = _identity_decorator
    mmcv.cnn = mmcv_cnn
    mmcv.runner = mmcv_runner

    mmdet = types.ModuleType("mmdet")
    mmdet_models = types.ModuleType("mmdet.models")
    mmdet_builder = types.ModuleType("mmdet.models.builder")
    for r in ("BACKBONES", "NECKS", "HEADS", "LOSSES", "DETECTORS"):
        setattr(mmdet_models, r, _registry())
        setattr(mmdet_builder, r, _registry())
    mmdet.models = mmdet_models
    mmdet_models.builder = mmdet_builder

    mmdet_core = types.ModuleType("mmdet.core")
    mmdet_core_bbox = types.ModuleType("mmdet.core.bbox")
    mmdet_core_bbox_builder = types.ModuleType("mmdet.core.bbox.builder")

    class BaseBBoxCoder:
        def __init__(self, **kw):
            pass

    mmdet_core_bbox.BaseBBoxCoder = BaseBBoxCoder
    mmdet_core_bbox_builder.BBOX_CODERS = _registry()
    mmdet_core_bbox.builder = mmdet_core_bbox_builder
    mmdet_core.bbox = mmdet_core_bbox
    mmdet.core = mmdet_core

    mmdet3d = types.ModuleType("mmdet3d")
    builder = types.ModuleType("mmdet3d.models.builder")
    for r in ("FUSERS", "VTRANSFORMS", "HEADS", "BACKBONES", "NECKS"):
        setattr(builder, r, _registry())
    builder.build_loss = lambda cfg: None
    mmdet3d_models = types.ModuleType("mmdet3d.models")
    mmdet3d_models.builder = builder
    mmdet3d_ops = types.ModuleType("mmdet3d.ops")
    mmdet3d_ops.bev_pool = bev_pool_oracle
    mmdet3d.models = mmdet3d_models
    mmdet3d.ops = mmdet3d_ops

    for name, mod in (("mmcv", mmcv), ("mmcv.cnn", mmcv_cnn),
                      ("mmcv.runner", mmcv_runner), ("mmdet", mmdet),
                      ("mmdet.models", mmdet_models),
                      ("mmdet.models.builder", mmdet_builder),
                      ("mmdet.core", mmdet_core),
                      ("mmdet.core.bbox", mmdet_core_bbox),
                      ("mmdet.core.bbox.builder", mmdet_core_bbox_builder),
                      ("mmdet3d", mmdet3d),
                      ("mmdet3d.models", mmdet3d_models),
                      ("mmdet3d.models.builder", builder),
                      ("mmdet3d.ops", mmdet3d_ops)):
        sys.modules.setdefault(name, mod)


def load_ref(relpath: str, name: str):
    """Load a vendored reference module by path with the stubs installed.
    Handles the vtransforms package's relative imports by pre-registering a
    synthetic package."""
    install()
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, f"{REF}/{relpath}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_vtransforms():
    """Load vtransforms/base.py + depth_lss.py as a package (relative
    import support)."""
    install()
    pkg_name = "ref_vtransforms"
    if f"{pkg_name}.depth_lss" in sys.modules:
        return sys.modules[f"{pkg_name}.depth_lss"]
    pkg = types.ModuleType(pkg_name)
    pkg.__path__ = [f"{REF}/mmdet3d/models/vtransforms"]
    sys.modules[pkg_name] = pkg
    base = load_ref("mmdet3d/models/vtransforms/base.py", f"{pkg_name}.base")
    setattr(pkg, "base", base)
    return load_ref("mmdet3d/models/vtransforms/depth_lss.py",
                    f"{pkg_name}.depth_lss")

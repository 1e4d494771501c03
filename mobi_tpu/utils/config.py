"""Config system: layered YAML + ${var} interpolation + dotlist overrides.

Drop-in compatible with the reference's public config schema
(/root/reference/configs/mobi_nusc_512.yaml and main.py:503-505's
`OmegaConf.load` + dotlist merge), implemented on plain dicts:

  * multiple --base files merge left-to-right (later wins, deep merge);
  * `${key}` strings interpolate against the ROOT of the merged tree
    (the shipped configs only use top-level keys);
  * CLI overrides are `a.b.c=value` dotted paths with YAML-typed values;
  * `target:`/`params:` nodes instantiate classes; reference class paths are
    aliased onto mobi_tpu equivalents so unmodified reference YAML files work.
"""
from __future__ import annotations

import copy
import importlib
import re
from typing import Any, Dict, List, Optional, Sequence

import yaml

_INTERP = re.compile(r"\$\{([^}]+)\}")

# reference `target:` paths -> mobi_tpu equivalents
TARGET_ALIASES = {
    "ldm.models.diffusion.ddpm.LatentDiffusion": "mobi_tpu.models.diffusion.MobiDiffusion",
    "ldm.models.autoencoder.AutoencoderKL": "mobi_tpu.models.vae.AutoencoderKL",
    "ldm.modules.diffusionmodules.openaimodel.UNetModel": "mobi_tpu.models.unet.UNetModel",
    "ldm.modules.encoders.modules.FrozenCLIPImageEmbedder": "mobi_tpu.models.encoders.CondStageModel",
    "ldm.modules.encoders.modules.BBoxEmbedder": "mobi_tpu.models.encoders.BBoxEmbedder",
    "ldm.data.nuscenes.NuScenesDataset": "mobi_tpu.data.nuscenes.NuScenesDataset",
    "ldm.lr_scheduler.LambdaLinearScheduler": "mobi_tpu.training.lambda_linear_schedule",
    "torch.nn.Identity": "builtins.dict",  # placeholder loss configs
}


def deep_merge(base: Dict, override: Dict) -> Dict:
    out = dict(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def _interpolate(node: Any, root: Dict) -> Any:
    if isinstance(node, dict):
        return {k: _interpolate(v, root) for k, v in node.items()}
    if isinstance(node, list):
        return [_interpolate(v, root) for v in node]
    if isinstance(node, str):
        m = _INTERP.fullmatch(node.strip())
        if m:
            return _lookup(root, m.group(1))
        return _INTERP.sub(lambda mm: str(_lookup(root, mm.group(1))), node)
    return node


def _lookup(root: Dict, dotted: str) -> Any:
    node: Any = root
    for part in dotted.split("."):
        node = node[part]
    return node


def set_dotted(cfg: Dict, dotted: str, value: Any) -> None:
    parts = dotted.split(".")
    node = cfg
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def parse_override(s: str):
    """`a.b.c=value` with YAML-typed value."""
    key, _, raw = s.partition("=")
    return key.strip(), yaml.safe_load(raw)


def load_config(
    paths: Sequence[str], overrides: Optional[Sequence[str]] = None
) -> Dict:
    cfg: Dict = {}
    for p in paths:
        with open(p) as f:
            cfg = deep_merge(cfg, yaml.safe_load(f) or {})
    for s in overrides or ():
        key, value = parse_override(s)
        set_dotted(cfg, key, value)
    return _interpolate(cfg, cfg)


def get_obj_from_str(path: str) -> Any:
    path = TARGET_ALIASES.get(path, path)
    module, _, name = path.rpartition(".")
    return getattr(importlib.import_module(module), name)


def instantiate_from_config(node: Dict, **extra) -> Any:
    """`{target: ..., params: {...}}` -> object (reference ldm/util.py:76-91)."""
    if "target" not in node:
        raise KeyError("Expected key `target` to instantiate.")
    cls = get_obj_from_str(node["target"])
    params = dict(node.get("params") or {})
    params.update(extra)
    return cls(**params)


# --------------------------------------------------------------------------
# Reference-YAML -> MobiConfig translation
# --------------------------------------------------------------------------


def mobi_config_from_yaml(cfg: Dict):
    """Translate a reference-schema config tree into a MobiConfig."""
    import jax.numpy as jnp

    from mobi_tpu.models.diffusion import MobiConfig

    mp = cfg["model"]["params"]
    unet = mp["unet_config"]["params"]
    first = (mp.get("first_stage_config") or {}).get("params", {})
    dd = first.get("ddconfig", {})
    conds = mp.get("cond_stage_key", cfg.get("conditions", ["ref_image", "ref_bbox"]))
    if isinstance(conds, str):
        conds = [conds]

    precision = cfg.get("precision", "bf16")
    dtype = {"bf16": jnp.bfloat16, "fp32": jnp.float32}[precision]

    return MobiConfig(
        timesteps=mp.get("timesteps", 1000),
        linear_start=mp.get("linear_start", 0.00085),
        linear_end=mp.get("linear_end", 0.0120),
        latent_size=mp.get("image_size", 64),
        channels=mp.get("channels", 4),
        scale_factor=mp.get("scale_factor", 1.0),
        lidar_scale_factor=mp.get("lidar_scale_factor", 1.0),
        u_cond_percent=mp.get("u_cond_percent", 0.0),
        use_camera=mp.get("use_camera", True),
        use_lidar=mp.get("use_lidar", False),
        cond_stage_key=tuple(conds),
        range_object_norm=mp.get("range_object_norm", False),
        range_object_norm_scale=mp.get("range_object_norm_scale", 0.75),
        range_int_norm=mp.get("range_int_norm", False),
        image_height=cfg.get("image_height", 512),
        image_width=cfg.get("image_width", 512),
        range_height=cfg.get("range_height", 512),
        range_width=cfg.get("range_width", 512),
        unet_channels=unet.get("model_channels", 320),
        unet_channel_mult=tuple(unet.get("channel_mult", (1, 2, 4, 4))),
        unet_num_res_blocks=unet.get("num_res_blocks", 2),
        unet_attention_resolutions=tuple(unet.get("attention_resolutions", (4, 2, 1))),
        unet_num_heads=unet.get("num_heads", 8),
        unet_use_checkpoint=unet.get("use_checkpoint", False),
        vae_use_checkpoint=first.get("use_checkpoint", False),
        attn_backend=unet.get("attn_backend", cfg.get("attn_backend", "auto")),
        context_dim=unet.get("context_dim", 768),
        vae_ch=dd.get("ch", 128),
        vae_ch_mult=tuple(dd.get("ch_mult", (1, 2, 4, 4))),
        vae_num_res_blocks=dd.get("num_res_blocks", 2),
        vae_embed_dim=first.get("embed_dim", 4),
        dtype=dtype,
    )

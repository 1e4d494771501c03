"""Fabricate full-size randomized weights for the L6 metric harness.

The realism bench (scripts/realism_test_bench.sh compute_scores) needs four
pretrained artifacts the reference downloads from the network (CLIP ViT-B/32,
the lpips package's 'alex' linear weights, torchvision alexnet, and the
RangeNet++ darknet53 checkpoint's backbone/segmentation_decoder files —
reference eval_tool/camera/{fid,lpips,clip}_score.py + eval_tool/lidar/
frd_score.py:192-211).  On an air-gapped machine this script emits
randomized weights in the EXACT same state-dict layouts so the whole metric
pipeline can be driven end-to-end; the resulting metric VALUES are
meaningless, the exercised code paths are the real ones.  Numeric parity of
each importer against the corresponding torch model is pinned separately by
tests/test_fid_clip.py, tests/test_golden_reference.py (LPIPS + RangeNet)
and tests/test_encoders.py.

  python scripts/fabricate_eval_weights.py --out /tmp/eval_weights
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import torch

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF_PATH = os.environ.get("MOBI_REFERENCE_PATH", "/root/reference")


def randomize_(module: torch.nn.Module, seed: int) -> None:
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)


def fabricate_clip_b32(path: str) -> None:
    """HF CLIPVisionModelWithProjection state dict at the real ViT-B/32
    size (the layout import_clip_b32 consumes)."""
    import transformers

    cfg = transformers.CLIPVisionConfig(
        hidden_size=768, intermediate_size=3072, num_hidden_layers=12,
        num_attention_heads=12, image_size=224, patch_size=32,
        projection_dim=512, hidden_act="quick_gelu",
    )
    model = transformers.CLIPVisionModelWithProjection(cfg)
    randomize_(model, seed=101)
    torch.save(model.state_dict(), path)


def fabricate_lpips(lpips_path: str, alexnet_path: str) -> None:
    """lpips-package 'alex' linear heads + torchvision alexnet trunk
    (layouts per mobi_tpu.eval.lpips.import_lpips_weights)."""
    rng = np.random.default_rng(102)
    chans = [64, 192, 384, 256, 256]
    lpips_sd = {
        f"lin{i}.model.1.weight":
            torch.from_numpy(rng.random((1, c, 1, 1), dtype=np.float32) * 0.1)
        for i, c in enumerate(chans)
    }
    torch.save(lpips_sd, lpips_path)

    shapes = {
        0: (64, 3, 11, 11), 3: (192, 64, 5, 5), 6: (384, 192, 3, 3),
        8: (256, 384, 3, 3), 10: (256, 256, 3, 3),
    }
    alex_sd = {}
    for ti, shp in shapes.items():
        alex_sd[f"features.{ti}.weight"] = torch.from_numpy(
            (rng.standard_normal(shp) * 0.05).astype(np.float32))
        alex_sd[f"features.{ti}.bias"] = torch.from_numpy(
            (rng.standard_normal(shp[0]) * 0.05).astype(np.float32))
    torch.save(alex_sd, alexnet_path)


def fabricate_rangenet(backbone_path: str, decoder_path: str) -> None:
    """darknet53 backbone + segmentation decoder state dicts via the
    reference's own RangeNet Model class (randomized, BN buffers too)."""
    import yaml

    sys.path.insert(0, os.path.join(REF_PATH, "eval_tool", "lidar"))
    from rangenet.model import Model as RefRangeNet  # noqa: E402

    with open(os.path.join(REF_PATH, "eval_tool/lidar/rangenet/config.yaml")) as f:
        cfg = yaml.safe_load(f)
    ref = RefRangeNet(cfg)
    randomize_(ref, seed=103)
    g = torch.Generator().manual_seed(104)
    with torch.no_grad():
        for name, buf in ref.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(torch.randn(buf.shape, generator=g) * 0.1)
            elif name.endswith("running_var"):
                buf.copy_(torch.rand(buf.shape, generator=g) + 0.5)
    torch.save(ref.backbone.state_dict(), backbone_path)
    torch.save(ref.decoder.state_dict(), decoder_path)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--skip-rangenet", action="store_true",
                   help="skip the RangeNet fabrication (needs the reference "
                        "tree for the model definition)")
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)

    clip_p = os.path.join(args.out, "clip_vit_b32.pth")
    fabricate_clip_b32(clip_p)
    print(f"wrote {clip_p}")

    lpips_p = os.path.join(args.out, "lpips_alex.pth")
    alex_p = os.path.join(args.out, "alexnet.pth")
    fabricate_lpips(lpips_p, alex_p)
    print(f"wrote {lpips_p} + {alex_p}")

    if not args.skip_rangenet:
        bb_p = os.path.join(args.out, "rangenet_backbone")
        dec_p = os.path.join(args.out, "rangenet_decoder")
        fabricate_rangenet(bb_p, dec_p)
        print(f"wrote {bb_p} + {dec_p}")

    print("export CLIP_B32_WEIGHTS=%s LPIPS_WEIGHTS=%s ALEXNET_WEIGHTS=%s "
          "RANGENET_BACKBONE=%s RANGENET_DECODER=%s" % (
              clip_p, lpips_p, alex_p,
              os.path.join(args.out, "rangenet_backbone"),
              os.path.join(args.out, "rangenet_decoder")))


if __name__ == "__main__":
    main()

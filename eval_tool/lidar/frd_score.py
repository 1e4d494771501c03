"""Frechet Range Distance between saved range_{orig,pred} npy folders
(reference eval_tool/lidar/frd_score.py:116-234).

  python eval_tool/lidar/frd_score.py --path_orig DIR --path_pred DIR \
      --backbone-weights darknet53/backbone \
      --decoder-weights darknet53/segmentation_decoder
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def list_npys(path):
    return sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".npy")
    )


def compute_features(files, params, batch_size=16):
    import jax
    import jax.numpy as jnp

    from mobi_tpu.eval.rangenet import RangeNetFRD, range_npy_to_input

    net = RangeNetFRD()
    apply = jax.jit(lambda p, x: net.apply({"params": p}, x))
    feats = []
    for i in range(0, len(files), batch_size):
        batch = np.stack(
            [range_npy_to_input(np.load(f)) for f in files[i : i + batch_size]]
        )
        feats.append(np.asarray(apply(params, jnp.asarray(batch))))
    return np.concatenate(feats)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--path_orig", required=True)
    p.add_argument("--path_pred", required=True)
    p.add_argument("--backbone-weights",
                   default=os.environ.get("RANGENET_BACKBONE"))
    p.add_argument("--decoder-weights",
                   default=os.environ.get("RANGENET_DECODER"))
    p.add_argument("--batch-size", type=int, default=16)
    args = p.parse_args()
    for w in (args.backbone_weights, args.decoder_weights):
        if not w or not os.path.exists(w):
            sys.exit(
                "FRD requires the RangeNet++ darknet53 weights: pass "
                "--backbone-weights/--decoder-weights (the published "
                "checkpoint's `backbone` and `segmentation_decoder` files) "
                "or set RANGENET_BACKBONE/RANGENET_DECODER."
            )

    from mobi_tpu.checkpoint import load_torch_checkpoint
    from mobi_tpu.eval.frechet import frechet_from_features
    from mobi_tpu.eval.rangenet import import_rangenet_weights

    params = import_rangenet_weights(
        load_torch_checkpoint(args.backbone_weights),
        load_torch_checkpoint(args.decoder_weights),
    )
    f1 = compute_features(list_npys(args.path_orig), params, args.batch_size)
    f2 = compute_features(list_npys(args.path_pred), params, args.batch_size)
    print(f"FRD: {frechet_from_features(f1, f2):.4f}")


if __name__ == "__main__":
    main()

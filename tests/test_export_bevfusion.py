"""Round-trip `import_bevfusion(export_bevfusion(p)) == p` — pins the
checkpoint exporter's permutation inverses (swin patch-merge unfold order,
fuser dense()-flattening, deconv spatial mirror, attn in_proj packing) —
plus the full checkpoint-file workflow: fabricate a detector, save a
reference-format .pth, and drive `scripts/detection_eval.py --checkpoint`
(the reference's tools/test.py workflow, docs/edited-objects-eval.md:20-33)
end-to-end on a synthetic raw nuScenes tree."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mobi_tpu import native
from mobi_tpu.export_bevfusion import (
    export_bevfusion,
    save_reference_checkpoint,
)
from mobi_tpu.import_bevfusion import _identity_fuser, import_bevfusion
from mobi_tpu.models.bevfusion import (
    BEVFusionDetector,
    ConvFuser,
    DepthLSSTransformTPU,
    SECONDBackbone,
    SECONDFPN,
    SparseEncoderTPU,
    TransFusionHeadTPU,
    hard_simple_vfe,
    plan_sparse_encoder,
)


def _randomize(tree, rng):
    """Random-normal every leaf (BN variances positive) so permutation
    errors can't cancel."""
    if isinstance(tree, dict):
        return {k: _randomize(v, rng) for k, v in tree.items()}
    a = np.asarray(tree)
    out = rng.normal(0, 1, a.shape).astype(np.float32)
    return out


def _positive_vars(tree):
    if isinstance(tree, dict):
        return {
            k: (np.abs(v) + 0.5 if k.endswith("_var") else _positive_vars(v))
            for k, v in tree.items()
        }
    return tree


def _sub(module, *args):
    return jax.device_get(module.init(jax.random.PRNGKey(0), *args)["params"])


@pytest.fixture(scope="module")
def lidar_subtrees():
    rng = np.random.default_rng(3)
    pts = np.concatenate(
        [
            rng.uniform(0, 9.6, (2000, 2)),
            rng.uniform(-3, 1.1, (2000, 1)),
            rng.uniform(0, 1, (2000, 2)),
        ],
        axis=1,
    ).astype(np.float32)
    voxels, coords, npv = native.hard_voxelize(
        pts, (0.15, 0.15, 0.1), (0, 0, -3, 9.6, 9.6, 1.1),
        max_points=10, max_voxels=4000,
    )
    feats = hard_simple_vfe(jnp.asarray(voxels), jnp.asarray(npv))
    plans, oc, oshape = plan_sparse_encoder(coords, (64, 64, 41))
    enc = SparseEncoderTPU()
    bev256 = jnp.zeros((1, 8, 8, 256))
    backbone = SECONDBackbone()
    p_backbone = _sub(backbone, bev256)
    outs = backbone.apply({"params": p_backbone}, bev256)
    return {
        "lidar_encoder": _sub(enc, feats, plans, oc, oshape),
        "backbone": p_backbone,
        "neck": _sub(SECONDFPN(), outs),
        "head": _sub(TransFusionHeadTPU(num_proposals=16),
                     jnp.zeros((1, 8, 8, 512))),
    }


def _tree_eq(a, b, path=""):
    assert isinstance(a, dict) == isinstance(b, dict), path
    if isinstance(a, dict):
        assert set(a) == set(b), (path, set(a) ^ set(b))
        for k in a:
            _tree_eq(a[k], b[k], f"{path}/{k}")
    else:
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            err_msg=path,
        )


def test_roundtrip_lidar_only(lidar_subtrees):
    rng = np.random.default_rng(0)
    p = dict(lidar_subtrees)
    p["fuser"] = _sub(ConvFuser(out_channels=256), [jnp.zeros((1, 8, 8, 256))])
    p = _positive_vars(_randomize(p, rng))
    sd = export_bevfusion(p, use_camera=False)
    assert not any(k.startswith("encoders.camera") for k in sd)
    p2 = import_bevfusion(sd, use_camera=False)
    _tree_eq(p2, p)


def test_roundtrip_camera_lidar(lidar_subtrees):
    from mobi_tpu.models.swin import GeneralizedLSSFPN, SwinTransformerTPU

    rng = np.random.default_rng(1)
    p = dict(lidar_subtrees)
    p["fuser"] = _sub(
        ConvFuser(out_channels=256),
        [jnp.zeros((1, 8, 8, 80)), jnp.zeros((1, 8, 8, 256))],
    )
    p["camera_backbone"] = _sub(SwinTransformerTPU(),
                                jnp.zeros((1, 112, 112, 3)))
    feats = [jnp.zeros((1, 8, 8, 192)), jnp.zeros((1, 4, 4, 384)),
             jnp.zeros((1, 2, 2, 768))]
    p["camera_neck"] = _sub(GeneralizedLSSFPN(out_channels=256), feats)
    vt = DepthLSSTransformTPU(
        in_channels=256, out_channels=80, image_size=(32, 88),
        feature_size=(4, 11), xbound=(-8.0, 8.0, 0.8),
        ybound=(-8.0, 8.0, 0.8), dbound=(1.0, 9.0, 0.5), downsample=2,
    )
    eye = jnp.broadcast_to(jnp.eye(4), (2, 4, 4))
    p["vtransform"] = _sub(
        vt, jnp.zeros((2, 4, 11, 256)), jnp.zeros((2, 32, 88, 1)),
        eye, jnp.broadcast_to(jnp.eye(3), (2, 3, 3)),
    )
    p = _positive_vars(_randomize(p, rng))
    sd = export_bevfusion(p, use_camera=True)
    p2 = import_bevfusion(sd, use_camera=True)
    _tree_eq(p2, p)


def test_identity_fuser_is_exact():
    """A reference lidar-only checkpoint has no fuser module; import
    synthesizes one that must be EXACTLY identity on the (nonnegative,
    post-ReLU) sparse-encoder BEV, eps compensation included."""
    p = _identity_fuser(channels=16)
    x = jnp.abs(jax.random.normal(jax.random.PRNGKey(4), (1, 6, 6, 16)))
    out = ConvFuser(out_channels=16).apply({"params": p}, [x])
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_import_without_fuser_keys(lidar_subtrees):
    """Dropping the fuser keys from an exported checkpoint (= the
    reference's lidar-only layout) still imports, with the identity
    fuser."""
    rng = np.random.default_rng(2)
    p = dict(lidar_subtrees)
    p["fuser"] = _sub(ConvFuser(out_channels=256), [jnp.zeros((1, 8, 8, 256))])
    p = _positive_vars(_randomize(p, rng))
    sd = export_bevfusion(p, use_camera=False)
    sd = {k: v for k, v in sd.items() if not k.startswith("fuser.")}
    p2 = import_bevfusion(sd, use_camera=False)
    assert p2["fuser"]["fuse"]["conv"]["kernel"].shape == (3, 3, 256, 256)
    _tree_eq(p2["head"], p["head"])


def test_checkpoint_file_and_detection_eval_cli(tmp_path):
    """The full reference eval workflow on fabricated weights: init a
    lidar-only detector, save a reference-format .pth, run the
    detection_eval CLI's --checkpoint inference stage (import -> static
    caps -> jitted forward -> nuScenes results.json) on a synthetic raw
    tree, then evaluate. Small grid keeps the CPU run cheap; the
    production-grid run is a TPU drive (PROFILE.md)."""
    import sys

    sys.path.insert(0, "/root/repo/scripts")
    import detection_eval

    from mobi_tpu.data.synthetic import build_synthetic_nuscenes_raw
    from mobi_tpu.detector_inference import run_detector

    root = str(tmp_path / "raw")
    build_synthetic_nuscenes_raw(root, num_scenes=1, samples_per_scene=2)

    det = BEVFusionDetector(use_camera=False, num_proposals=16)
    rng = np.random.default_rng(5)
    pts = np.concatenate(
        [rng.uniform(-9.0, 9.0, (1500, 2)), rng.uniform(-2.5, 0.5, (1500, 1)),
         rng.uniform(0, 1, (1500, 2))], axis=1).astype(np.float32)
    from mobi_tpu.models.bevfusion import prepare_lidar_inputs

    # z must give the production 40-voxel ladder (41 -> 21 -> 11 -> 5 -> 2)
    grid = dict(voxel_size=(0.15, 0.15, 0.1),
                pc_range=(-9.6, -9.6, -3.0, 9.6, 9.6, 1.0))
    feats, plans, oc, oshape = prepare_lidar_inputs(pts, **grid)
    params = jax.device_get(
        det.init(jax.random.PRNGKey(0), feats, plans, oc, oshape)["params"]
    )
    ckpt = save_reference_checkpoint(
        params, str(tmp_path / "det.pth"), use_camera=False
    )

    results_path = str(tmp_path / "results.json")
    run_detector(
        root, ckpt, results_path, sweeps_num=1, max_samples=2,
        score_threshold=0.0, **grid,
    )
    with open(results_path) as f:
        res = json.load(f)
    assert len(res["results"]) == 2
    for token, dets in res["results"].items():
        for d in dets:
            assert np.all(np.isfinite(d["translation"]))
            assert d["detection_name"]

    out_dir = str(tmp_path / "out")
    metrics = detection_eval.main([
        "--dataroot", root, "--results", results_path, "--out-dir", out_dir,
    ])
    assert os.path.exists(os.path.join(out_dir, "metrics_summary.json"))
    assert 0 <= metrics["nd_score"] <= 1

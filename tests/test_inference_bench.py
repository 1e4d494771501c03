"""inference_test_bench paste-back semantics: the DEFAULT must reproduce the
reference's unit-mixing intensity paste (normalized [-1,1] object pixels
inside a raw 0..255 canvas — reference inference_test_bench.py:607-611), with
--fixed-intensity-paste as the opt-in unit-consistent mode."""
import os
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scripts.inference_test_bench import composite_lidar, parse_args  # noqa: E402

from mobi_tpu.ops.ranges import inverse_intensity_normalization  # noqa: E402


def _far_box_corners():
    from mobi_tpu.data.nuscenes_tables import box7d_to_corners

    box = np.array([1e3, 1e3, 0.0, 4.0, 2.0, 2.0, 0.3])
    return box7d_to_corners(box)[None]


def _fixture(tmp_path):
    h, w = 8, 64
    rng = np.random.default_rng(0)
    depth_orig = rng.uniform(5.0, 30.0, (h, w))
    int_orig = np.full((h, w), 200.0)  # raw 0..255 canvas
    pitch = np.tile(np.linspace(0.3, -0.3, h)[:, None], (1, w))
    yaw = np.tile(np.linspace(-np.pi, np.pi, w)[None, :], (h, 1))
    gt_inst = np.zeros((h, w))
    gt_inst[2:5, 10:20] = 1.0
    batch = {
        "lidar": {
            "min_depth_obj": np.array([5.0]),
            "max_depth_obj": np.array([20.0]),
            "range_shift_left": np.array([0]),
            "width_crop": np.array([w]),
            "range_depth_orig": depth_orig[None],
            "range_int_orig": int_orig[None],
            "range_pitch": pitch[None],
            "range_yaw": yaw[None],
            "range_instance_mask_orig": gt_inst[None],
            "file_name": ["pred_cloud.npy"],
        },
        # far-away box so the predicted-instance mask stays empty and the
        # paste region is exactly the GT instance mask
        "bbox_3d": _far_box_corners(),
    }
    pred = np.stack(
        [np.full((h, w), 0.1), np.full((h, w), -0.2)], axis=-1
    )  # normalized depth/intensity model output
    mcfg = types.SimpleNamespace(
        range_object_norm=True, range_object_norm_scale=0.75,
        range_int_norm=True,
    )
    return batch, pred, mcfg, gt_inst.astype(bool), int_orig


@pytest.mark.parametrize("fixed", [False, True])
def test_intensity_paste_units(tmp_path, fixed):
    batch, pred, mcfg, inst, int_orig = _fixture(tmp_path)
    argv = ["--config", "x"] + (["--fixed-intensity-paste"] if fixed else [])
    opt = parse_args(argv)
    assert opt.fixed_intensity_paste is fixed

    lidar_path = str(tmp_path / "lidar")
    sample_path = str(tmp_path / "samples")
    os.makedirs(sample_path, exist_ok=True)
    composite_lidar(pred, batch, 0, lidar_path, sample_path, "seg0", opt, mcfg)

    out = np.load(
        os.path.join(lidar_path, "range_pred", f"seg0_range_pred_seed{opt.seed}.npy")
    )
    int_final = out[1]
    # context pixels always keep the raw canvas
    np.testing.assert_allclose(int_final[~inst], int_orig[~inst])

    expect_norm = float(inverse_intensity_normalization(np.float64(-0.2)))
    if fixed:
        want = (expect_norm + 1) / 2 * 255.0  # raw units
    else:
        want = expect_norm  # reference-faithful: normalized units pasted raw
    np.testing.assert_allclose(int_final[inst], want, rtol=1e-6)
    if not fixed:
        assert np.abs(int_final[inst]).max() <= 1.0 + 1e-9


def test_encoder_interval_flag():
    """--encoder-interval reaches make_inpaint_pipeline (the opt-in
    approximate fast mode; exact DDIM by default)."""
    assert parse_args(["--config", "x"]).encoder_interval == 1
    assert parse_args(
        ["--config", "x", "--encoder-interval", "2"]
    ).encoder_interval == 2


def test_sample_segments_flag(monkeypatch):
    """--sample-segments (env MOBI_ITB_SEGMENTS default) reaches
    make_inpaint_pipeline's sample_segments — the itb analogue of bench.py's
    MOBI_BENCH_SEGMENTS (PROFILE.md 'execute-time limit')."""
    assert parse_args(["--config", "x"]).sample_segments == 1
    assert parse_args(
        ["--config", "x", "--sample-segments", "5"]
    ).sample_segments == 5
    monkeypatch.setenv("MOBI_ITB_SEGMENTS", "10")
    import importlib

    import scripts.inference_test_bench as itb

    importlib.reload(itb)
    try:
        assert itb.parse_args(["--config", "x"]).sample_segments == 10
    finally:
        monkeypatch.delenv("MOBI_ITB_SEGMENTS")
        importlib.reload(itb)

"""Golden parity for the detection evaluation against the MObI-patched
nuscenes-devkit (eval/detection/algo.py incl. the `restricted`/
`inserted_boxes` additions). The devkit imports with pyquaternion/cachetools
stubs (pure-math deps not installed here)."""
import os
import sys
import types

import numpy as np
import pytest

SDK = "/root/reference/nuscenes-devkit/python-sdk"
if not os.path.isdir(SDK):
    pytest.skip("reference devkit not mounted", allow_module_level=True)


def _install_stubs():
    if "pyquaternion" not in sys.modules:
        pq = types.ModuleType("pyquaternion")

        class Quaternion:
            def __init__(self, *args, **kw):
                self.q = np.asarray(
                    args[0] if len(args) == 1 else (args or [1, 0, 0, 0]), float
                )

            @property
            def rotation_matrix(self):
                w, x, y, z = self.q
                return np.array([
                    [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
                    [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
                    [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
                ])

        pq.Quaternion = Quaternion
        sys.modules["pyquaternion"] = pq
    if "cachetools" not in sys.modules:
        ct = types.ModuleType("cachetools")
        ct.cached = lambda cache=None, key=None: (lambda f: f)
        ct.LRUCache = type("LRUCache", (), {"__init__": lambda self, *a, **k: None})
        sys.modules["cachetools"] = ct


_install_stubs()
if SDK not in sys.path:
    sys.path.insert(0, SDK)

from nuscenes.eval.common.data_classes import EvalBoxes  # noqa: E402
from nuscenes.eval.common.utils import center_distance as ref_center_distance  # noqa: E402
from nuscenes.eval.detection.algo import (  # noqa: E402
    accumulate as ref_accumulate,
    calc_ap as ref_calc_ap,
    calc_tp as ref_calc_tp,
)
from nuscenes.eval.detection.data_classes import DetectionBox  # noqa: E402

from mobi_tpu.eval.detection import (  # noqa: E402
    DetBox,
    MetricData,
    TP_METRICS,
    accumulate,
    calc_ap,
    calc_tp,
)


def yaw_quat(yaw):
    return (float(np.cos(yaw / 2)), 0.0, 0.0, float(np.sin(yaw / 2)))


def make_scene(seed=0, n_samples=4, n_gt=6, fp_per_sample=3):
    """Synthetic GT + predictions in both devkit and mobi_tpu formats."""
    rng = np.random.default_rng(seed)
    ref_gt, ref_pred = EvalBoxes(), EvalBoxes()
    my_gt, my_pred = {}, {}
    attrs = ["vehicle.parked", "vehicle.moving"]
    inserted = {}

    for s in range(n_samples):
        token = f"sample{s}"
        gt_list, pd_list, mg, mp = [], [], [], []
        inserted[token] = set()
        for g in range(n_gt):
            pos = rng.uniform(-30, 30, 2)
            size = rng.uniform(1.2, 4.0, 3)
            yaw = float(rng.uniform(0, 2 * np.pi))
            vel = rng.uniform(-3, 3, 2)
            attr = attrs[int(rng.integers(0, 2))]
            tid = f"tid{s}_{g}"
            if g < 2:
                inserted[token].add(tid)
            gt_list.append(DetectionBox(
                sample_token=token, translation=(*pos, 0.0), size=tuple(size),
                rotation=yaw_quat(yaw), velocity=tuple(vel),
                detection_name="car", attribute_name=attr, tracking_id=tid,
                num_pts=10,
            ))
            mg.append(DetBox(
                sample_token=token, translation=(*pos, 0.0), size=tuple(size),
                yaw=yaw, velocity=tuple(vel), detection_name="car",
                attribute_name=attr, tracking_id=tid, num_pts=10,
            ))
            # one (noisy) prediction per GT, some well off
            noise = rng.normal(0, 0.8 if g % 3 else 5.0, 2)
            p_pos = pos + noise
            p_yaw = yaw + float(rng.normal(0, 0.2))
            p_size = size * rng.uniform(0.8, 1.2, 3)
            p_vel = vel + rng.normal(0, 0.5, 2)
            score = float(rng.uniform(0.1, 1.0))
            p_attr = attrs[int(rng.integers(0, 2))]
            pd_list.append(DetectionBox(
                sample_token=token, translation=(*p_pos, 0.0),
                size=tuple(p_size), rotation=yaw_quat(p_yaw),
                velocity=tuple(p_vel), detection_name="car",
                detection_score=score, attribute_name=p_attr,
            ))
            mp.append(DetBox(
                sample_token=token, translation=(*p_pos, 0.0),
                size=tuple(p_size), yaw=p_yaw, velocity=tuple(p_vel),
                detection_name="car", detection_score=score,
                attribute_name=p_attr,
            ))
        for _ in range(fp_per_sample):
            pos = rng.uniform(-40, 40, 2)
            score = float(rng.uniform(0.1, 1.0))
            pd_list.append(DetectionBox(
                sample_token=token, translation=(*pos, 0.0),
                size=(2.0, 4.0, 1.5), rotation=yaw_quat(0.3),
                velocity=(0.0, 0.0), detection_name="car",
                detection_score=score, attribute_name="vehicle.parked",
            ))
            mp.append(DetBox(
                sample_token=token, translation=(*pos, 0.0),
                size=(2.0, 4.0, 1.5), yaw=0.3, detection_name="car",
                detection_score=score, attribute_name="vehicle.parked",
            ))
        ref_gt.add_boxes(token, gt_list)
        ref_pred.add_boxes(token, pd_list)
        my_gt[token] = mg
        my_pred[token] = mp
    return ref_gt, ref_pred, my_gt, my_pred, inserted


def assert_md_equal(mine: MetricData, ref, atol=1e-9):
    np.testing.assert_allclose(mine.recall, ref.recall, atol=atol)
    np.testing.assert_allclose(mine.precision, ref.precision, atol=atol)
    np.testing.assert_allclose(mine.confidence, ref.confidence, atol=atol)
    for m in TP_METRICS:
        np.testing.assert_allclose(
            getattr(mine, m), getattr(ref, m), atol=1e-7, err_msg=m
        )


@pytest.mark.parametrize("dist_th", [0.5, 1.0, 2.0, 4.0])
def test_accumulate_parity_standard(dist_th):
    ref_gt, ref_pred, my_gt, my_pred, _ = make_scene()
    ref_md = ref_accumulate(ref_gt, ref_pred, "car", ref_center_distance, dist_th)
    my_md = accumulate(my_gt, my_pred, "car", dist_th)
    assert_md_equal(my_md, ref_md)
    np.testing.assert_allclose(
        calc_ap(my_md, 0.1, 0.1), ref_calc_ap(ref_md, 0.1, 0.1), atol=1e-9
    )
    for m in TP_METRICS:
        np.testing.assert_allclose(
            calc_tp(my_md, 0.1, m), ref_calc_tp(ref_md, 0.1, m), atol=1e-9,
            err_msg=m,
        )


def test_accumulate_parity_restricted():
    """MObI restricted mode (algo.py:107,126,140-149): only edited-object
    matches accumulate; unmatched predictions are not FPs; precision is a
    zero curve."""
    ref_gt, ref_pred, my_gt, my_pred, inserted = make_scene(seed=3)
    ref_md = ref_accumulate(
        ref_gt, ref_pred, "car", ref_center_distance, 2.0,
        restricted=True, inserted_boxes=inserted,
    )
    my_md = accumulate(
        my_gt, my_pred, "car", 2.0, restricted=True, inserted_boxes=inserted
    )
    # restricted mode keeps RAW match errors (variable length)
    for m in TP_METRICS:
        np.testing.assert_allclose(
            getattr(my_md, m), getattr(ref_md, m), atol=1e-7, err_msg=m
        )
    np.testing.assert_allclose(my_md.precision, ref_md.precision)
    assert my_md.precision.max() == 0.0


def test_accumulate_restricted_subsets_samples():
    """inserted_boxes also restricts which SAMPLES are evaluated
    (algo.py:40-42)."""
    _, _, my_gt, my_pred, inserted = make_scene(seed=5)
    only_one = {"sample0": inserted["sample0"]}
    md = accumulate(
        my_gt, my_pred, "car", 2.0, restricted=True, inserted_boxes=only_one
    )
    # every raw error comes from sample0's <=2 inserted objects
    assert len(md.trans_err) <= 2


def test_no_gt_returns_no_predictions():
    md = accumulate({}, {}, "car", 2.0)
    assert md.precision.max() == 0.0
    np.testing.assert_allclose(md.trans_err, 1.0)


def test_detection_eval_end_to_end_nds():
    from mobi_tpu.eval.detection import DetectionConfig, DetectionEval

    _, _, my_gt, my_pred, inserted = make_scene(seed=7)
    ev = DetectionEval(my_gt, my_pred, DetectionConfig())
    res = ev.evaluate()
    assert 0.0 <= res["mean_ap"] <= 1.0
    assert 0.0 <= res["nd_score"] <= 1.0
    assert set(res["tp_errors"]) == set(TP_METRICS)
    # perfect predictions -> mAP 1 for the car class, tiny errors
    perfect = DetectionEval(my_gt, {
        t: [DetBox(**{**vars(b), "detection_score": 0.9}) for b in bl]
        for t, bl in my_gt.items()
    }, DetectionConfig())
    res_p = perfect.evaluate()
    assert res_p["label_aps"]["car"][0.5] > 0.95
    # per-class error is ~0; the cross-class mean includes 1.0 for each
    # GT-less class (devkit calc_tp fallback), same as the reference
    assert res_p["label_tp_errors"]["car"]["trans_err"] < 1e-6


def test_detection_eval_edited_restrict(tmp_path):
    import json

    from mobi_tpu.eval.detection import DetectionConfig, DetectionEval

    _, _, my_gt, my_pred, inserted = make_scene(seed=9)
    with open(tmp_path / "objects.json", "w") as f:
        json.dump({k: sorted(v) for k, v in inserted.items()}, f)
    ev = DetectionEval(
        my_gt, my_pred, DetectionConfig(),
        edited_samples_path=str(tmp_path), edited_objects_restrict=True,
    )
    res = ev.evaluate()
    # restricted mode: AP forced to 0, TP errors are raw means
    assert res["mean_ap"] == 0.0
    assert np.isfinite(res["tp_errors"]["trans_err"])

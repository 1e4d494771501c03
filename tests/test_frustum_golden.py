"""Golden parity for the spherical frustum-IoU preprocessing filters.

The reference functions live in
/root/reference/bevfusion/mmdet3d/datasets/pipelines/utils.py
(transform_to_spherical :267, get_frustum :225, frustum_collision_test :124)
— pure numpy, but the module imports numba + mmdet3d which are not installed,
so the test extracts exactly those three functions from the source AST and
runs them against mobi_tpu.data.geometry's vectorized re-implementations.
"""
import ast
import os
from typing import Optional

import numpy as np
import pytest

REF_FILE = "/root/reference/bevfusion/mmdet3d/datasets/pipelines/utils.py"
if not os.path.isfile(REF_FILE):
    pytest.skip("reference tree not mounted", allow_module_level=True)

from mobi_tpu.data.geometry import (  # noqa: E402
    frustum_collision_test,
    frustum_iou_matrix,
    get_frustum,
    transform_to_spherical,
)


class _FakeTensor:
    def __init__(self, a):
        self._a = a

    def numpy(self):
        return self._a


class _FakeLidarBoxes:
    """Stands in for mmdet3d LiDARInstance3DBoxes: the test feeds CORNERS
    directly, so .corners is a pass-through."""

    def __init__(self, corners, box_dim=9):
        self._c = np.asarray(corners, dtype=np.float64)

    @property
    def corners(self):
        return _FakeTensor(self._c)


def _load_reference_functions():
    src = open(REF_FILE).read()
    tree = ast.parse(src)
    wanted = {"transform_to_spherical", "get_frustum", "frustum_collision_test"}
    ns = {
        "np": np,
        "Optional": Optional,
        "LiDARInstance3DBoxes": _FakeLidarBoxes,
    }
    found = set()
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name in wanted:
            assert not node.decorator_list, f"{node.name} unexpectedly decorated"
            mod = ast.Module(body=[node], type_ignores=[])
            exec(compile(mod, REF_FILE, "exec"), ns)  # noqa: S102 - test-only
            found.add(node.name)
    assert found == wanted, f"missing {wanted - found}"
    return ns


REF = _load_reference_functions()


def random_corners(n, rng, straddle_x_axis=False):
    """Random upright boxes as [n, 8, 3] corners."""
    out = []
    for _ in range(n):
        if straddle_x_axis:
            cx = rng.uniform(5, 30)
            cy = rng.uniform(-1.0, 1.0)
        else:
            cx, cy = rng.uniform(-30, 30, 2)
            if abs(cx) < 3 and abs(cy) < 3:
                cx += 6
        cz = rng.uniform(-1, 1)
        dx, dy, dz = rng.uniform(0.8, 4.0, 3)
        yaw = rng.uniform(0, 2 * np.pi)
        c, s = np.cos(yaw), np.sin(yaw)
        base = np.array(
            [[-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
             [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1]],
            dtype=np.float64,
        ) * np.array([dx, dy, dz]) / 2
        rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        out.append(base @ rot.T + np.array([cx, cy, cz]))
    return np.stack(out)


def test_transform_to_spherical_parity():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-50, 50, (500, 3))
    ref = REF["transform_to_spherical"](pts.copy())
    ours = transform_to_spherical(pts)
    np.testing.assert_allclose(ours, ref, atol=1e-12)


@pytest.mark.parametrize("straddle", [False, True])
def test_get_frustum_parity(straddle):
    rng = np.random.default_rng(1 if straddle else 2)
    corners = random_corners(12, rng, straddle_x_axis=straddle)
    ref = REF["get_frustum"](corners.copy())
    ours = get_frustum(corners)
    if straddle:
        assert np.any(ours[:, 2, 1, 1] > 0), "no wraparound case generated"
    np.testing.assert_allclose(ours, ref, atol=1e-10)


def test_frustum_iou_matrix_parity():
    rng = np.random.default_rng(3)
    corners = np.concatenate(
        [random_corners(10, rng), random_corners(4, rng, straddle_x_axis=True)]
    )
    frustums = get_frustum(corners)
    ref_mat = REF["frustum_collision_test"](
        np.asarray(frustums, np.float64), apply_thresh=False
    )
    ours = frustum_iou_matrix(frustums)
    np.testing.assert_allclose(ours, ref_mat, atol=1e-6)
    # the IoU is a percentage, not a binary flag
    off_diag = ours[~np.eye(len(ours), dtype=bool)]
    assert off_diag.max() <= 1.01
    if off_diag.max() > 0:
        assert np.any((off_diag > 0) & (off_diag < 1.0)), (
            "expected at least one PARTIAL overlap in the random scene"
        )


def test_frustum_collision_threshold_parity():
    rng = np.random.default_rng(4)
    corners = random_corners(8, rng)
    frustums = get_frustum(corners)
    ref_mat = REF["frustum_collision_test"](
        np.asarray(frustums, np.float64), thresh=0.7, apply_thresh=True
    )
    ours = frustum_collision_test(frustums, thresh=0.7)
    np.testing.assert_array_equal(ours, ref_mat)


def test_overlapping_boxes_partial_iou():
    """Two boxes at the same azimuth but different ranges: frustums overlap
    heavily; a third box far to the side does not (filter decision check
    against a hand-built scene, VERDICT item 6)."""
    base = np.array(
        [[-1, -1, -0.5], [1, -1, -0.5], [1, 1, -0.5], [-1, 1, -0.5],
         [-1, -1, 0.5], [1, -1, 0.5], [1, 1, 0.5], [-1, 1, 0.5]],
        dtype=np.float64,
    )
    near = base + np.array([10, 0, 0])       # 2m-wide box 10m down the +x ray
    far = base * 2.5 + np.array([25, 0, 0])  # bigger box straight behind it
    side = base + np.array([0, 25, 0])       # off to the side (+y)
    frustums = get_frustum(np.stack([near, far, side]))
    iou = frustum_iou_matrix(frustums)
    np.fill_diagonal(iou, 0)
    assert iou[0, 1] > 0.5, f"stacked-in-depth boxes should overlap: {iou[0,1]}"
    assert iou[0, 2] == 0.0 and iou[1, 2] == 0.0
    # with the reference threshold, near/far collide, side does not
    coll = frustum_collision_test(frustums, thresh=0.7)
    np.fill_diagonal(coll, False)
    assert not coll[0, 2] and not coll[2, 0]

import numpy as np
import pytest

from mobi_tpu.data.geometry import (
    box_collision_test,
    expand_bbox_corners,
    frustum_collision_test,
    get_2d_bbox,
    get_frustum,
    get_inpaint_mask,
    get_range_inpaint_mask,
    points_in_bbox_corners,
    project_to_image,
    rotate_bbox,
    translate_bbox,
)


def make_box(center, size, yaw=0.0):
    """Rectangular box corners in the BOX_FACES ordering: bottom [0,1,2,3],
    top [4,5,6,7], verticals (i, i+4)."""
    l, w, h = size
    base = np.array(
        [
            [l / 2, w / 2, 0], [l / 2, -w / 2, 0],
            [-l / 2, -w / 2, 0], [-l / 2, w / 2, 0],
        ]
    )
    c, s = np.cos(yaw), np.sin(yaw)
    rot = np.array([[c, -s], [s, c]])
    base[:, :2] = base[:, :2] @ rot.T
    bottom = base + np.asarray([center[0], center[1], center[2] - h / 2])
    top = bottom + np.array([0, 0, h])
    return np.concatenate([bottom, top], axis=0)


def test_expand_and_rotate_preserve_center():
    box = make_box((5, 2, 0), (4, 2, 1.5), yaw=0.3)
    ex = expand_bbox_corners(box, 0.1)
    np.testing.assert_allclose(ex.mean(0), box.mean(0), atol=1e-9)
    np.testing.assert_allclose(
        np.linalg.norm(ex - ex.mean(0), axis=1),
        1.1 * np.linalg.norm(box - box.mean(0), axis=1),
        rtol=1e-9,
    )
    rot = rotate_bbox(box, 90.0)
    np.testing.assert_allclose(rot.mean(0), box.mean(0), atol=1e-9)
    tr = translate_bbox(box, np.array([0.0, 0.0, 0.0]))
    np.testing.assert_allclose(tr.mean(0), 0, atol=1e-9)


def test_project_to_image_pinhole():
    # simple pinhole: x_img = fx * X/Z + cx with lidar (x fwd) -> cam (z fwd)
    lidar2image = np.array(
        [
            [0, -100, 0, 320],   # u = -100*y/x + 320... (after divide by depth)
            [0, 0, -100, 240],
            [1, 0, 0, 0],        # depth = x
            [0, 0, 0, 1],
        ],
        dtype=np.float64,
    )
    # u-row must be  [ -100*y + 320*x ] / x  -> build accordingly:
    lidar2image[0] = [320, -100, 0, 0]
    lidar2image[1] = [240, 0, -100, 0]
    pts = np.array([[10.0, 0.0, 0.0]] * 8)
    xy = project_to_image(pts, lidar2image)
    np.testing.assert_allclose(xy, [[320, 240]] * 8, atol=1e-9)
    with_d = project_to_image(pts, lidar2image, include_depth=True)
    np.testing.assert_allclose(with_d[:, 2], 10.0)


def test_points_in_bbox_corners_axis_aligned():
    box = make_box((0, 0, 1), (2, 2, 2))
    pts = np.array(
        [[0, 0, 1], [0.9, 0.9, 1.9], [1.1, 0, 1], [0, 0, 2.1], [-0.99, -0.99, 0.01]]
    )
    inside = points_in_bbox_corners(pts, box[None])
    np.testing.assert_array_equal(inside[:, 0], [True, True, False, False, True])


def test_points_in_bbox_corners_rotated():
    box = make_box((5, 5, 0), (4, 1, 1), yaw=np.pi / 4)
    # a point along the rotated long axis stays inside; same offset along the
    # unrotated axis falls outside
    along = np.array([5 + 1.8 * np.cos(np.pi / 4), 5 + 1.8 * np.sin(np.pi / 4), 0])
    off = np.array([5 + 1.8, 5, 0.0])
    inside = points_in_bbox_corners(np.stack([along, off]), box[None])
    np.testing.assert_array_equal(inside[:, 0], [True, False])


def test_points_in_multiple_boxes_shape():
    boxes = np.stack([make_box((0, 0, 0), (2, 2, 2)), make_box((10, 0, 0), (2, 2, 2))])
    pts = np.array([[0, 0, 0], [10, 0, 0], [5, 0, 0]])
    res = points_in_bbox_corners(pts, boxes)
    assert res.shape == (3, 2)
    np.testing.assert_array_equal(res, [[True, False], [False, True], [False, False]])


def test_box_collision_test():
    a = make_box((0, 0, 0), (2, 2, 1))
    b = make_box((1.5, 0, 0), (2, 2, 1))   # overlaps a
    c = make_box((5, 5, 0), (2, 2, 1))     # far away
    d = make_box((2.5, 2.5, 0), (2, 2, 1), yaw=np.pi / 4)  # rotated, touching region
    res = box_collision_test(np.stack([a]), np.stack([b, c, d]))
    assert res.shape == (1, 3)
    assert res[0, 0] and not res[0, 1]


def test_frustum_blocks_occluded_box():
    box = make_box((10, 0, 0), (2, 2, 2))
    behind = make_box((20, 0, 0), (2, 2, 2))  # same azimuth, farther
    aside = make_box((10, 15, 0), (2, 2, 2))  # different azimuth
    fr = get_frustum(np.stack([box, behind, aside]))
    res = frustum_collision_test(fr[:1], fr[1:], thresh=0.5)
    assert res[0, 0] and not res[0, 1]


def test_inpaint_mask_zero_inside():
    lidar2image = np.zeros((4, 4))
    lidar2image[0] = [320, -100, 0, 0]
    lidar2image[1] = [240, 0, -100, 0]
    lidar2image[2] = [1, 0, 0, 0]
    lidar2image[3] = [0, 0, 0, 1]
    box = make_box((10, 0, 0), (2, 2, 2))
    mask = get_inpaint_mask(box, lidar2image, 480, 640, expand_ratio=0.0)
    assert mask.shape == (480, 640)
    assert mask[240, 320] == 0.0       # object center -> masked (0)
    assert mask[10, 10] == 1.0         # far corner -> kept
    frac = 1 - mask.mean()
    assert 0.001 < frac < 0.2


def test_range_inpaint_mask_shape_and_content():
    box = make_box((10, 0, 0), (3, 3, 3))
    mask = get_range_inpaint_mask(box, 512, 512, expand_ratio=0.1)
    assert mask.shape == (512, 512)
    assert (mask == 0).any() and (mask == 1).any()

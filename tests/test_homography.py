"""Homography / grid classification parity with the OpenCV-based reference."""

import numpy as np
import pytest

from objectpermanence_tpu.ops import homography as H

cv2 = pytest.importorskip("cv2")


def test_fit_homography_matches_cv2():
    points_3d = np.array([
        [-3.0, -3.0, H.PLANE_Z],
        [0.0, 3.0, H.PLANE_Z],
        [-3.0, 0.0, H.PLANE_Z],
        [0.0, 0.0, H.PLANE_Z],
    ])
    img = H.project_3d_point(points_3d)
    h_cv, _ = cv2.findHomography(img.astype(np.float64), points_3d[:, :2])
    np.testing.assert_allclose(H.H_IMAGE_TO_PLANE, h_cv, rtol=1e-6, atol=1e-8)


def test_perspective_transform_matches_cv2():
    rng = np.random.RandomState(0)
    pts = rng.uniform(-1, 1, (20, 2))
    ref = cv2.perspectiveTransform(
        pts.reshape(-1, 1, 2), H.H_IMAGE_TO_PLANE).reshape(-1, 2)
    got = H.perspective_transform(pts, H.H_IMAGE_TO_PLANE)
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-9)


def test_grid_class_range_and_vectorized_consistency():
    rng = np.random.RandomState(1)
    centers = np.stack([rng.uniform(0, 320, 50), rng.uniform(0, 240, 50)], axis=-1)
    vec = H.grid_classes_for_centers(centers)
    assert vec.min() >= 0 and vec.max() < 36
    for i, (cx, cy) in enumerate(centers):
        scalar = H.get_class_prediction(cx * 2 / 320 - 1, cy * 2 / 240 - 1)
        assert scalar == vec[i]


def test_projection_roundtrip():
    # points on the object plane project to image and back to themselves
    rng = np.random.RandomState(2)
    plane_pts = rng.uniform(-2.5, 2.5, (10, 2))
    pts3d = np.hstack([plane_pts, np.full((10, 1), H.PLANE_Z)])
    img = H.project_3d_point(pts3d)
    back = H.perspective_transform(img, H.H_IMAGE_TO_PLANE)
    np.testing.assert_allclose(back, plane_pts, rtol=1e-5, atol=1e-7)

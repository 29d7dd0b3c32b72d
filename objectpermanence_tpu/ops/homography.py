"""CATER camera projection + image->ground-plane homography + 6x6 grid
classification, as pure numpy (no OpenCV dependency on the compute path).

Reference: `baselines/proj_utils.py` — the camera matrix is the fixed CATER
render camera; the homography maps image-plane points (in [-1, 1] coords)
back to the z=Z ground plane, and `get_class_prediction` bins the projected
point into the CATER 6x6 grid class id.
"""

import math

import numpy as np

# Fixed CATER camera (reference `proj_utils.py:11-15`).
CATER_CAM = np.array([
    (1.4503, 1.6376, 0.0000, -0.0251),
    (-1.0346, 0.9163, 2.5685, 0.0095),
    (-0.6606, 0.5850, -0.4748, 10.5666),
    (-0.6592, 0.5839, -0.4738, 10.7452),
])

# Height of the CATER object plane (reference `proj_utils.py:39`).
PLANE_Z = 0.3421497941017151


def project_3d_point(pts: np.ndarray, cam: np.ndarray = None) -> np.ndarray:
    """Project (N, 3) world points to (N, 2) image coords in [-1, 1]
    (the Y axis negated so low Y is at the top), reference
    `proj_utils.py:18-32`. `cam` overrides the fixed CATER camera (see
    `camera_matrix_at` — used by the simulator's camera-motion mode)."""
    pts = np.asarray(pts, dtype=np.float64)
    homo = np.hstack([pts, np.ones((pts.shape[0], 1))])
    p = ((CATER_CAM if cam is None else cam) @ homo.T).T
    out = np.empty((pts.shape[0], 2))
    out[:, 0] = p[:, 0] / p[:, -1]
    out[:, 1] = -p[:, 1] / p[:, -1]
    return out


def camera_center() -> np.ndarray:
    """The CATER camera's world location, recovered from the projection
    matrix itself (rows x, y, w form P = K[R | -R C]; C = -M^-1 p4)."""
    p = CATER_CAM[[0, 1, 3], :]
    return -np.linalg.solve(p[:, :3], p[:, 3])


def camera_matrix_at(location: np.ndarray) -> np.ndarray:
    """The CATER projection matrix with the camera TRANSLATED to `location`
    (rotation/intrinsics unchanged) — exactly what the reference's random
    camera motion does (`render_videos.py:834-843` keyframes
    Camera.location only). Moving the camera by d equals translating the
    world by -d, so the new matrix is CATER_CAM @ [[I, -d], [0, 1]]."""
    d = np.asarray(location, dtype=np.float64) - camera_center()
    t = np.eye(4)
    t[:3, 3] = -d
    return CATER_CAM @ t


def fit_homography(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """DLT fit of the 3x3 homography H with dst ~ H @ src (homogeneous),
    replacing `cv2.findHomography` for the exact 4-point case."""
    src = np.asarray(src, dtype=np.float64)
    dst = np.asarray(dst, dtype=np.float64)
    n = src.shape[0]
    a = []
    for i in range(n):
        x, y = src[i]
        u, v = dst[i]
        a.append([-x, -y, -1, 0, 0, 0, u * x, u * y, u])
        a.append([0, 0, 0, -x, -y, -1, v * x, v * y, v])
    a = np.asarray(a)
    _, _, vt = np.linalg.svd(a)
    h = vt[-1].reshape(3, 3)
    return h / h[2, 2]


def _ground_plane_homography() -> np.ndarray:
    """Image plane -> CATER ground plane (z=PLANE_Z), fit from 4 reference
    points exactly as `proj_utils.py:39-47`."""
    points_3d = np.array([
        [-3.0, -3.0, PLANE_Z],
        [0.0, 3.0, PLANE_Z],
        [-3.0, 0.0, PLANE_Z],
        [0.0, 0.0, PLANE_Z],
    ])
    points_img = project_3d_point(points_3d)
    return fit_homography(points_img, points_3d[:, :2])


H_IMAGE_TO_PLANE = _ground_plane_homography()


def perspective_transform(points: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Apply homography h to (N, 2) points (cv2.perspectiveTransform)."""
    points = np.asarray(points, dtype=np.float64)
    homo = np.hstack([points, np.ones((points.shape[0], 1))])
    mapped = (h @ homo.T).T
    return mapped[:, :2] / mapped[:, 2:3]


def get_class_prediction(cx: float, cy: float, nrows: int = 3, ncols: int = 3) -> int:
    """Image-plane point (in [-1, 1] coords) -> CATER grid class id
    (reference `proj_utils.py:50-75`). With nrows=ncols=3 the grid has
    6x6 = 36 classes (labels were generated w.r.t. a 6x6 grid)."""
    pt = perspective_transform(np.array([[cx, cy]]), H_IMAGE_TO_PLANE)[0]
    x = min(max(-3.0, pt[0]), 3.0 - 1e-5)
    y = min(max(-3.0, pt[1]), 3.0 - 1e-5)
    x *= ncols / 3.0
    y *= nrows / 3.0
    x1 = int(math.floor(x)) + ncols
    y1 = int(math.floor(y)) + nrows
    cls_id = y1 * (2 * ncols) + x1
    assert 0 <= cls_id < 4 * nrows * ncols, f"cls_id: {cls_id} x: {x} y: {y}"
    return cls_id


def grid_classes_for_centers(centers_px: np.ndarray, frame_w: int = 320,
                             frame_h: int = 240) -> np.ndarray:
    """Vectorized pixel-center -> grid-class mapping for (N, 2) centers
    (the cater_setup_inference path, `cater_setup_inference.py:24-32`)."""
    centers_px = np.asarray(centers_px, dtype=np.float64)
    norm = np.stack([
        centers_px[:, 0] * 2.0 / frame_w - 1.0,
        centers_px[:, 1] * 2.0 / frame_h - 1.0,
    ], axis=-1)
    pts = perspective_transform(norm, H_IMAGE_TO_PLANE)
    x = np.clip(pts[:, 0], -3.0, 3.0 - 1e-5)
    y = np.clip(pts[:, 1], -3.0, 3.0 - 1e-5)
    x1 = np.floor(x).astype(np.int64) + 3
    y1 = np.floor(y).astype(np.int64) + 3
    return y1 * 6 + x1

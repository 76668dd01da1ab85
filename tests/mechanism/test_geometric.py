import numpy as np
import pytest

from vkit_tpu.element import Image, Mask, Point, PointTuple, Polygon
from vkit_tpu.mechanism.distortion import geometric as gm


@pytest.fixture(scope='module')
def image():
    rng = np.random.default_rng(0)
    small = rng.integers(0, 256, (8, 12, 3), dtype=np.uint8)
    # Smooth image via kron upsample.
    return Image(mat=np.kron(small, np.ones((8, 8, 1), dtype=np.uint8)))


def test_rotate_90(image):
    result = gm.rotate.distort(
        {'angle': 90}, image=image,
        polygons=[Polygon.from_xy_pairs([(10, 10), (30, 10), (30, 20), (10, 20)])],
        get_active_mask=True,
    )
    assert result.shape == (image.width, image.height)
    assert result.image.shape == result.shape
    # 90-degree CW rotate with the reference's one-pixel canvas shift
    # (shift_x = ceil(H*sin) = H, so content lands one column right of an
    # exact np.rot90 and the last column clips; affine.py:198-275 semantics).
    expected = np.rot90(image.mat, k=-1)
    mismatch = np.mean(
        np.abs(result.image.mat[:, 1:].astype(int) - expected[:, :-1].astype(int))
    )
    assert mismatch < 3.0
    # Polygon rotated consistently.
    polygon = result.polygons[0]
    xs = [p.x for p in polygon.points]
    assert min(xs) >= image.height - 1 - 20 - 1


def test_rotate_arbitrary_shapes(image):
    for angle in (17, 113, 205, 331):
        result = gm.rotate.distort({'angle': angle}, image=image, get_active_mask=True)
        assert result.image.shape == result.shape
        assert result.active_mask.shape == result.shape
        # Active mask covers a reasonable fraction.
        frac = result.active_mask.mat.mean()
        assert 0.3 < frac <= 1.0


def test_shear_hori(image):
    result = gm.shear_hori.distort({'angle': 20}, image=image)
    assert result.shape[0] == image.height
    assert result.shape[1] > image.width


def test_shear_vert(image):
    result = gm.shear_vert.distort({'angle': -15}, image=image)
    assert result.shape[1] == image.width
    assert result.shape[0] > image.height


def test_skew(image):
    result = gm.skew_hori.distort({'ratio': 0.3}, image=image)
    assert result.shape == image.shape
    result = gm.skew_vert.distort({'ratio': -0.3}, image=image)
    assert result.shape == image.shape


def test_affine_point_raster_consistency(image):
    # A point on a distinctive pixel must land on the same content after warp.
    config = {'angle': 37}
    src_point = Point.create(y=image.height // 2, x=image.width // 2)
    result = gm.rotate.distort(config, image=image, point=src_point)
    y, x = result.point.y, result.point.x
    assert 0 <= y < result.shape[0] and 0 <= x < result.shape[1]
    src_val = image.mat[src_point.y, src_point.x].astype(int)
    # Bilinear blending near block edges: check the 3x3 neighborhood around
    # the mapped point contains the source content.
    neighborhood = result.image.mat[
        max(y - 1, 0):y + 2, max(x - 1, 0):x + 2
    ].astype(int).reshape(-1, 3)
    best = np.abs(neighborhood - src_val).mean(axis=1).min()
    assert best < 40


def test_camera_cubic_curve(image):
    config = {
        'curve_alpha': 20, 'curve_beta': -20,
        'curve_direction': 0, 'curve_scale': 1.0,
        'camera_model_config': {
            'rotation_unit_vec': [1.0, 0.0, 0.0],
            'rotation_theta': 30,
        },
        'grid_size': 10,
    }
    result = gm.camera_cubic_curve.distort(
        config, image=image, get_active_mask=True,
        points=PointTuple.from_xy_pairs([(5, 5), (20, 30)]),
    )
    assert result.image.shape == result.shape
    assert result.active_mask.mat.any()
    assert len(result.points) == 2


def test_camera_plane_line_fold(image):
    config = {
        'fold_point': (30, 30),
        'fold_direction': 45,
        'fold_perturb_vec': (0.0, 0.0, 15.0),
        'fold_alpha': 0.5,
        'camera_model_config': {
            'rotation_unit_vec': [0.0, 1.0, 0.0],
            'rotation_theta': 20,
        },
        'grid_size': 10,
    }
    result = gm.camera_plane_line_fold.distort(config, image=image)
    assert result.image.shape == result.shape


def test_camera_plane_line_curve(image):
    config = {
        'curve_point': (30, 30),
        'curve_direction': 90,
        'curve_perturb_vec': (0.0, 0.0, 10.0),
        'curve_alpha': 2.0,
        'camera_model_config': {
            'rotation_unit_vec': [0.0, 1.0, 0.0],
            'rotation_theta': -15,
        },
        'grid_size': 10,
    }
    result = gm.camera_plane_line_curve.distort(config, image=image)
    assert result.image.shape == result.shape


def test_camera_plane_only_identity_rotation(image):
    # Tiny rotation: output shape close to input, content mostly preserved.
    config = {
        'camera_model_config': {
            'rotation_unit_vec': [1.0, 0.0, 0.0],
            'rotation_theta': 1,
        },
        'grid_size': 10,
    }
    result = gm.camera_plane_only.distort(config, image=image)
    assert abs(result.shape[0] - image.height) < 8
    assert abs(result.shape[1] - image.width) < 8


def test_rodrigues_vs_cv2():
    cv2 = pytest.importorskip('cv2')
    rng = np.random.default_rng(0)
    for _ in range(5):
        vec = rng.normal(size=3)
        theta = float(np.linalg.norm(vec))
        mine = gm.camera.axis_angle_rotation(vec / theta, theta)
        ref, _ = cv2.Rodrigues(vec)
        assert np.allclose(mine, ref, atol=1e-8)


def test_camera_projection_vs_cv2():
    cv2 = pytest.importorskip('cv2')
    config = gm.CameraModelConfig(
        rotation_unit_vec=[0.3, 0.5, 0.8],
        rotation_theta=25,
        focal_length=100.0,
        principal_point=[50, 60],
        camera_distance=100.0,
    )
    model = gm.PinholeCamera(config)
    axis = np.asarray(config.rotation_unit_vec, dtype=np.float64)
    axis /= np.linalg.norm(axis)
    rotation_vec = axis * np.radians(config.rotation_theta)
    pts = np.random.default_rng(1).uniform(0, 100, (10, 3))
    mine = model.project(pts)
    ref, _ = cv2.projectPoints(
        pts,
        rotation_vec,
        model.translation.reshape(3, 1),
        np.array([[100.0, 0, 0], [0, 100.0, 0], [0, 0, 1]]),
        np.zeros(5),
    )
    assert np.allclose(mine, ref.reshape(-1, 2), atol=1e-6)


def test_similarity_mls(image):
    src = PointTuple.from_xy_pairs([(0, 0), (90, 0), (90, 60), (0, 60), (45, 30)])
    dst = PointTuple.from_xy_pairs([(0, 0), (90, 0), (90, 60), (0, 60), (55, 35)])
    result = gm.similarity_mls.distort(
        {
            'src_handle_points': src,
            'dst_handle_points': dst,
            'grid_size': 10,
        },
        image=image,
        get_state=True,
    )
    assert result.image.shape == result.shape
    # Handles at corners pin the boundary: shape roughly preserved.
    assert abs(result.shape[0] - image.height) < 12
    assert abs(result.shape[1] - image.width) < 14


def test_mls_handle_identity():
    src = PointTuple.from_xy_pairs([(0, 0), (10, 0), (10, 10), (0, 10)])
    dst = PointTuple.from_xy_pairs([(0, 0), (10, 0), (10, 10), (0, 10)])
    from vkit_tpu.mechanism.distortion.geometric.mls import similarity_mls_map
    np_src = np.asarray(src.to_smooth_xy_pairs(), dtype=np.float64)
    np_dst = np.asarray(dst.to_smooth_xy_pairs(), dtype=np.float64)
    out = similarity_mls_map(np_src, np_dst,
                             np.array([[5.0, 5.0], [0.0, 0.0], [2.0, 7.0]]))
    assert np.allclose(out, [[5, 5], [0, 0], [2, 7]], atol=1e-6)


def test_grid_remap_vs_cv2_perspective(image):
    # A single-cell grid warp must match a plain perspective warp.
    cv2 = pytest.importorskip('cv2')
    from vkit_tpu.mechanism.distortion.warp_plan import WarpPlan, warp_image
    h, w = image.shape
    src_lat = np.asarray(
        [[(0, 0), (w - 1, 0)], [(0, h - 1), (w - 1, h - 1)]], dtype=np.float64
    )
    dst_lat = np.asarray(
        [[(3, 2), (w - 6, 0)], [(0, h - 4), (w - 1, h - 1)]], dtype=np.float64
    )
    plan = WarpPlan(
        src_shape=(h, w), dst_shape=(h, w),
        src_lattice=src_lat, dst_lattice=dst_lat, grid_size=max(h, w),
    )
    out = warp_image(plan, image)
    mat = cv2.getPerspectiveTransform(
        np.array([[0, 0], [w - 1, 0], [0, h - 1], [w - 1, h - 1]], dtype=np.float32),
        np.array([[3, 2], [w - 6, 0], [0, h - 4], [w - 1, h - 1]], dtype=np.float32),
    )
    ref = cv2.warpPerspective(
        image.mat, mat, (out.width, out.height), flags=cv2.INTER_LINEAR
    )
    # Interior agreement (borders differ due to fill-poly coverage rules).
    inner = (slice(4, -4), slice(4, -4))
    mae = np.mean(np.abs(out.mat[inner].astype(float) - ref[inner].astype(float)))
    assert mae < 8.0

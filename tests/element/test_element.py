import numpy as np
import pytest

from vkit_tpu.element import (
    Box,
    ElementSetOperationMode,
    Image,
    ImageMode,
    Interpolation,
    Lexicon,
    LexiconCollection,
    Mask,
    Point,
    PointList,
    Polygon,
    ScoreMap,
)


def test_point_rounding_and_eq():
    p = Point.create(y=1.4, x=2.6)
    assert (p.y, p.x) == (1, 3)
    assert p == Point.create(y=1.0, x=3.0)
    assert p.to_xy_pair() == (3, 1)
    shifted = p.to_shifted_point(offset_y=2, offset_x=-1)
    assert (shifted.smooth_y, shifted.smooth_x) == (3.4, 1.6)


def test_point_list_roundtrip():
    pl = PointList.from_flatten_xy_pairs([0, 1, 2, 3, 4, 5])
    assert pl.to_flatten_xy_pairs() == [0, 1, 2, 3, 4, 5]
    assert pl.to_np_array().shape == (3, 2)


def test_box_basics():
    box = Box(up=2, down=5, left=3, right=9)
    assert box.height == 4 and box.width == 7 and box.area == 28
    polygon = box.to_polygon()
    assert polygon.to_xy_pairs() == [(3, 2), (9, 2), (9, 5), (3, 5)]
    # to_resized_box scales coordinates into the resized frame (and clips to
    # its bounds, matching resize_val semantics).
    resized = box.to_resized_box(resized_height=8, resized_width=14)
    assert resized == Box(up=4, down=7, left=6, right=13)


def test_box_fill_extract_roundtrip():
    mask = Mask.from_shape((10, 10))
    box = Box(up=2, down=4, left=3, right=6)
    box.fill_mask(mask)
    assert mask.mat.sum() == box.height * box.width
    sub = box.extract_mask(mask)
    assert sub.mat.shape == (3, 4)
    assert sub.mat.all()


def test_mask_set_ops():
    b0 = Box(up=0, down=4, left=0, right=4)
    b1 = Box(up=2, down=6, left=2, right=6)
    union = Mask.from_boxes((8, 8), [b0, b1], ElementSetOperationMode.UNION)
    distinct = Mask.from_boxes((8, 8), [b0, b1], ElementSetOperationMode.DISTINCT)
    intersect = Mask.from_boxes((8, 8), [b0, b1], ElementSetOperationMode.INTERSECT)
    assert intersect.mat.sum() == 9  # 3x3 overlap
    assert union.mat.sum() == 25 + 25 - 9
    assert distinct.mat.sum() == union.mat.sum() - intersect.mat.sum()


def test_polygon_mask_and_fill():
    polygon = Polygon.from_xy_pairs([(2, 2), (8, 2), (8, 8), (2, 8)])
    assert abs(polygon.area - 36.0) < 1e-6
    mask = Mask.from_shape((12, 12))
    polygon.fill_mask(mask)
    # Inclusive raster of a 6x6 box covers 7x7 pixels.
    assert mask.mat.sum() == 49
    assert polygon.bounding_box == Box(up=2, down=8, left=2, right=8)


def test_polygon_shrink_dilate():
    polygon = Polygon.from_xy_pairs([(10, 10), (50, 10), (50, 50), (10, 50)])
    shrank = polygon.to_shrank_polygon(ratio=0.4)
    assert 0 < shrank.area < polygon.area
    dilated = polygon.to_dilated_polygon(ratio=0.4)
    assert dilated.area > polygon.area


def test_mask_disconnected_polygons_roundtrip():
    mask = Mask.from_shape((30, 40))
    with mask.writable_context:
        mask.mat[5:10, 5:15] = 1
        mask.mat[20:25, 25:35] = 1
    polygons = mask.to_disconnected_polygons()
    assert len(polygons) == 2
    refilled = Mask.from_shape((30, 40))
    refilled.fill_by_polygons(polygons)
    assert np.array_equal(refilled.mat, mask.mat)


def test_mask_external_box():
    mask = Mask.from_shape((10, 10))
    with mask.writable_context:
        mask.mat[3:7, 2:9] = 1
    assert mask.to_external_box() == Box(up=3, down=6, left=2, right=8)


def test_score_map_fill_and_threshold():
    sm = ScoreMap.from_shape((10, 10))
    box = Box(up=0, down=4, left=0, right=4)
    box.fill_score_map(sm, 0.7)
    assert np.isclose(sm.mat[2, 2], 0.7)
    m = sm.to_mask(threshold=0.5)
    assert m.mat.sum() == 25


def test_score_map_quad_interpolation():
    sm = ScoreMap.from_quad_interpolation(
        point0=Point.create(y=0, x=0),
        point1=Point.create(y=0, x=10),
        point2=Point.create(y=10, x=10),
        point3=Point.create(y=10, x=0),
        func_np_uv_to_mat=lambda np_uv: np_uv[..., 1].astype(np.float32),
    )
    # v goes 0 at top to 1 at bottom.
    assert sm.mat[0, 5] < 0.2
    assert sm.mat[9, 5] > 0.7


def test_image_modes_and_conversion_roundtrip():
    rng = np.random.default_rng(0)
    mat = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    image = Image(mat=mat)
    assert image.mode is ImageMode.RGB

    gray = image.to_grayscale_image()
    assert gray.mode is ImageMode.GRAYSCALE and gray.mat.ndim == 2

    hsv = image.to_hsv_image()
    back = hsv.to_rgb_image()
    assert np.mean(np.abs(back.mat.astype(int) - mat.astype(int))) < 2.0

    hsl = image.to_hsl_image()
    back2 = hsl.to_rgb_image()
    assert np.mean(np.abs(back2.mat.astype(int) - mat.astype(int))) < 2.5

    rgba = image.to_rgba_image()
    assert rgba.num_channels == 4


def test_image_colorspace_vs_cv2():
    cv2 = pytest.importorskip('cv2')
    rng = np.random.default_rng(1)
    mat = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    image = Image(mat=mat)

    ref_gray = cv2.cvtColor(mat, cv2.COLOR_RGB2GRAY)
    gray_diff = np.abs(
        image.to_grayscale_image().mat.astype(int) - ref_gray.astype(int)
    )
    assert gray_diff.max() <= 1  # cv2 SIMD rounding wobbles the .5 boundary

    ref_hsv = cv2.cvtColor(mat, cv2.COLOR_RGB2HSV_FULL)
    diff = np.abs(
        image.to_hsv_image().mat.astype(int) - ref_hsv.astype(int)
    )
    # Hue wraps at 256.
    diff = np.minimum(diff, 256 - diff)
    assert diff.max() <= 1

    ref_hls = cv2.cvtColor(mat, cv2.COLOR_RGB2HLS_FULL)
    ref_hsl = ref_hls[:, :, [0, 2, 1]]
    diff = np.abs(image.to_hsl_image().mat.astype(int) - ref_hsl.astype(int))
    diff = np.minimum(diff, 256 - diff)
    assert diff.max() <= 1


def test_image_gcn_roundtrip():
    rng = np.random.default_rng(2)
    mat = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    image = Image(mat=mat)
    gcn = image.to_gcn_image()
    assert gcn.mode is ImageMode.RGB_GCN
    restored = gcn.to_non_gcn_image()
    assert restored.mode is ImageMode.RGB


def test_image_resize_vs_cv2():
    cv2 = pytest.importorskip('cv2')
    rng = np.random.default_rng(3)
    mat = rng.integers(0, 256, size=(40, 60, 3), dtype=np.uint8)
    image = Image(mat=mat)

    for interp, cv_code in [
        (Interpolation.LINEAR, cv2.INTER_LINEAR),
        (Interpolation.CUBIC, cv2.INTER_CUBIC),
        (Interpolation.LANCZOS4, cv2.INTER_LANCZOS4),
        (Interpolation.AREA, cv2.INTER_AREA),
    ]:
        mine = image.to_resized_image(
            resized_height=23, resized_width=31, interpolation=interp
        ).mat
        ref = cv2.resize(mat, (31, 23), interpolation=cv_code)
        mae = np.mean(np.abs(mine.astype(float) - ref.astype(float)))
        assert mae < 1.0, (interp, mae)


def test_mask_resize():
    mask = Mask.from_shape((20, 20))
    with mask.writable_context:
        mask.mat[5:15, 5:15] = 1
    resized = mask.to_resized_mask(resized_height=40, resized_width=40)
    # threshold-at-zero after cubic upscale keeps the interpolation ring, so
    # the active area lands near (2*10+2)^2.
    assert 400 <= int(resized.mat.sum()) <= 530


def test_lexicon_collection():
    lc = LexiconCollection(lexicons=[
        Lexicon(char='a', aliases=('A',), tags=('en',)),
        Lexicon(char='b', tags=('en',)),
        Lexicon(char='!', tags=()),
    ])
    assert lc.has_char('A')
    assert lc.get_lexicon('A').char == 'a'
    assert lc.tags == ['__no_tag', 'en']
    assert len(lc.tag_to_lexicons['en']) == 2
    assert len(lc.get_hash()) == 64


def test_mask_fill_image_with_alpha():
    image = Image.from_shape((10, 10), value=0)
    mask = Mask.from_shape((10, 10))
    with mask.writable_context:
        mask.mat[2:8, 2:8] = 1
    mask.fill_image(image, value=(200, 100, 50), alpha=0.5)
    assert tuple(image.mat[5, 5]) == (100, 50, 25)
    assert tuple(image.mat[0, 0]) == (0, 0, 0)

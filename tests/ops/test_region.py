"""Device text-region forms vs the host per-region paths."""
import numpy as np
import jax.numpy as jnp

from vkit_tpu.element import Image
from vkit_tpu.mechanism.distortion import rotate
from vkit_tpu.ops.region import (
    region_flatten_point_map,
    batch_char_heatmaps,
    batch_flatten_regions,
    plan_region_flatten,
)


def _smooth(rng, h, w, c=3):
    base = np.cumsum(np.cumsum(rng.normal(size=(h, w, c)), 0), 1)
    base = (base - base.min()) / max(np.ptp(base), 1e-6) * 255
    return base.astype(np.uint8)


def test_batch_flatten_regions_matches_host_rotate_resize():
    """rotate-to-horizontal + resize as ONE affine program vs the host
    chain (rotate.distort -> trim -> resize)."""
    rng = np.random.default_rng(0)
    src_tile = 96
    dst_tile = 224
    angles = [0.0, 8.0, -17.0, 33.0]
    scales = [1.0, 1.3, 0.8, 1.1]
    patches = np.stack([_smooth(rng, src_tile, src_tile) for _ in angles])

    warped, extents = batch_flatten_regions(
        jnp.asarray(patches), angles, scales, dst_tile
    )
    warped = np.asarray(warped)

    for i, (angle, scale) in enumerate(zip(angles, scales)):
        spun = rotate.distort(
            {'angle': float(angle)}, image=Image(mat=patches[i])
        )
        assert spun.image is not None
        target_h = max(int(round(spun.image.height * scale)), 1)
        target_w = max(int(round(spun.image.width * scale)), 1)
        host = spun.image.to_resized_image(target_h, target_w).mat

        ey, ex = (int(v) for v in extents[i])
        got = warped[i, :ey, :ex]
        hh = min(host.shape[0], got.shape[0])
        ww = min(host.shape[1], got.shape[1])
        assert abs(host.shape[0] - ey) <= 2 and abs(host.shape[1] - ex) <= 2
        # Interior comparison: the single-pass device resample vs the
        # host's two sequential resamples (rotate then resize) — a
        # filter-shape difference, not geometry error.
        m = 6
        d = np.abs(
            got[m:hh - m, m:ww - m].astype(np.float64)
            - host[m:hh - m, m:ww - m].astype(np.float64)
        )
        assert d.mean() < 8.0, (i, d.mean())


def test_batch_char_heatmaps_match_host_bumps():
    from vkit_tpu.engine.char_heatmap.default import build_np_distance
    from vkit_tpu.ops import warp as warp_ops

    rng = np.random.default_rng(1)
    radius = 25
    factor = 2.25
    norm = build_np_distance(radius) / radius
    np_bump = np.exp(-0.5 * (factor * norm) ** 2).astype(np.float32)
    edge = np_bump.shape[0] - 1
    bump_quad = np.asarray(
        [(0, 0), (edge, 0), (edge, edge), (0, edge)], dtype=np.float64
    )

    tile = 64
    quads = []
    for _ in range(12):
        cx, cy = rng.uniform(14, 50, 2)
        wd, ht = rng.uniform(8, 13, 2)
        ang = rng.uniform(0, np.pi)
        dx = np.asarray([np.cos(ang), np.sin(ang)]) * wd
        dy = np.asarray([-np.sin(ang), np.cos(ang)]) * ht
        center = np.asarray([cx, cy])
        quads.append(np.stack([
            center - dx - dy, center + dx - dy,
            center + dx + dy, center - dx + dy,
        ]))
    quads = np.stack(quads)

    got = np.asarray(batch_char_heatmaps(
        quads, tile=tile, char_radius=radius, distance_factor=factor
    ))

    mats = warp_ops.solve_perspective_batch(
        np.broadcast_to(bump_quad, quads.shape), quads
    )
    for i in range(len(quads)):
        host = np.clip(
            warp_ops.warp_perspective_np(np_bump, mats[i], (tile, tile)),
            0.0, 1.0,
        )
        d = np.abs(got[i] - host)
        # Analytic evaluation vs bilinear interpolation of the sampled
        # bump: sub-quantization differences only.
        assert d.mean() < 0.02, (i, d.mean())
        assert np.percentile(d, 99) < 0.12, (i, np.percentile(d, 99))


def test_plan_region_flatten_extents():
    mats, extents = plan_region_flatten([0.0, 90.0], [1.0, 1.0], 64, 128)
    assert (extents[0] == (64, 64)).all()
    assert (extents[1] == (64, 64)).all()
    # Identity matrix for angle 0.
    np.testing.assert_allclose(mats[0], np.eye(3), atol=1e-9)


def test_flatten_rectangular_content_extents():
    """Non-square content inside a padded square tile: the rotated CONTENT
    bbox (not the canvas bbox) lands at the dst origin, and extents come
    back (h, w)."""
    rng = np.random.default_rng(2)
    src_tile = 96
    ch, cw = 40, 80                       # content extent inside the tile
    patch = np.zeros((src_tile, src_tile, 3), dtype=np.uint8)
    patch[:ch, :cw] = _smooth(rng, ch, cw)

    for angle, scale in [(0.0, 1.0), (90.0, 1.0), (15.0, 1.25)]:
        warped, extents, mats = batch_flatten_regions(
            jnp.asarray(patch[None]), [angle], [scale], 192,
            content_extents=np.asarray([[ch, cw]]),
            return_mats=True,
        )
        warped = np.asarray(warped)[0]
        eh, ew = (int(v) for v in extents[0])
        # Content fills the returned extent (its corners map to the
        # extent's corners): compare against the host chain.
        spun = rotate.distort(
            {'angle': float(angle)}, image=Image(mat=patch[:ch, :cw])
        )
        th = max(int(round(spun.image.height * scale)), 1)
        tw = max(int(round(spun.image.width * scale)), 1)
        assert abs(th - eh) <= 2 and abs(tw - ew) <= 2, (angle, eh, ew, th, tw)
        host = spun.image.to_resized_image(th, tw).mat
        hh, ww = min(th, eh), min(tw, ew)
        m = 6
        d = np.abs(
            warped[m:hh - m, m:ww - m].astype(np.float64)
            - host[m:hh - m, m:ww - m].astype(np.float64)
        )
        assert d.mean() < 8.0, (angle, d.mean())
        # Nothing renders beyond the extent (rows below eh are border).
        assert warped[eh + 2:, :, :].max() <= 1e-3

    # Point map: the content rect corners land on the extent corners.
    corners = np.asarray(
        [(0, 0), (cw - 1, 0), (cw - 1, ch - 1), (0, ch - 1)], np.float64
    )
    mapped = region_flatten_point_map(mats, [0] * 4, corners)
    assert mapped.min() > -1.0
    assert mapped[:, 0].max() <= ew and mapped[:, 1].max() <= eh

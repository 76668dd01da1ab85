"""Batched device catalog vs the per-element host path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vkit_tpu.element import Image
from vkit_tpu.mechanism import batch_distort_images
from vkit_tpu.mechanism.distortion import (
    BrightnessShiftConfig,
    ColorBalanceConfig,
    ComplementConfig,
    GaussianBlurConfig,
    JpegQualityConfig,
    MeanShiftConfig,
    PosterizationConfig,
    StdShiftConfig,
    brightness_shift,
    color_balance,
    complement,
    gaussian_blur,
    jpeg_quality,
    mean_shift,
    posterization,
    std_shift,
)


@pytest.fixture(scope='module')
def batch():
    rng = np.random.default_rng(0)
    return rng.integers(0, 256, (3, 48, 64, 3), dtype=np.uint8)


def _host(distortion, configs, batch):
    return np.stack([
        distortion.distort_image(cfg, Image(mat=mat)).mat
        for cfg, mat in zip(configs, batch)
    ])


def test_mean_shift_exact(batch):
    configs = [
        MeanShiftConfig(delta=25),
        MeanShiftConfig(delta=-40, threshold=120),
        MeanShiftConfig(delta=10, threshold=200),
    ]
    out = np.asarray(
        batch_distort_images('mean_shift', configs, jnp.asarray(batch))
    )
    assert np.array_equal(out, _host(mean_shift, configs, batch))


def test_std_shift_exact(batch):
    configs = [StdShiftConfig(scale=s) for s in (0.7, 1.0, 1.35)]
    out = np.asarray(
        batch_distort_images('std_shift', configs, jnp.asarray(batch))
    )
    ref = _host(std_shift, configs, batch)
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


def test_posterization_exact(batch):
    configs = [PosterizationConfig(num_bits=b) for b in (1, 3, 5)]
    out = np.asarray(
        batch_distort_images('posterization', configs, jnp.asarray(batch))
    )
    assert np.array_equal(out, _host(posterization, configs, batch))


def test_complement_exact(batch):
    configs = [
        ComplementConfig(),
        ComplementConfig(threshold=100),
        ComplementConfig(threshold=128, enable_threshold_lte=True),
    ]
    out = np.asarray(
        batch_distort_images('complement', configs, jnp.asarray(batch))
    )
    assert np.array_equal(out, _host(complement, configs, batch))


def test_color_balance_close(batch):
    configs = [ColorBalanceConfig(ratio=r) for r in (0.0, 0.5, 0.9)]
    out = np.asarray(
        batch_distort_images('color_balance', configs, jnp.asarray(batch))
    )
    ref = _host(color_balance, configs, batch)
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


def test_brightness_shift_close(batch):
    configs = [BrightnessShiftConfig(delta=d) for d in (-45, 0, 60)]
    out = np.asarray(
        batch_distort_images('brightness_shift', configs, jnp.asarray(batch))
    )
    ref = _host(brightness_shift, configs, batch)
    # HSL roundtrip rounding differs by a couple LSB at saturated pixels.
    assert np.abs(out.astype(int) - ref.astype(int)).mean() < 1.0


def test_gaussian_blur_close(batch):
    configs = [GaussianBlurConfig(sigma=s) for s in (0.8, 1.5, 2.5)]
    out = np.asarray(
        batch_distort_images('gaussian_blur', configs, jnp.asarray(batch))
    )
    ref = _host(gaussian_blur, configs, batch)
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


def test_jpeg_quality_close(batch):
    configs = [JpegQualityConfig(quality=q) for q in (40, 70, 95)]
    out = np.asarray(
        batch_distort_images('jpeg_quality', configs, jnp.asarray(batch))
    )
    ref = _host(jpeg_quality, configs, batch)
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 2


def test_noise_and_fog_run(batch):
    from vkit_tpu.mechanism.distortion import (
        FogConfig,
        GaussionNoiseConfig,
        ImpulseNoiseConfig,
    )

    key = jax.random.PRNGKey(0)
    images = jnp.asarray(batch)
    out = batch_distort_images(
        'gaussion_noise', [GaussionNoiseConfig(std=s) for s in (5, 10, 20)],
        images, key,
    )
    assert not np.array_equal(np.asarray(out), batch)

    out = batch_distort_images(
        'impulse_noise',
        [ImpulseNoiseConfig(prob_salt=0.05, prob_pepper=0.05)] * 3,
        images, key,
    )
    assert (np.asarray(out) == 255).any()

    out = batch_distort_images(
        'fog', [FogConfig(roughness=0.4)] * 3, images, key,
    )
    out = np.asarray(out)
    assert not np.array_equal(out, batch)
    assert out.shape == batch.shape


def test_streaks_match_host(batch):
    from vkit_tpu.mechanism.distortion import (
        EllipseStreakConfig,
        LineStreakConfig,
        RectangleStreakConfig,
        ellipse_streak,
        line_streak,
        rectangle_streak,
    )

    cases = [
        ('line_streak', line_streak, [
            LineStreakConfig(thickness=2, gap=6, alpha=0.8),
            LineStreakConfig(thickness=1, gap=4, dash_thickness=2, dash_gap=2),
            LineStreakConfig(enable_vert=False, color=(200, 30, 30)),
        ]),
        ('rectangle_streak', rectangle_streak, [
            RectangleStreakConfig(thickness=2, alpha=0.7),
            RectangleStreakConfig(short_side_min=6, short_side_step=8),
            RectangleStreakConfig(aspect_ratio=1.5),
        ]),
        ('ellipse_streak', ellipse_streak, [
            EllipseStreakConfig(thickness=2),
            EllipseStreakConfig(short_side_min=8, alpha=0.6),
            EllipseStreakConfig(aspect_ratio=0.8, color=(0, 0, 255)),
        ]),
    ]
    for name, dist, configs in cases:
        out = np.asarray(
            batch_distort_images(name, configs, jnp.asarray(batch))
        )
        ref = _host(dist, configs, batch)
        assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1, name


def test_glass_blur_runs(batch):
    from vkit_tpu.mechanism.distortion import GlassBlurConfig

    out = np.asarray(batch_distort_images(
        'glass_blur',
        [GlassBlurConfig(sigma=s) for s in (0.7, 1.0, 1.4)],
        jnp.asarray(batch),
        jax.random.PRNGKey(1),
    ))
    assert out.shape == batch.shape
    assert not np.array_equal(out, batch)
    # The permutation preserves the (blurred) value multiset per image
    # up to swap collisions; sanity: intensity stats stay close.
    assert abs(float(out.mean()) - float(batch.mean())) < 8.0


def test_batch_random_photometric(batch):
    from vkit_tpu.mechanism import batch_random_photometric_distort

    images = jnp.asarray(batch)
    out1 = np.asarray(batch_random_photometric_distort(
        images, level=6, rng=np.random.default_rng(7)
    ))
    out2 = np.asarray(batch_random_photometric_distort(
        images, level=6, rng=np.random.default_rng(7)
    ))
    assert out1.shape == batch.shape and out1.dtype == np.uint8
    assert np.array_equal(out1, out2)  # deterministic given the rng state
    assert any(
        not np.array_equal(out1[i], batch[i]) for i in range(len(batch))
    )
    # A different seed draws different policies.
    out3 = np.asarray(batch_random_photometric_distort(
        images, level=6, rng=np.random.default_rng(8)
    ))
    assert not np.array_equal(out1, out3)


def test_batched_geometric_vs_per_element():
    """Fixed configs: the batched plan warp must match per-element warps."""
    import numpy as np

    from vkit_tpu.element import Image
    from vkit_tpu.mechanism import distortion as D
    from vkit_tpu.mechanism.batched import batched_plan_warp

    n, h, w = 3, 96, 128
    # Smooth page-like content: on white noise the (intended) two-pass
    # resampling differs from direct bilinear by several LSB at strong
    # rotations — that measures filter mismatch, not correctness.
    ys, xs = np.mgrid[:h, :w].astype(np.float32)
    images = np.stack([
        np.clip(
            127.5
            + 70 * np.sin(2 * np.pi * xs / 37 + c)
            + 55 * np.cos(2 * np.pi * ys / 23 - 0.7 * c)
            + 0.2 * xs - 0.1 * ys,
            0, 255,
        ) for c in range(3)
    ], axis=-1).astype(np.uint8)
    images = np.stack([images, images[::-1].copy(), images[:, ::-1].copy()])

    cases = [
        (D.rotate, {'angle': 25}),
        (D.shear_hori, {'angle': 12}),
        (D.camera_cubic_curve, {
            'curve_alpha': 12, 'curve_beta': -10, 'curve_direction': 0,
            'curve_scale': 1.0,
            'camera_model_config': {'rotation_unit_vec': [1.0, 0.0, 0.0],
                                    'rotation_theta': 6},
            'grid_size': 16,
        }),
    ]
    plans = [dist.plan(cfg, (h, w), np.random.default_rng(0))
             for dist, cfg in cases]
    warped, shapes, _ = batched_plan_warp(plans, images)
    warped = np.asarray(warped)

    for idx, ((dist, cfg), plan) in enumerate(zip(cases, plans)):
        single = dist.distort_image(cfg, Image(mat=images[idx]), state=plan)
        assert single.shape == shapes[idx]
        got = warped[idx, :shapes[idx][0], :shapes[idx][1]]
        # Interior comparison: padding/border taps differ at the rim.
        inner = (slice(4, -4), slice(4, -4))
        mae = np.abs(
            got[inner].astype(np.float32) - single.mat[inner].astype(np.float32)
        ).mean()
        # The segmented MXU path resamples in three 1-D stages (V, aligned
        # H, affine un-map); vs the host's single bilinear gather that is
        # one extra linear stage of smoothing on this high-frequency test
        # card — a filter-shape difference, not a geometry error.
        assert mae < 3.5, f'case {idx}: mae={mae}'


def test_batch_random_distort_all_stages():
    """Randomized photometric + geometric stages over a batch."""
    import numpy as np

    from vkit_tpu.mechanism.batched_random import batch_random_distort

    rng = np.random.default_rng(11)
    images = rng.integers(0, 256, (4, 80, 96, 3), dtype=np.uint8)
    out, active, boxes = batch_random_distort(images, level=4, rng=rng)
    out = np.asarray(out)

    assert out.ndim == 4 and out.shape[0] == 4 and out.shape[3] == 3
    assert active.shape == out.shape[:3]
    assert len(boxes) == 4
    for idx, box in enumerate(boxes):
        assert box.valid
        assert box.down < out.shape[1] and box.right < out.shape[2]
        # The content box must cover a meaningful region.
        assert box.area > 0.2 * 80 * 96


def test_downscale_tail_matches_gather():
    """Banded rejects (tap needs > 128) take the 2x mean-pool prefilter
    path; its output must stay close to the gather fallback inside the
    active region."""
    import jax.numpy as jnp

    from vkit_tpu.mechanism import batched as B
    from vkit_tpu.mechanism.batched import batched_plan_warp
    from vkit_tpu.mechanism.batched_random import sample_geometric_plans
    from vkit_tpu.mechanism.distortion.warp_plan import (
        rescale_plan_to,
        warp_active_mask,
    )
    from vkit_tpu.ops import warp_banded as WB

    side = 320
    out_shape = (352, 352)
    rng = np.random.default_rng(11)
    found = None
    for _ in range(600):
        plans = sample_geometric_plans(8, (side, side), 9, rng)
        plans = [rescale_plan_to(p, out_shape) for p in plans]
        lat = [p for p in plans if p.is_lattice]
        if not lat:
            continue
        nodes = B._build_coarse_nodes(
            lat, [p.dst_shape for p in lat], out_shape
        )
        planned = WB.plan_banded_warp(
            nodes[0], nodes[1], nodes[2], nodes[3], (side, side), out_shape
        )
        if planned is None:
            continue
        needs = WB._LAST_NEEDS
        if needs.max() > 128:
            found = lat[int(np.argmax(needs))]
            break
    assert found is not None, 'no high-needs draw found'

    img = np.clip(
        np.cumsum(np.cumsum(
            np.random.default_rng(0).normal(size=(side, side, 3)), 0), 1)
        % 255, 0, 255,
    ).astype(np.uint8)
    imgs = jnp.asarray(np.stack([img] * 4))
    plans4 = [found] * 4
    w_auto, _, _ = batched_plan_warp(plans4, imgs, mode='auto')
    w_gather, _, _ = batched_plan_warp(plans4, imgs, mode='gather')
    act = warp_active_mask(found).mat.astype(bool)
    a = np.asarray(w_auto)[0].astype(np.float64)
    g = np.asarray(w_gather)[0].astype(np.float64)
    d = np.abs(a - g)[act]
    assert d.mean() < 8.0, d.mean()

"""Parity tests for the distortion simulators against cv2/numpy oracles
implementing the exact reference formulas (ref:02:12-27, 03:11-30, 04:12-31,
16:14-37, 14:31-64)."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsr_tpu import configs
from tsr_tpu.ops import blur as blur_ops
from tsr_tpu.ops import distortions, image as image_ops


# ---------------------------------------------------------------- oracles

def cv2_motion_kernel(degree, angle):
    """ref:03:17-21."""
    M = cv2.getRotationMatrix2D((degree / 2, degree / 2), angle, 1)
    k = np.diag(np.ones(degree))
    k = cv2.warpAffine(k, M, (degree, degree))
    return k / degree


def oracle_noise(img_u8, noise):
    """ref:02:12-27 with an injected noise array."""
    image = np.array(img_u8 / 255, dtype=float)
    out = image + noise
    low_clip = -1.0 if out.min() < 0 else 0.0
    out = np.clip(out, low_clip, 1.0)
    return np.uint8(out * 255)


def oracle_fog(img_u8, intensity, jitter):
    """ref:04:12-31 with an injected jitter value."""
    image = np.array(img_u8) / 255.0
    A = 0.9
    t = 1.0 - intensity * jitter
    t = np.clip(t, 0.1, 0.9)
    fog_img = image * t + A * (1 - t)
    return np.clip(fog_img * 255, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------- kernels

@pytest.mark.parametrize("degree,angle", [(12, 45), (10, 45), (5, 45),
                                          (7, 123), (15, 300), (6, 0),
                                          (9, 90), (11, 359)])
def test_motion_blur_kernel_matches_cv2(degree, angle):
    ours = np.asarray(
        blur_ops.motion_blur_kernel(degree, angle, max_degree=degree,
                                    centered=False)
    )
    ref = cv2_motion_kernel(degree, angle)
    # cv2.warpAffine uses 5-bit fixed-point bilinear taps: tolerance 1/32 of
    # a tap magnitude (1/degree).
    assert np.allclose(ours, ref, atol=(1 / 32) / degree + 1e-6), (
        np.abs(ours - ref).max()
    )


def test_centered_kernel_embedding():
    degree, angle, maxd = 9, 70, 15
    small = np.asarray(
        blur_ops.motion_blur_kernel(degree, angle, max_degree=degree,
                                    centered=False)
    )
    big = np.asarray(
        blur_ops.motion_blur_kernel(degree, angle, max_degree=maxd,
                                    centered=True)
    )
    off = maxd // 2 - degree // 2
    emb = np.zeros((maxd, maxd))
    emb[off:off + degree, off:off + degree] = small
    assert np.allclose(big, emb, atol=1e-6)
    # embedding preserves the anchor: correlation results must agree
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (1, 33, 37, 3)).astype(np.float32)
    out_small = np.asarray(blur_ops.filter2d(img, jnp.asarray(small)))
    out_big = np.asarray(blur_ops.filter2d(img, jnp.asarray(big)))
    assert np.allclose(out_small, out_big, atol=1e-3)


def test_filter2d_matches_cv2(rng):
    img = rng.uniform(0, 255, (28, 31, 3)).astype(np.float32)
    for degree, angle in [(12, 45), (5, 200)]:
        k = cv2_motion_kernel(degree, angle).astype(np.float32)
        ref = cv2.filter2D(img, -1, k)  # float path: no rounding
        ours = np.asarray(blur_ops.filter2d(img[None], jnp.asarray(k)))[0]
        assert np.allclose(ours, ref, atol=1e-2), np.abs(ours - ref).max()


def test_apply_motion_blur_full_chain(rng):
    """Full ref:03 chain incl. uint8 rounding and minmax renormalize."""
    img = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)

    def oracle(image, degree, angle):
        k = cv2_motion_kernel(degree, angle)
        blurred = cv2.filter2D(image, -1, k)
        cv2.normalize(blurred, blurred, 0, 255, cv2.NORM_MINMAX)
        return np.array(blurred, dtype=np.uint8)

    ref = oracle(img, 12, 45)
    ours = np.asarray(distortions.apply_motion_blur(img, 12, 45))
    # fixed-point kernel differences can shift individual pixels by a couple
    # of levels; require near-exact agreement
    assert np.mean(np.abs(ours.astype(int) - ref.astype(int))) < 1.0
    assert np.percentile(np.abs(ours.astype(int) - ref.astype(int)), 99) <= 3


# ---------------------------------------------------------------- uint8 casts

def test_numpy_uint8_cast_semantics(rng):
    vals = np.concatenate([
        rng.uniform(-260, 260, 4096),
        np.array([-255.0, -0.5, -1.0, 0.0, 0.4, 255.0, 255.6, 199.9999]),
    ]).astype(np.float32)
    ref = np.uint8(vals)  # C-cast truncation + wrap
    ours = np.asarray(image_ops.numpy_uint8_cast(jnp.asarray(vals)))
    assert (ref == ours).all(), (vals[ref != ours], ref[ref != ours],
                                 ours[ref != ours])


# ---------------------------------------------------------------- noise

def test_add_gaussian_noise_matches_oracle(rng):
    img = rng.integers(0, 256, (2, 24, 24, 3), dtype=np.uint8)
    key = jax.random.PRNGKey(7)
    var = 0.02
    # replicate the implementation's noise draw
    noise = np.asarray(
        jnp.sqrt(var) * jax.random.normal(key, (2, 24, 24, 3), jnp.float32)
    )
    ours = np.asarray(distortions.add_gaussian_noise(img, key, var=var))
    for i in range(2):
        ref = oracle_noise(img[i], noise[i])
        # float32 (ours) vs float64 (numpy oracle) integer-boundary effects
        # flip a tiny fraction of pixels by one level
        exact = (ours[i] == ref).mean()
        assert exact > 0.99, exact
        diff = np.abs(ours[i].astype(int) - ref.astype(int))
        diff = np.minimum(diff, 256 - diff)  # circular (wrap quirk)
        assert diff.max() <= 1


def test_noise_wrap_quirk_produces_bright_pixels():
    """Dark pixels + negative noise must wrap to bright values (ref:02:20-26)."""
    img = np.zeros((1, 64, 64, 3), dtype=np.uint8)
    out = np.asarray(
        distortions.add_gaussian_noise(img, jax.random.PRNGKey(0), var=0.02)
    )
    assert out.max() > 200  # wrapped negatives
    assert out.min() == 0


# ---------------------------------------------------------------- fog

def test_add_fog_matches_oracle(rng):
    img = rng.integers(0, 256, (3, 16, 16, 3), dtype=np.uint8)
    key = jax.random.PRNGKey(3)
    jit_u = np.asarray(
        jax.random.uniform(key, (3, 1, 1, 1), jnp.float32, 0.8, 1.2)
    )
    ours = np.asarray(distortions.add_fog(img, key, fog_intensity=0.8))
    for i in range(3):
        ref = oracle_fog(img[i], 0.8, jit_u[i, 0, 0, 0])
        assert np.abs(ours[i].astype(int) - ref.astype(int)).max() <= 1


def test_mild_fog_fixed_t(rng):
    img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    ours = np.asarray(distortions.mild_fog(img))
    imgf = img / 255.0
    t = 0.9
    ref = np.clip((imgf * t + 0.9 * (1 - t)) * 255, 0, 255).astype(np.uint8)
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1


# ---------------------------------------------------------------- compound

def oracle_compound(image, noise):
    """ref:16:14-37 with injected noise."""
    img = image.astype(np.float32) / 255.0
    temp_img = (img * 255).astype(np.uint8)
    degree, angle = 10, 45
    k = cv2_motion_kernel(degree, angle)
    temp_img = cv2.filter2D(temp_img, -1, k)
    img = temp_img.astype(np.float32) / 255.0
    intensity, A = 0.5, 0.9
    t = 1.0 - intensity
    img = img * t + A * (1 - t)
    img = img + noise
    return np.clip(img * 255, 0, 255).astype(np.uint8)


def test_compound_matches_oracle(rng):
    img = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    key = jax.random.PRNGKey(11)
    noise = np.asarray(
        jnp.sqrt(0.02) * jax.random.normal(key, (2, 32, 32, 3), jnp.float32)
    )
    ours = np.asarray(distortions.apply_compound_distortion(img, key))
    for i in range(2):
        ref = oracle_compound(img[i], noise[i])
        diff = np.abs(ours[i].astype(int) - ref.astype(int))
        assert np.mean(diff) < 1.0 and np.percentile(diff, 99) <= 3


# ---------------------------------------------------------------- random mix

def test_random_mix_shapes_and_range(rng):
    img = rng.integers(0, 256, (8, 48, 48, 3), dtype=np.uint8)
    out = np.asarray(
        distortions.apply_random_distortions(img, jax.random.PRNGKey(0))
    )
    assert out.shape == img.shape and out.dtype == np.uint8


def test_random_mix_identity_when_all_probs_zero(rng):
    img = rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8)
    cfg = configs.RandomMixConfig(prob_fog=0.0, prob_noise=0.0, prob_blur=0.0)
    out = np.asarray(
        distortions.apply_random_distortions(img, jax.random.PRNGKey(0), cfg)
    )
    assert (out == img).all()


def test_random_mix_heterogeneous_batch():
    """With p=0.5 gates, some samples in a batch stay clean and others not."""
    img = np.full((16, 32, 32, 3), 128, dtype=np.uint8)
    out = np.asarray(
        distortions.apply_random_distortions(img, jax.random.PRNGKey(5))
    )
    changed = np.array([
        not (out[i] == img[i]).all() for i in range(16)
    ])
    assert changed.any() and not changed.all()


def test_random_mix_matches_reference_math():
    """Replicate the implementation's PRNG draws and check one gated sample
    against the numpy reference chain (ref:14:31-64)."""
    b, h, w = 4, 24, 24
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8)
    key = jax.random.PRNGKey(42)
    cfg = configs.RandomMixConfig()

    keys = jax.random.split(key, 8)
    gate_fog = np.asarray(jax.random.uniform(keys[0], (b, 1, 1, 1)) < 0.5)
    intensity = np.asarray(
        jax.random.uniform(keys[1], (b, 1, 1, 1), jnp.float32, 0.3, 0.7))
    jit_u = np.asarray(
        jax.random.uniform(keys[2], (b, 1, 1, 1), jnp.float32, 0.8, 1.2))
    gate_noise = np.asarray(jax.random.uniform(keys[3], (b, 1, 1, 1)) < 0.5)
    var = np.asarray(
        jax.random.uniform(keys[4], (b, 1, 1, 1), jnp.float32, 0.01, 0.03))
    noise = np.asarray(jax.random.normal(keys[5], (b, h, w, 3), jnp.float32))
    gate_blur = np.asarray(jax.random.uniform(keys[6], (b,)) < 0.5)
    kb = jax.random.split(keys[7], 2)
    degrees = np.asarray(jax.random.randint(kb[0], (b,), 5, 16))
    angles = np.asarray(jax.random.randint(kb[1], (b,), 0, 361))

    ours = np.asarray(distortions.apply_random_distortions(img, key, cfg))

    for i in range(b):
        out = img[i].astype(np.float32) / 255.0
        if gate_fog[i, 0, 0, 0]:
            t = 1.0 - intensity[i, 0, 0, 0] * jit_u[i, 0, 0, 0]
            out = out * t + 0.9 * (1 - t)
        if gate_noise[i, 0, 0, 0]:
            out = out + np.sqrt(var[i, 0, 0, 0]) * noise[i]
        if gate_blur[i]:
            temp = np.clip(out * 255, 0, 255).astype(np.uint8)
            k = cv2_motion_kernel(int(degrees[i]), float(angles[i]))
            temp = cv2.filter2D(temp, -1, k)
            out = temp.astype(np.float32) / 255.0
        ref = np.clip(out * 255, 0, 255).astype(np.uint8)
        diff = np.abs(ours[i].astype(int) - ref.astype(int))
        assert np.mean(diff) < 1.0 and np.percentile(diff, 99) <= 3, (
            i, gate_fog[i, 0, 0, 0], gate_noise[i, 0, 0, 0], gate_blur[i],
            diff.max(), np.mean(diff))


# ---------------------------------------------------------------- minmax

def test_minmax_normalize_matches_cv2(rng):
    img = rng.integers(10, 200, (20, 20, 3), dtype=np.uint8)
    ref = img.copy()
    cv2.normalize(ref, ref, 0, 255, cv2.NORM_MINMAX)
    ours = np.asarray(
        image_ops.minmax_normalize_u8(
            jnp.asarray(img, jnp.float32)[None]
        )
    )[0]
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1


# ---------------------------------------------------------------- metrics

def test_psnr(rng):
    a = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    b = np.clip(a.astype(int) + rng.integers(-20, 20, a.shape), 0, 255
                ).astype(np.uint8)
    ours = np.asarray(image_ops.psnr(a, b))
    for i in range(2):
        mse = np.mean((a[i].astype(np.float64) - b[i]) ** 2)
        ref = 10 * np.log10(255.0**2 / mse)
        assert abs(ours[i] - ref) < 1e-3


def skimage_ssim_oracle(a, b, data_range=255.0, win=7):
    """Numpy reimplementation of skimage.structural_similarity defaults."""
    from scipy.ndimage import uniform_filter
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    K1, K2 = 0.01, 0.03
    C1, C2 = (K1 * data_range) ** 2, (K2 * data_range) ** 2
    n = win * win
    cov_norm = n / (n - 1)
    vals = []
    pad = (win - 1) // 2
    for ch in range(a.shape[2]):
        x, y = a[..., ch], b[..., ch]
        ux = uniform_filter(x, win)
        uy = uniform_filter(y, win)
        uxx = uniform_filter(x * x, win)
        uyy = uniform_filter(y * y, win)
        uxy = uniform_filter(x * y, win)
        vx = cov_norm * (uxx - ux * ux)
        vy = cov_norm * (uyy - uy * uy)
        vxy = cov_norm * (uxy - ux * uy)
        s = ((2 * ux * uy + C1) * (2 * vxy + C2)) / (
            (ux**2 + uy**2 + C1) * (vx + vy + C2))
        vals.append(s[pad:-pad, pad:-pad].mean())
    return float(np.mean(vals))


def test_ssim_matches_skimage_oracle(rng):
    a = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    b = np.clip(a.astype(int) + rng.integers(-30, 30, a.shape), 0, 255
                ).astype(np.uint8)
    ours = float(np.asarray(image_ops.ssim(a[None], b[None]))[0])
    ref = skimage_ssim_oracle(a, b)
    assert abs(ours - ref) < 1e-4
    same = float(np.asarray(image_ops.ssim(a[None], a[None]))[0])
    assert same > 0.9999


def test_random_mix_jit_matches_eager(rng):
    """Regression: XLA:CPU miscompiled grouped convs fed by fused uint8->f32
    converts; the optimization_barrier in filter2d must keep jit == eager."""
    import functools
    img = rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8)
    key = jax.random.PRNGKey(9)
    eager = np.asarray(distortions.apply_random_distortions(img, key))
    jitted = np.asarray(
        jax.jit(distortions.apply_random_distortions)(img, key))
    assert (eager == jitted).all()


def test_ssim_jit_matches_eager(rng):
    a = rng.integers(0, 256, (1, 24, 24, 3), dtype=np.uint8)
    b = np.clip(a.astype(int) + rng.integers(-30, 30, a.shape), 0, 255
                ).astype(np.uint8)
    jit_val = float(np.asarray(image_ops.ssim(a, b))[0])
    eager_val = float(np.asarray(image_ops.ssim.__wrapped__(a, b, 255.0, 7))[0])
    assert abs(jit_val - eager_val) < 1e-5


def test_multiscale_random_mix(rng):
    """Native-resolution emulation: static group split, uint8 in/out,
    groups with scale >= input size fall back to direct application."""
    import jax

    from tsr_tpu import configs
    from tsr_tpu.ops import distortions

    imgs = rng.integers(0, 256, (8, 64, 64, 3), dtype=np.uint8)
    cfg = configs.RandomMixConfig(apply_scales=(16, 32, 48, 96),
                                  blur_degree=(3, 7))
    out = distortions.apply_random_distortions_multiscale(
        jnp.asarray(imgs), jax.random.PRNGKey(0), cfg)
    out = np.asarray(out)
    assert out.shape == imgs.shape and out.dtype == np.uint8
    # the pair helper routes through multiscale when apply_scales is set
    bad01, clean01 = distortions.make_training_pair(
        jnp.asarray(imgs), jax.random.PRNGKey(1), cfg)
    assert bad01.shape == clean01.shape == imgs.shape
    assert bad01.dtype == jnp.float32
    # distortion actually happened for most samples (all three gates at
    # p=0.5 => P(untouched) ~ 12.5% per sample)
    assert np.abs(np.asarray(bad01) * 255 - imgs).max() > 10

"""Batched, on-device distortion simulators.

TPU-native replacements for the reference's per-image cv2/numpy loops:

- AWGN                      (ref:02:12-27)
- linear motion blur        (ref:03:11-30)
- atmospheric fog           (ref:04:12-31)
- fixed compound chain      (ref:16:14-37, Blur->Fog->Noise)
- demo compound chain       (ref:15:93-120, Fog->Noise->Blur)
- per-sample random mix     (ref:14:31-64, Fog->Noise->Blur, p=0.5 each)
- mild step-wise variants   (ref:13:33-56)

All public functions take uint8 ``[B, H, W, C]`` batches (a single ``[H, W,
C]`` image is auto-promoted) and return uint8, preserving the reference's
uint8 round-trip semantics between stages — including the negative-wrap
quirk of ``np.uint8`` in the AWGN path (ref:02:20-26), which materially
shapes the "Noisy" distribution the models see.

Everything is jit-compatible with static shapes; per-sample randomness comes
from a ``jax.random`` key instead of global ``np.random``/``random`` state.
The random-mix generator is what runs *inside* the jitted unified train step,
replacing the reference's 8-worker CPU DataLoader generation (ref:14:213).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tsr_tpu import configs
from tsr_tpu.ops import blur as blur_ops
from tsr_tpu.ops import image as image_ops

MAX_BLUR_DEGREE = 15  # static buffer bound; covers every reference setting


def _batched(images):
    images = jnp.asarray(images)
    if images.ndim == 3:
        return images[None], True
    return images, False


def _debatch(images, squeeze):
    return images[0] if squeeze else images


# --------------------------------------------------------------------------
# AWGN (ref:02:12-27)
# --------------------------------------------------------------------------

def add_gaussian_noise(images, key, var: float = 0.02, mean: float = 0.0):
    """Additive Gaussian noise in [0,1] space with reference cast semantics.

    Reproduces ref:02:12-27 exactly: ``out = img/255 + N(mean, sqrt(var))``;
    the lower clip bound is ``-1`` iff any pixel went negative (per image),
    else ``0``; then ``np.uint8(out*255)`` — which *wraps* negatives.
    """
    x, squeeze = _batched(images)
    f = image_ops.to_float01(x)
    noise = mean + jnp.sqrt(var) * jax.random.normal(key, f.shape, jnp.float32)
    out = f + noise
    any_neg = jnp.min(out, axis=(1, 2, 3), keepdims=True) < 0
    low = jnp.where(any_neg, -1.0, 0.0)
    out = jnp.clip(out, low, 1.0)
    return _debatch(image_ops.numpy_uint8_cast(image_ops.scale255(out)), squeeze)


# --------------------------------------------------------------------------
# Motion blur (ref:03:11-30)
# --------------------------------------------------------------------------

def apply_motion_blur(
    images,
    degree: int = 12,
    angle: float = 45.0,
    minmax_normalize: bool = True,
):
    """Linear motion blur on uint8 images (ref:03:11-30).

    ``minmax_normalize=True`` applies the offline generator's final
    ``cv2.normalize(..., NORM_MINMAX)`` (ref:03:29); the online paths
    (ref:14, ref:16, ref:13) skip it.
    """
    x, squeeze = _batched(images)
    max_deg = max(int(degree), 3)
    kernel = blur_ops.motion_blur_kernel(degree, angle, max_degree=max_deg)
    blurred = blur_ops.filter2d(jnp.asarray(x, jnp.float32), kernel)
    out = jnp.asarray(
        image_ops.saturate_uint8(blurred, round=True), jnp.float32
    )
    if minmax_normalize:
        out_u8 = image_ops.minmax_normalize_u8(out)
    else:
        out_u8 = out.astype(jnp.uint8)
    return _debatch(out_u8, squeeze)


# --------------------------------------------------------------------------
# Fog (ref:04:12-31)
# --------------------------------------------------------------------------

def add_fog(
    images,
    key=None,
    fog_intensity: float = 0.8,
    atmosphere: float = 0.9,
    t_jitter: Optional[Tuple[float, float]] = (0.8, 1.2),
    t_clip: Optional[Tuple[float, float]] = (0.1, 0.9),
):
    """Atmospheric scattering ``I = J*t + A*(1-t)`` (ref:04:12-31).

    ``t = 1 - intensity * U(t_jitter)`` per image; ``t_jitter=None`` disables
    the randomness (the fixed chains at ref:16:28 / ref:13:51 use t =
    1 - intensity directly).
    """
    x, squeeze = _batched(images)
    f = image_ops.to_float01(x)
    b = f.shape[0]
    if t_jitter is not None:
        if key is None:
            raise ValueError("add_fog with t_jitter requires a PRNG key")
        jit_u = jax.random.uniform(
            key, (b, 1, 1, 1), jnp.float32, t_jitter[0], t_jitter[1]
        )
    else:
        jit_u = jnp.ones((b, 1, 1, 1), jnp.float32)
    t = 1.0 - fog_intensity * jit_u
    if t_clip is not None:
        t = jnp.clip(t, t_clip[0], t_clip[1])
    out = f * t + atmosphere * (1.0 - t)
    return _debatch(image_ops.clip01_to_uint8(out), squeeze)


# --------------------------------------------------------------------------
# Fixed compound chain Blur -> Fog -> Noise (ref:16:14-37)
# --------------------------------------------------------------------------

def apply_compound_distortion(
    images, key, cfg: configs.CompoundConfig = configs.CompoundConfig()
):
    """The offline compound generator's chain (ref:16:14-37):
    blur(10,45) on uint8 -> fog(t = 1-0.5, no jitter) -> AWGN(0.02), final
    ``clip(x*255,0,255).astype(uint8)`` (no negative wrap here)."""
    x, squeeze = _batched(images)
    # 1. Blur on uint8 (cv2.filter2D rounds + saturates per ref:16:24)
    kernel = blur_ops.motion_blur_kernel(
        cfg.blur_degree, cfg.blur_angle, max_degree=cfg.blur_degree
    )
    blurred = blur_ops.filter2d(jnp.asarray(x, jnp.float32), kernel)
    f = jnp.asarray(
        image_ops.saturate_uint8(blurred, round=True), jnp.float32
    ) / 255.0
    # 2. Fog, fixed t (ref:16:28-29)
    t = 1.0 - cfg.fog_intensity
    f = f * t + cfg.fog_atmosphere * (1.0 - t)
    # 3. Noise, no intermediate clip (ref:16:32-33)
    f = f + jnp.sqrt(cfg.noise_var) * jax.random.normal(
        key, f.shape, jnp.float32
    )
    return _debatch(image_ops.clip01_to_uint8(f), squeeze)


def make_compound_distortion(images, key, cfg: configs.CompoundConfig = configs.CompoundConfig()):
    """The unified *demo*'s compound chain (ref:15:93-120) — note the
    different order vs ref:16: Fog -> Noise (clipped) -> Blur, returning the
    blurred uint8 directly."""
    x, squeeze = _batched(images)
    f = image_ops.to_float01(x)
    t = 1.0 - cfg.fog_intensity
    f = f * t + cfg.fog_atmosphere * (1.0 - t)
    f = f + jnp.sqrt(cfg.noise_var) * jax.random.normal(key, f.shape, jnp.float32)
    f = jnp.clip(f, 0.0, 1.0)
    u8 = jnp.trunc(image_ops.scale255(f)).astype(jnp.uint8)  # ref:15:110
    kernel = blur_ops.motion_blur_kernel(
        cfg.blur_degree, cfg.blur_angle, max_degree=cfg.blur_degree
    )
    blurred = blur_ops.filter2d(jnp.asarray(u8, jnp.float32), kernel)
    return _debatch(image_ops.saturate_uint8(blurred, round=True), squeeze)


# --------------------------------------------------------------------------
# Per-sample random mix (ref:14:31-64)
# --------------------------------------------------------------------------

def apply_random_distortions(
    images, key, cfg: configs.RandomMixConfig = configs.RandomMixConfig()
):
    """Per-sample random distortion mix, order Fog -> Noise -> Blur, each
    applied with its own probability (ref:14:31-64).

    Every sample draws independent gates and parameters, so a single call
    generates a full heterogeneous training batch on device — the TPU
    replacement for the reference's per-worker CPU ``__getitem__``
    generation (ref:14:75-93).
    """
    x, squeeze = _batched(images)
    f = image_ops.to_float01(x)
    b = f.shape[0]
    keys = jax.random.split(key, 8)

    # --- Fog (ref:14:38-43) ---
    gate_fog = jax.random.uniform(keys[0], (b, 1, 1, 1)) < cfg.prob_fog
    intensity = jax.random.uniform(
        keys[1], (b, 1, 1, 1), jnp.float32, *cfg.fog_intensity
    )
    t = 1.0 - intensity * jax.random.uniform(
        keys[2], (b, 1, 1, 1), jnp.float32, *cfg.fog_t_jitter
    )
    fogged = f * t + cfg.fog_atmosphere * (1.0 - t)
    f = jnp.where(gate_fog, fogged, f)

    # --- Noise, no clip before blur (ref:14:45-49) ---
    gate_noise = jax.random.uniform(keys[3], (b, 1, 1, 1)) < cfg.prob_noise
    var = jax.random.uniform(
        keys[4], (b, 1, 1, 1), jnp.float32, *cfg.noise_var
    )
    noise = jnp.sqrt(var) * jax.random.normal(keys[5], f.shape, jnp.float32)
    f = jnp.where(gate_noise, f + noise, f)

    # --- Blur with uint8 round-trip (ref:14:51-60) ---
    gate_blur = jax.random.uniform(keys[6], (b,)) < cfg.prob_blur
    kb = jax.random.split(keys[7], 2)
    degrees = jax.random.randint(
        kb[0], (b,), cfg.blur_degree[0], cfg.blur_degree[1] + 1
    )
    angles = jax.random.randint(
        kb[1], (b,), cfg.blur_angle[0], cfg.blur_angle[1] + 1
    ).astype(jnp.float32)
    kernels = blur_ops.motion_blur_kernels(
        degrees, angles, max_degree=MAX_BLUR_DEGREE
    )
    pre_blur_u8f = jnp.trunc(jnp.clip(image_ops.scale255(f), 0.0, 255.0))  # ref:14:52
    blurred = blur_ops.filter2d(pre_blur_u8f, kernels)
    blurred_u8f = jnp.asarray(
        image_ops.saturate_uint8(blurred, round=True), jnp.float32
    )
    f = jnp.where(
        gate_blur[:, None, None, None], blurred_u8f / 255.0, f
    )

    return _debatch(image_ops.clip01_to_uint8(f), squeeze)


# --------------------------------------------------------------------------
# Mild step-wise variants for the cascade stress test (ref:13:33-56)
# --------------------------------------------------------------------------

def mild_noise(images, key, cfg: configs.MildConfig = configs.MildConfig()):
    """ref:13:33-38 — clipped to [0,1], trunc-cast (no wrap quirk)."""
    x, squeeze = _batched(images)
    f = image_ops.to_float01(x)
    out = f + jnp.sqrt(cfg.noise_var) * jax.random.normal(
        key, f.shape, jnp.float32
    )
    out = jnp.clip(out, 0.0, 1.0)
    return _debatch(jnp.trunc(image_ops.scale255(out)).astype(jnp.uint8), squeeze)


def mild_blur(images, cfg: configs.MildConfig = configs.MildConfig()):
    """ref:13:40-47 — filter2D only, no renormalize, stays uint8."""
    return apply_motion_blur(
        images, cfg.blur_degree, cfg.blur_angle, minmax_normalize=False
    )


def mild_fog(images, cfg: configs.MildConfig = configs.MildConfig()):
    """ref:13:49-55 — fixed t = 1 - intensity."""
    return add_fog(
        images,
        key=None,
        fog_intensity=cfg.fog_intensity,
        atmosphere=cfg.fog_atmosphere,
        t_jitter=None,
        t_clip=None,
    )


# --------------------------------------------------------------------------
# Training-space helper
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg",))
def apply_random_distortions_multiscale(
    clean_u8, key, cfg: configs.RandomMixConfig
):
    """Random mix applied at emulated NATIVE resolutions.

    The reference distorts the native-resolution image and only then
    resizes to 224 (ref:14:79-92; the offline trees ref:02/03/04 likewise
    distort native files). Batches stored at the target resolution would
    under-apply spatially-scaled distortions — a 10 px blur on a 224 px
    image is a fraction of a 10 px blur on a 56 px native crop that later
    gets upscaled 4x. Emulation: the batch is split into
    ``len(cfg.apply_scales)`` static groups; each group is bilinearly
    downsampled to its scale, distorted there (uint8 round-trip
    preserved), and upsampled back. Group membership is fixed by position,
    but training batches arrive freshly permuted each epoch, so per-sample
    scales are effectively random. All shapes are static — the whole thing
    stays inside one jitted step.
    """
    x, squeeze = _batched(clean_u8)
    b, size = x.shape[0], x.shape[1]
    scales = tuple(cfg.apply_scales)
    n_g = len(scales)
    g = b // n_g
    keys = jax.random.split(key, n_g)
    outs = []
    start = 0
    for i, s in enumerate(scales):
        n = g + (b - g * n_g if i == n_g - 1 else 0)
        sub = x[start:start + n]
        start += n
        if n == 0:
            continue
        if s >= size:
            outs.append(apply_random_distortions(sub, keys[i], cfg))
            continue
        f = image_ops.to_float01(sub)
        small = jax.image.resize(f, (n, s, s, f.shape[-1]), "linear")
        small_u8 = image_ops.clip01_to_uint8(small)
        bad_small = apply_random_distortions(small_u8, keys[i], cfg)
        up = jax.image.resize(
            image_ops.to_float01(bad_small),
            (n, size, size, f.shape[-1]), "linear")
        outs.append(image_ops.clip01_to_uint8(up))
    return _debatch(jnp.concatenate(outs, axis=0), squeeze)


@functools.partial(jax.jit, static_argnames=("cfg",))
def make_training_pair(clean_u8, key, cfg: configs.RandomMixConfig = configs.RandomMixConfig()):
    """(clean uint8 batch, key) -> (bad float01, clean float01).

    The on-device equivalent of ``DynamicDistortionDataset.__getitem__``
    (ref:14:75-93): distort, then convert both sides to the float [0,1]
    tensors the restorer trains on. Runs inside the jitted train step so
    batch generation never touches the host. With ``cfg.apply_scales``
    set, distortions apply at emulated native resolutions (see
    :func:`apply_random_distortions_multiscale`).
    """
    if cfg.apply_scales:
        bad_u8 = apply_random_distortions_multiscale(clean_u8, key, cfg)
    else:
        bad_u8 = apply_random_distortions(clean_u8, key, cfg)
    return image_ops.to_float01(bad_u8), image_ops.to_float01(clean_u8)

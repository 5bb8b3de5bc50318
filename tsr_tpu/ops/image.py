"""Image dtype round-trips, resize, normalization, and quality metrics.

The reference round-trips through uint8 between distortion stages
(ref:14:52-62, ref:16:19-25) with numpy-cast semantics (truncation toward
zero, modulo-256 wrap for negatives) and cv2 rounding inside filter2D.
Those bit-level behaviors shape the training distribution, so they are
reproduced exactly here rather than "fixed".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tsr_tpu import configs


def to_float01(images_u8):
    """uint8 [0,255] -> float32 [0,1]."""
    return jnp.asarray(images_u8, jnp.float32) / 255.0


def scale255(f01, eps: float = 1e-3):
    """``f01 * 255`` with near-integer snapping.

    XLA may evaluate ``(u/255)*255`` as multiply-by-reciprocal, landing a
    hair below the integer numpy reaches exactly; snapping restores the
    reference's pass-through identity (uint8 -> [0,1] -> uint8 is lossless
    under numpy float32) while leaving genuinely fractional distorted values
    untouched.
    """
    x = jnp.asarray(f01, jnp.float32) * 255.0
    r = jnp.rint(x)
    return jnp.where(jnp.abs(x - r) <= eps, r, x)


def numpy_uint8_cast(x):
    """Emulate ``np.uint8(x)`` / ``.astype(np.uint8)`` for float ``x``.

    numpy C-casts: truncation toward zero, then modulo-256 wrap. The
    reference relies on this in ``add_gaussian_noise`` where values clipped to
    ``[-1, 1]`` are cast — negatives *wrap* to bright pixels (ref:02:20-26).
    """
    t = jnp.trunc(jnp.asarray(x, jnp.float32))
    t = jnp.mod(t, 256.0)
    return t.astype(jnp.uint8)


def saturate_uint8(x, round: bool = False):
    """cv2-style saturate_cast<uchar>: clip to [0,255]; optionally cvRound
    (round-half-to-even) first, matching cv2.filter2D's output stage."""
    x = jnp.asarray(x, jnp.float32)
    if round:
        x = jnp.rint(x)
    else:
        x = jnp.trunc(x)
    return jnp.clip(x, 0.0, 255.0).astype(jnp.uint8)


def clip01_to_uint8(x01):
    """``np.clip(x*255, 0, 255).astype(np.uint8)`` (ref:04:30, 14:64, 16:37)."""
    return saturate_uint8(scale255(x01), round=False)


def minmax_normalize_u8(images_f32):
    """``cv2.normalize(x, x, 0, 255, NORM_MINMAX)`` on a uint8 array
    (ref:03:29): joint min/max over all pixels *and* channels per image,
    scaled to [0,255] with cvRound + saturation.

    Args:
      images_f32: ``[B, H, W, C]`` float32 holding integral uint8 values.
    Returns:
      uint8 ``[B, H, W, C]``.
    """
    lo = jnp.min(images_f32, axis=(1, 2, 3), keepdims=True)
    hi = jnp.max(images_f32, axis=(1, 2, 3), keepdims=True)
    scale = jnp.where(hi > lo, 255.0 / (hi - lo), 0.0)
    return saturate_uint8((images_f32 - lo) * scale, round=True)


def resize_bilinear(images, size: int):
    """Bilinear resize to ``(size, size)`` (half-pixel centers, cv2/PIL
    convention). Reference resizes with PIL in transforms (ref:07:126) and
    cv2.resize for metric alignment (ref:08:118)."""
    b = images.shape[0]
    c = images.shape[-1]
    out = jax.image.resize(
        jnp.asarray(images, jnp.float32),
        (b, size, size, c),
        method="bilinear",
    )
    return out


def _bilinear_matrix(native, padded: int, out: int):
    """Dense per-axis bilinear weight matrix ``[out, padded]`` for a TRACED
    native extent (half-pixel centers, edge clamp, no antialias — the
    cv2.INTER_LINEAR convention). Each output row holds the two taps
    ``(1-w, w)`` at columns ``floor(src)`` / ``floor(src)+1``; built as two
    one-hot compares so resize becomes a dense matmul on the MXU instead of
    per-pixel gathers. At the clamped edge (``i0 == i1``) both compares hit
    the same column and the weights sum to 1."""
    n = native.astype(jnp.float32)
    src = (jnp.arange(out, dtype=jnp.float32) + 0.5) * (n / out) - 0.5
    src = jnp.clip(src, 0.0, n - 1.0)
    i0f = jnp.floor(src)
    w = src - i0f
    i0 = i0f.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, native.astype(jnp.int32) - 1)
    cols = jnp.arange(padded, dtype=jnp.int32)
    return ((cols[None, :] == i0[:, None]) * (1.0 - w)[:, None]
            + (cols[None, :] == i1[:, None]) * w[:, None])


def resize_from_padded(padded_u8, sizes_hw, out_size: int):
    """Per-image bilinear resize with traced native sizes, as matmuls.

    Args:
      padded_u8: ``[B, Hp, Wp, C]`` uint8 — native-resolution images padded
        (content beyond each image's native extent is never sampled: the
        half-pixel source coordinates stay within ``[0, native-1]``).
      sizes_hw: ``[B, 2]`` int32 native (height, width) per image.
      out_size: static output side.
    Returns:
      ``[B, out, out, C]`` uint8, quantized like cv2.resize's uint8 output.

    This is the device half of the native-upload inference path
    (tsr_tpu.infer): the host ships ~native-size bytes over the (slow,
    ~40 MB/s) relay link and the TPU does the resize as two dense
    ``[out, P] @ [P, P'] `` contractions per image — MXU work instead of
    host cv2 + 5x the link traffic. Convention matches cv2.INTER_LINEAR
    (half-pixel, edge clamp, no antialias); cv2's fixed-point coefficient
    quantization makes its uint8 output differ by <=1 LSB on ~12% of
    pixels (measured: tests/test_infer.py), same order as the documented
    cv2-vs-PIL backend delta (PARITY.md "Resize parity").
    """
    _, hp, wp, _ = padded_u8.shape

    def one(img, hw):
        wy = _bilinear_matrix(hw[0], hp, out_size)  # [out, Hp]
        wx = _bilinear_matrix(hw[1], wp, out_size)  # [out, Wp]
        x = img.astype(jnp.float32)
        t = jnp.tensordot(wy, x, axes=[[1], [0]])   # [out, Wp, C]
        return jnp.einsum("xw,owc->oxc", wx, t,
                          precision=jax.lax.Precision.HIGHEST)

    out = jax.vmap(one)(padded_u8, sizes_hw)
    return jnp.clip(jnp.rint(out), 0.0, 255.0).astype(jnp.uint8)


def imagenet_normalize(x01):
    """ImageNet mean/std normalization used by every judge path
    (ref:05:27-29)."""
    mean = jnp.asarray(configs.IMAGENET_MEAN, x01.dtype)
    std = jnp.asarray(configs.IMAGENET_STD, x01.dtype)
    return (x01 - mean) / std


def psnr(a_u8, b_u8, data_range: float = 255.0):
    """Peak signal-to-noise ratio, skimage-compatible (ref:08:123).

    Args:
      a_u8, b_u8: ``[..., H, W, C]`` uint8 (or float holding uint8 values).
    Returns:
      scalar (or batched over leading dims) PSNR in dB.
    """
    a = jnp.asarray(a_u8, jnp.float32)
    b = jnp.asarray(b_u8, jnp.float32)
    reduce_axes = tuple(range(a.ndim - 3, a.ndim))
    mse = jnp.mean((a - b) ** 2, axis=reduce_axes)
    return 10.0 * jnp.log10((data_range**2) / mse)


@functools.partial(jax.jit, static_argnames=("win_size",))
def ssim(a_u8, b_u8, data_range: float = 255.0, win_size: int = 7):
    """Structural similarity, matching skimage defaults used at ref:08:125:
    uniform ``win_size x win_size`` window, per-channel then averaged
    (``channel_axis=2``), sample covariance normalization (N-1), crop of the
    window border before averaging.

    Args:
      a_u8, b_u8: ``[B, H, W, C]``.
    Returns:
      ``[B]`` mean SSIM per image.
    """
    # barrier: XLA:CPU miscompiles grouped convs fed by fused int->float
    # converts (see tsr_tpu.ops.blur.filter2d)
    a = jax.lax.optimization_barrier(jnp.asarray(a_u8, jnp.float32))
    b = jax.lax.optimization_barrier(jnp.asarray(b_u8, jnp.float32))

    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    n = win_size * win_size
    cov_norm = n / (n - 1.0)

    kernel = jnp.full((win_size, win_size), 1.0 / n, jnp.float32)

    def filt(x):
        # 'valid'-style uniform filter per channel via depthwise conv
        bsz, h, w, c = x.shape
        xs = jnp.transpose(x, (1, 2, 0, 3)).reshape(1, h, w, bsz * c)
        k = jnp.broadcast_to(
            kernel[:, :, None, None], (win_size, win_size, 1, bsz * c)
        )
        out = jax.lax.conv_general_dilated(
            xs, k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=bsz * c,
            precision=jax.lax.Precision.HIGHEST,
        )
        oh, ow = out.shape[1], out.shape[2]
        return out.reshape(oh, ow, bsz, c).transpose(2, 0, 1, 3)

    ux = filt(a)
    uy = filt(b)
    uxx = filt(a * a)
    uyy = filt(b * b)
    uxy = filt(a * b)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
        (ux * ux + uy * uy + c1) * (vx + vy + c2)
    )
    # skimage computes the map over the full (same-padded) image then crops
    # pad = (win_size-1)//2 from each border; with a VALID conv the remaining
    # crop is zero for odd win_size.
    return jnp.mean(s, axis=(1, 2, 3))

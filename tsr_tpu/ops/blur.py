"""Linear motion-blur: kernel synthesis + batched per-sample convolution.

The reference builds its blur kernel as ``cv2.warpAffine(np.diag(np.ones(d)),
cv2.getRotationMatrix2D((d/2, d/2), angle, 1), (d, d)) / d`` and applies it
with ``cv2.filter2D`` (ref:03:11-30, ref:14:50-60, ref:16:19-25). Here the
rotated-diagonal kernel is evaluated in closed form — a bilinear sample of the
implicit diagonal image — so it works under ``jit`` with *traced* per-sample
``degree``/``angle`` (needed for the on-device random-mix generator,
ref:14:54-55) at a static ``max_degree`` buffer size.

``filter2d`` reproduces cv2 semantics: correlation (not convolution),
BORDER_REFLECT_101 padding, anchor at ``k // 2``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax


def motion_blur_kernel(degree, angle, max_degree: int, centered: bool = True):
    """Closed-form cv2-parity motion-blur kernel.

    Evaluates ``warpAffine(diag(ones(degree)), getRotationMatrix2D((degree/2,
    degree/2), angle, 1), (degree, degree)) / degree`` (ref:03:17-21) into a
    static ``(max_degree, max_degree)`` buffer.

    Args:
      degree: kernel size / motion distance; python int or traced int scalar.
      angle: rotation in degrees (counter-clockwise); python or traced scalar.
      max_degree: static buffer size (>= any runtime degree).
      centered: if True, place the ``degree``-sized kernel so its cv2 anchor
        (``degree // 2``) coincides with the buffer anchor (``max_degree //
        2``), making one static ``filter2d`` call correct for any runtime
        degree. If False, the kernel occupies the top-left corner (useful when
        ``max_degree == degree`` to compare against cv2 output directly).

    Returns:
      float32 ``(max_degree, max_degree)`` kernel summing to ~1.
    """
    degree = jnp.asarray(degree, jnp.float32)
    theta = jnp.asarray(angle, jnp.float32) * (math.pi / 180.0)
    a = jnp.cos(theta)
    b = jnp.sin(theta)
    # getRotationMatrix2D((cx,cy), angle, 1):
    #   M = [[a, b, (1-a)cx - b*cy], [-b, a, b*cx + (1-a)cy]]
    cx = degree / 2.0
    cy = degree / 2.0
    tx = (1.0 - a) * cx - b * cy
    ty = b * cx + (1.0 - a) * cy

    if centered:
        off = (max_degree // 2) - jnp.floor_divide(
            jnp.asarray(degree, jnp.int32), 2
        )
    else:
        off = jnp.asarray(0, jnp.int32)

    # Output grid (buffer coords u=row, v=col) -> kernel coords (i=row=y, j=col=x).
    u = jax.lax.broadcasted_iota(jnp.int32, (max_degree, max_degree), 0)
    v = jax.lax.broadcasted_iota(jnp.int32, (max_degree, max_degree), 1)
    i = (u - off).astype(jnp.float32)  # y in warp output
    j = (v - off).astype(jnp.float32)  # x in warp output

    # warpAffine inverts M internally: src = A^T (dst - t) for a pure rotation.
    sx = a * (j - tx) - b * (i - ty)
    sy = b * (j - tx) + a * (i - ty)

    # Bilinear sample of the implicit diagonal image D[r,c] = (r == c < degree)
    # with BORDER_CONSTANT(0), cv2's warpAffine default.
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    dx = sx - x0
    dy = sy - y0

    def diag_at(r, c):
        inside = (r >= 0) & (r < degree) & (c >= 0) & (c < degree)
        return ((r == c) & inside).astype(jnp.float32)

    val = (
        (1 - dy) * (1 - dx) * diag_at(y0, x0)
        + (1 - dy) * dx * diag_at(y0, x0 + 1)
        + dy * (1 - dx) * diag_at(y0 + 1, x0)
        + dy * dx * diag_at(y0 + 1, x0 + 1)
    )

    in_window = (
        (i >= 0) & (i < degree) & (j >= 0) & (j < degree)
    ).astype(jnp.float32)
    return val * in_window / degree


def motion_blur_kernels(degrees, angles, max_degree: int):
    """Batch of per-sample kernels: ``[B, max_degree, max_degree]``."""
    return jax.vmap(
        functools.partial(motion_blur_kernel, max_degree=max_degree)
    )(degrees, angles)


@functools.partial(jax.jit, static_argnames=("max_degree",))
def _filter2d_impl(images, kernels, max_degree):
    b, h, w, c = images.shape
    anchor = max_degree // 2
    pad_lo = anchor
    pad_hi = max_degree - 1 - anchor
    # XLA:CPU miscompiles grouped convs when an integer->float convert is
    # fused into the conv input (verified on jax 0.9.0); the barrier keeps
    # the convert un-fused. Cost on TPU: one extra fusion boundary.
    images = lax.optimization_barrier(images)
    x = jnp.pad(
        images,
        ((0, 0), (pad_lo, pad_hi), (pad_lo, pad_hi), (0, 0)),
        mode="reflect",  # numpy 'reflect' == cv2 BORDER_REFLECT_101
    )
    # Per-sample kernel as a grouped conv: fold batch into channels.
    x = jnp.transpose(x, (1, 2, 0, 3)).reshape(1, h + max_degree - 1, w + max_degree - 1, b * c)
    k = jnp.repeat(kernels[:, :, :, None], c, axis=3)  # [B, kh, kw, C]
    k = jnp.transpose(k, (1, 2, 0, 3)).reshape(max_degree, max_degree, 1, b * c)
    out = lax.conv_general_dilated(
        x,
        k,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=b * c,
        precision=lax.Precision.HIGHEST,
    )
    return out.reshape(h, w, b, c).transpose(2, 0, 1, 3)


_BACKEND_OVERRIDE = None  # set via set_backend(); wins over the env var


def set_backend(name):
    """Select the blur backend explicitly: 'xla', 'pallas_sparse',
    'pallas_dense', or None to fall back to TSR_BLUR_BACKEND.

    NOTE trace-time capture: the backend is read when a jitted caller
    *traces*, so callers already compiled keep their old dispatch — switch
    backends before the first call (or call ``jax.clear_caches()``
    afterwards). The same applies to processes sharing the persistent
    compilation cache: the cache key does not include this setting, which
    is safe because all backends are numerically parity-tested
    (tests/test_kernels.py), but timings compare only like-for-like.
    """
    global _BACKEND_OVERRIDE
    if name not in (None, "xla", "pallas_sparse", "pallas_dense"):
        raise ValueError(f"unknown blur backend {name!r}")
    _BACKEND_OVERRIDE = name


def _backend() -> str:
    """Blur backend: :func:`set_backend` override, else TSR_BLUR_BACKEND
    ('xla' default). Read at TRACE time — see set_backend's note.

    Decision record (benchmarks/kernel_bench.py on v5e, 64-image batch,
    K=15 per-sample kernels): sparse-tap Pallas vs XLA grouped conv
    measured 3.82 vs 4.02 ms/batch (1.05x, pallas) in one session and
    3.49 vs 3.48 ms/batch at 224 / 3.34 vs 3.43 at 56 (1.00x) in another —
    the gap is inside run-to-run noise. XLA stays the default: equal
    performance without the multi-minute first-touch Mosaic compile, and
    the blur stage is ~2% of the unified train step either way. The Pallas
    kernels remain selectable for A/B and for hardware where grouped convs
    lower poorly. Full table: docs/DESIGN.md."""
    if _BACKEND_OVERRIDE is not None:
        return _BACKEND_OVERRIDE
    import os

    return os.environ.get("TSR_BLUR_BACKEND", "xla")


def filter2d(images, kernels):
    """cv2.filter2D-parity correlation with per-sample kernels.

    Args:
      images: float32 ``[B, H, W, C]``.
      kernels: ``[B, K, K]`` (one kernel per sample) or ``[K, K]`` (shared).

    Returns:
      float32 ``[B, H, W, C]``, same spatial size (reflect-101 border).

    Note cv2.filter2D is *correlation*; no kernel flip is performed, matching
    ``lax.conv_general_dilated`` semantics.

    Dispatch: see :func:`_backend`. The Pallas path applies only to
    per-sample ``[B, K, K]`` kernels (the random-mix hot path,
    ref:14:51-60) on a TPU backend; shared-kernel calls and CPU runs keep
    the XLA grouped conv.
    """
    images = jnp.asarray(images, jnp.float32)
    be = _backend()
    per_sample = kernels.ndim == 3
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if per_sample and on_tpu and be in ("pallas_sparse", "pallas_dense"):
        from tsr_tpu.kernels import blur_pallas

        if be == "pallas_sparse":
            return blur_pallas.filter2d_pallas_sparse(images, kernels)
        return blur_pallas.filter2d_pallas(images, kernels)
    if kernels.ndim == 2:
        kernels = jnp.broadcast_to(
            kernels[None], (images.shape[0],) + kernels.shape
        )
    return _filter2d_impl(images, kernels, kernels.shape[-1])

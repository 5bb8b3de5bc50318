"""Pallas TPU kernel: per-sample motion-blur correlation on the VPU.

Runs the per-sample correlation (the random-mix blur, ref:14:51-60) as 225
scalar-weighted shifted accumulations on the VPU, one (sample, channel)
plane per grid program, with the padded plane resident in VMEM.

Measured on TPU v5e (64x224x224x3, 15x15 kernels, amortized in-graph,
benchmarks/kernel_bench.py): dense 3.88-3.94 ms/batch, sparse-tap
3.49-3.82, XLA grouped conv 3.48-4.02 across sessions — sparse vs XLA is
1.05x one day and 0.99x another, i.e. parity within relay noise. XLA
stays the default (``ops.blur.filter2d``); select these via
``TSR_BLUR_BACKEND=pallas_sparse|pallas_dense`` for A/B or on hardware
where grouped convs lower poorly. Decision table: docs/DESIGN.md.

Semantics match ``tsr_tpu.ops.blur.filter2d``: correlation (no kernel
flip), reflect-101 border, anchor ``max_degree // 2``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return (x + m - 1) // m * m


def _blur_kernel_body(kern_ref, x_ref, o_ref, *, ksize: int, out_h: int):
    """One (sample, channel) plane: out[h, w] = sum_ij k[i,j] x[h+i, w+j]."""
    wpad = o_ref.shape[-1]
    # accumulate through the output ref row-by-row: a fully unrolled
    # 225-term sum keeps every shifted copy live and OOMs VMEM
    for i in range(ksize):
        row_block = x_ref[0, i:i + out_h, :]
        part = None
        for j in range(ksize):
            w = kern_ref[0, i, j]
            # left-shift by j along lanes == non-negative right-roll;
            # wrapped garbage lands beyond the valid width and is sliced
            # off by the caller
            shifted = (row_block if j == 0
                       else pltpu.roll(row_block, wpad - j, axis=1))
            part = w * shifted if part is None else part + w * shifted
        if i == 0:
            o_ref[0] = part
        else:
            o_ref[0] += part


@functools.partial(jax.jit, static_argnames=("interpret",))
def filter2d_pallas(images, kernels, interpret: bool = False):
    """Per-sample 2-D correlation (cv2.filter2D parity) on the VPU.

    Args:
      images: float32 [B, H, W, C].
      kernels: float32 [B, K, K] (or [K, K] shared).

    Returns:
      float32 [B, H, W, C].
    """
    images = jnp.asarray(images, jnp.float32)
    if kernels.ndim == 2:
        kernels = jnp.broadcast_to(
            kernels[None], (images.shape[0],) + kernels.shape)
    kernels = jnp.asarray(kernels, jnp.float32)
    b, h, w, c = images.shape
    ksize = kernels.shape[-1]
    anchor = ksize // 2
    pad_lo, pad_hi = anchor, ksize - 1 - anchor

    x = jnp.pad(images, ((0, 0), (pad_lo, pad_hi), (pad_lo, pad_hi),
                         (0, 0)), mode="reflect")
    # planes layout [B*C, Hp, Wp_pad]: last dim lane-aligned
    hp, wp = h + ksize - 1, w + ksize - 1
    wp_pad = _round_up(wp, 128)
    x = jnp.transpose(x, (0, 3, 1, 2)).reshape(b * c, hp, wp)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, wp_pad - wp)))
    out_w = wp_pad  # same lane width as the input block (roll wraps there)

    kern_planes = jnp.repeat(kernels, c, axis=0)  # [B*C, K, K]

    out = pl.pallas_call(
        functools.partial(_blur_kernel_body, ksize=ksize, out_h=h),
        grid=(b * c,),
        in_specs=[
            pl.BlockSpec((1, ksize, ksize), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, hp, wp_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, out_w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * c, h, out_w), jnp.float32),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(kern_planes, x)

    out = out[:, :, :w].reshape(b, c, h, w).transpose(0, 2, 3, 1)
    return out


# ---------------------------------------------------------------------------
# Sparse-tap variant: exploit the line structure of motion-blur kernels
# ---------------------------------------------------------------------------

def _sparse_kernel_body(w_ref, di_ref, dj_ref, x_ref, o_ref,
                        *, ntaps: int, out_h: int):
    """One (sample, channel) plane, taps compacted to (weight, di, dj)
    triples: out[h, w] = sum_t w_t * x[h + di_t, w + dj_t].

    Mosaic cannot lower a dynamic *slice* start on the sublane dim (it
    must be provably 8-aligned), but ``tpu.dynamic_rotate`` handles a
    traced shift on either dim — so each tap is two dynamic rolls of the
    full block; wrapped garbage lands in rows >= out_h / lanes >= w and is
    sliced off."""
    hp = x_ref.shape[1]
    wpad = o_ref.shape[-1]
    block = x_ref[0]
    acc = None
    for t in range(ntaps):
        wt = w_ref[0, 0, t]
        di = di_ref[0, 0, t]
        dj = dj_ref[0, 0, t]
        shifted = pltpu.roll(block, hp - di, axis=0)
        shifted = pltpu.roll(shifted, wpad - dj, axis=1)
        acc = wt * shifted if acc is None else acc + wt * shifted
    o_ref[0] = acc[0:out_h, :]


@functools.partial(jax.jit,
                   static_argnames=("max_taps", "interpret"))
def filter2d_pallas_sparse(images, kernels, max_taps: int | None = None,
                           interpret: bool = False):
    """Per-sample 2-D correlation exploiting kernel sparsity.

    A motion-blur kernel is a rasterized line (ref:03:11-30 builds it by
    rotating ``diag(ones(degree))``): of the K*K taps only the ~4*K cells
    the bilinearly-interpolated line touches are nonzero. The dense VPU
    kernel above pays for all K*K shifted accumulations; this variant
    compacts each sample's kernel to its ``max_taps`` largest-magnitude
    taps (XLA top_k, exact whenever max_taps >= the nonzero count — always
    true at the default: the measured max over degrees 5-15 x 181 angles at
    K=15 is 41 nonzeros ~= 2.75*K) and runs only those via dynamic
    sublane/lane rotates.

    Args:
      images: float32 [B, H, W, C].
      kernels: float32 [B, K, K] (or [K, K] shared).
      max_taps: taps kept per sample; default ``min(K*K, 3*K)``.

    Returns:
      float32 [B, H, W, C].
    """
    images = jnp.asarray(images, jnp.float32)
    if kernels.ndim == 2:
        kernels = jnp.broadcast_to(
            kernels[None], (images.shape[0],) + kernels.shape)
    kernels = jnp.asarray(kernels, jnp.float32)
    b, h, w, c = images.shape
    ksize = kernels.shape[-1]
    if max_taps is None:
        max_taps = min(ksize * ksize, 3 * ksize)
    anchor = ksize // 2
    pad_lo, pad_hi = anchor, ksize - 1 - anchor

    # compact: top-|max_taps| taps per sample (blur weights are >= 0)
    flat = kernels.reshape(b, ksize * ksize)
    topw, topi = jax.lax.top_k(flat, max_taps)
    # [B, 1, T]: TPU SMEM block specs need the last two block dims to
    # equal the array dims (a (1, T) block over a (B, T) array fails to
    # lower), so carry a unit middle axis like the dense kernel's [.., K, K]
    topw = topw[:, None, :]
    tap_di = (topi // ksize).astype(jnp.int32)[:, None, :]
    tap_dj = (topi % ksize).astype(jnp.int32)[:, None, :]

    x = jnp.pad(images, ((0, 0), (pad_lo, pad_hi), (pad_lo, pad_hi),
                         (0, 0)), mode="reflect")
    hp, wp = h + ksize - 1, w + ksize - 1
    # dynamic_rotate needs both dims register-aligned (sublanes % 8,
    # lanes % 128); rows wrap modulo hp_pad which never reaches the
    # [0, out_h) window since out_h - 1 + max di <= hp - 1 < hp_pad
    hp_pad = _round_up(hp, 8)
    wp_pad = _round_up(wp, 128)
    x = jnp.transpose(x, (0, 3, 1, 2)).reshape(b * c, hp, wp)
    x = jnp.pad(x, ((0, 0), (0, hp_pad - hp), (0, wp_pad - wp)))

    out = pl.pallas_call(
        functools.partial(_sparse_kernel_body, ntaps=max_taps, out_h=h),
        grid=(b * c,),
        in_specs=[
            pl.BlockSpec((1, 1, max_taps), lambda i, c=c: (i // c, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, max_taps), lambda i, c=c: (i // c, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, max_taps), lambda i, c=c: (i // c, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, hp_pad, wp_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, wp_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * c, h, wp_pad), jnp.float32),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(topw, tap_di, tap_dj, x)

    out = out[:, :, :w].reshape(b, c, h, w).transpose(0, 2, 3, 1)
    return out

"""SimpleUNet — the specialized single-distortion restorer.

Architecturally equivalent to the reference's 2-down/2-up U-Net
(ref:07:75-120): double-conv encoder blocks (64, 128), 256 bottleneck,
ConvTranspose(k=2,s=2) upsampling, channel-concat skip connections with the
decoder output placed *first* in the concat (ref:07:112,116), and a 1x1
output conv to RGB. No normalization layers; plain ReLU.

TPU-native choices: NHWC layout, configurable compute dtype (bfloat16 by
default for MXU-friendly convs, fp32 params), width multiplier for scaling
studies. Input/output: float [B, H, W, 3] in [0, 1] (un-normalized, as in
the reference restorers)."""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


class DoubleConv(nn.Module):
    """conv3x3 -> ReLU -> conv3x3 -> ReLU (ref:07:79-92)."""
    features: int
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    precision=self.precision, name="conv1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    precision=self.precision, name="conv2")(x)
        x = nn.relu(x)
        return x


class SimpleUNet(nn.Module):
    """2-level U-Net restorer (ref:07:75-120).

    Attributes:
      widths: encoder channel widths; reference uses (64, 128) with a
        bottleneck at 2*widths[-1].
      out_channels: output image channels.
      dtype: compute dtype (params stay float32).
      input_minmax: per-image min-max stretch of the input before the conv
        stack. Fog (``I = J*t + A*(1-t)``, ref:04:28) is a *global* affine
        map, but this 2-down U-Net's receptive field is a few dozen pixels
        — it cannot estimate the per-image ``t`` from flat regions, which
        caps the fog restorer at ~17 dB (RESULTS.md; the oracle affine
        inverse reaches 43 dB, benchmarks/fog_ceiling.py). The stretch is
        the one global statistic the conv stack lacks, and it is the
        reference's own tool (cv2 NORM_MINMAX, applied to every blur-tree
        image at ref:03:29) moved in front of the network. Recorded in the
        checkpoint config, so every load path applies it automatically.
    """
    widths: Sequence[int] = (64, 128)
    out_channels: int = 3
    dtype: Any = jnp.float32
    precision: Any = None
    input_minmax: bool = False

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        if self.input_minmax:
            ax = tuple(range(1, x.ndim))
            lo = jnp.min(x, axis=ax, keepdims=True)
            hi = jnp.max(x, axis=ax, keepdims=True)
            x = (x - lo) / jnp.maximum(hi - lo, 1e-6)
        x = x.astype(self.dtype)
        skips = []
        for i, w in enumerate(self.widths):
            x = DoubleConv(w, dtype=self.dtype, precision=self.precision,
                           name=f"enc{i + 1}")(x)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))

        x = DoubleConv(2 * self.widths[-1], dtype=self.dtype,
                       precision=self.precision, name="bottleneck")(x)

        for i, w in reversed(list(enumerate(self.widths))):
            x = nn.ConvTranspose(w, (2, 2), strides=(2, 2), padding="VALID",
                                 dtype=self.dtype, precision=self.precision,
                                 name=f"up{i + 1}")(x)
            # decoder output first in the concat, matching
            # torch.cat((d, e), dim=1) at ref:07:112,116
            x = jnp.concatenate([x, skips[i]], axis=-1)
            x = DoubleConv(w, dtype=self.dtype, precision=self.precision,
                           name=f"dec{i + 1}")(x)

        x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    precision=self.precision, name="final")(x)
        return x.astype(orig_dtype)

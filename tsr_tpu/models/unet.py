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
    """
    widths: Sequence[int] = (64, 128)
    out_channels: int = 3
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
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

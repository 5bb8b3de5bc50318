"""ResUNet — the unified all-distortion restorer.

Equivalent to the reference's residual U-Net (ref:14:96-186): a conv+PReLU
stem, ResidualBlocks (conv3-BN-PReLU-conv3-BN with a 1x1-conv-BN shortcut
when channels change, fused by ReLU(a+b), ref:14:96-115) at 64/128/256, a
256->512->512->256 bottleneck (ref:14:133-137), ConvTranspose(k=2,s=2)
upsampling and channel-concat skips. The reference's runtime
``F.interpolate`` shape-fix before each concat (ref:14:169-183) is
shape-dynamic in torch but is a no-op at any input divisible by 8 — here
shapes are static under jit and we assert divisibility instead.

TPU-native: NHWC, bf16-capable compute, BatchNorm statistics computed over
the *global* (sharded) batch — under ``jit`` with a data-sharded batch the
batch-mean reduction is a cross-device collective XLA inserts automatically.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


class PReLU(nn.Module):
    """PReLU with a single shared learnable slope, init 0.25 (torch default,
    used at ref:14:101)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        alpha = self.param(
            "alpha", lambda _: jnp.asarray(0.25, jnp.float32)
        ).astype(x.dtype)
        return jnp.where(x >= 0, x, alpha * x)


class ResidualBlock(nn.Module):
    """conv3-BN-PReLU-conv3-BN (+1x1-conv-BN shortcut iff channel change),
    output ReLU(main + shortcut) (ref:14:96-115)."""
    features: int
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_c = x.shape[-1]
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train,
            momentum=0.9,  # torch momentum=0.1 => new = 0.9*old + 0.1*batch
            epsilon=1e-5,
            dtype=self.dtype,
            name=name,
        )
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    precision=self.precision, name="conv1")(x)
        h = bn("bn1")(h)
        h = PReLU(dtype=self.dtype, name="prelu")(h)
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    precision=self.precision, name="conv2")(h)
        h = bn("bn2")(h)

        if in_c != self.features:
            s = nn.Conv(self.features, (1, 1), dtype=self.dtype,
                        precision=self.precision, name="shortcut_conv")(x)
            s = bn("shortcut_bn")(s)
        else:
            s = x
        return nn.relu(h + s)


class ResUNet(nn.Module):
    """3-level residual U-Net (ref:14:117-186)."""
    widths: Sequence[int] = (64, 128, 256)
    bottleneck_width: int = 512
    out_channels: int = 3
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert x.shape[1] % 8 == 0 and x.shape[2] % 8 == 0, (
            "ResUNet requires spatial dims divisible by 8 (the reference's "
            "F.interpolate shape-fix at ref:14:169-183 is then a no-op)"
        )
        orig_dtype = x.dtype
        x = x.astype(self.dtype)

        # Stem: conv3x3 -> PReLU (ref:14:122)
        x = nn.Conv(self.widths[0], (3, 3), padding=1, dtype=self.dtype,
                    precision=self.precision, name="stem_conv")(x)
        x = PReLU(dtype=self.dtype, name="stem_prelu")(x)

        skips = []
        # enc: res1(64->64), res2(64->128), res3(128->256) (ref:14:123-130)
        for i, w in enumerate(self.widths):
            x = ResidualBlock(w, dtype=self.dtype, precision=self.precision,
                              name=f"res{i + 1}")(x, train)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))

        # bottleneck 256->512->512->256 (ref:14:133-137)
        x = ResidualBlock(self.bottleneck_width, dtype=self.dtype,
                          precision=self.precision,
                          name="bottleneck1")(x, train)
        x = ResidualBlock(self.bottleneck_width, dtype=self.dtype,
                          precision=self.precision,
                          name="bottleneck2")(x, train)
        x = ResidualBlock(self.widths[-1], dtype=self.dtype,
                          precision=self.precision,
                          name="bottleneck3")(x, train)

        # dec: up3(256->128) concat r3 -> dec3(384->128), etc.
        # (ref:14:140-147); up1 maps 64->64 per ref:14:146.
        up_features = [self.widths[0]] + list(self.widths[:-1])
        for i in reversed(range(len(self.widths))):
            x = nn.ConvTranspose(up_features[i], (2, 2), strides=(2, 2),
                                 padding="VALID", dtype=self.dtype,
                                 precision=self.precision,
                                 name=f"up{i + 1}")(x)
            x = jnp.concatenate([x, skips[i]], axis=-1)
            x = ResidualBlock(self.widths[max(i - 1, 0)], dtype=self.dtype,
                              precision=self.precision,
                              name=f"dec{i + 1}")(x, train)

        x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    precision=self.precision, name="final")(x)
        return x.astype(orig_dtype)

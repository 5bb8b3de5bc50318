"""VGG16 — the judge classifier, perceptual-loss backbone, and
interpretability feature extractor, all one module.

The reference builds three separate torchvision VGG16s: the fine-tuned judge
with ``classifier[6] -> Linear(4096, 43)`` (ref:05:47-56), a frozen
``features[:16]`` slice for the perceptual loss (ref:07adv:95-112), and
ImageNet-weight feature taps for interpretability (ref:11:31-44,
ref:12:37-44). Here a single Flax module serves all three via ``taps``:
calling with ``tap_layer=k`` returns the activation after torch
``features[k]`` (same indexing as torchvision's ``model.features``, so
reference layer indices carry over: 15 = relu3_3 end of ``features[:16]``,
2 = relu1_2, 30 = final pool output [B,7,7,512]).

Note on weights: torchvision's ImageNet checkpoint is unobtainable offline
(no torchvision, zero egress), so the judge trains from scratch on GTSRB and
the perceptual loss / taps use judge-trained features — a documented
deviation (SURVEY.md §7 step 2). The ``.pth`` converter in
``tsr_tpu.checkpoint`` loads torchvision-format state dicts when available.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

# torchvision vgg16 'D' configuration: conv widths with 'M' maxpools.
VGG16_CFG: Tuple = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                    512, 512, 512, "M", 512, 512, 512, "M")

# torch features-module index of each conv / pool, for tap parity:
# conv indices: 0,2, 5,7, 10,12,14, 17,19,21, 24,26,28; pools: 4,9,16,23,30;
# relu follows each conv at +1.
PERCEPTUAL_TAP = 15   # end of features[:16] == relu3_3 (ref:07adv:102-103)
HIDDEN_STATE_TAP = 2  # conv1_2 pre-activation output (ref:11:93)
GAP_TAP = 30          # final pool -> [B,7,7,512] (ref:12:37-44)


class VGG16(nn.Module):
    """VGG16-D with a classifier head.

    Input: float NHWC. The *judge* path expects ImageNet-normalized input
    (ref:05:27-29); the *perceptual* path deliberately receives un-normalized
    [0,1] images (ref:07adv:150-151, ref:14:239) — normalization is the
    caller's job, preserving that reference quirk.
    """
    num_classes: int = 43
    dtype: Any = jnp.float32
    # Dropout in the classifier (torch default p=0.5). Disabled outside train.
    dropout_rate: float = 0.5
    precision: Any = None
    # Batch norm variant (vgg16_bn) — not used by the reference, but needed
    # to train the judge from scratch in reasonable time.
    use_batchnorm: bool = False
    # Architecture knobs (reference = torchvision defaults); shrink for tests.
    cfg: Tuple = VGG16_CFG
    fc_width: int = 4096

    def tap_index(self, plain_idx: int) -> int:
        """Translate a plain-vgg16 ``features`` index (the reference's
        numbering — ``PERCEPTUAL_TAP``/``HIDDEN_STATE_TAP``/``GAP_TAP``)
        into THIS variant's torch index.

        ``tap_layer`` mirrors torchvision indexing for the built variant,
        and vgg16_bn interleaves a BatchNorm after every conv, shifting
        every index downstream of conv1_1 — tapping a bn-variant judge
        with a plain index silently returns a different layer. Identity
        when ``use_batchnorm=False``; BN layers themselves have no plain
        equivalent and cannot be addressed through this mapping.
        """
        if not self.use_batchnorm:
            return plain_idx
        plain = bn = 0
        for v in self.cfg:
            if v == "M":
                if plain_idx == plain:
                    return bn
                plain += 1
                bn += 1
            else:
                if plain_idx == plain:      # the conv itself
                    return bn
                if plain_idx == plain + 1:  # its relu (conv, bn, relu)
                    return bn + 2
                plain += 2
                bn += 3
        raise ValueError(f"plain tap index {plain_idx} out of range")

    @nn.compact
    def __call__(
        self,
        x,
        train: bool = False,
        tap_layer: Optional[int] = None,
        return_features: bool = False,
    ):
        """Forward pass.

        Args:
          x: [B, H, W, 3] float.
          train: enables dropout (and BN batch stats if use_batchnorm).
          tap_layer: if set, return the activation right after torch
            ``features[tap_layer]`` (NHWC).
          return_features: if True, return (logits, [B,7,7,512] features).
        """
        orig_dtype = x.dtype
        h = x.astype(self.dtype)
        torch_idx = 0
        for v in self.cfg:
            if v == "M":
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
                if torch_idx == tap_layer:
                    return h.astype(orig_dtype)
                torch_idx += 1
            else:
                h = nn.Conv(v, (3, 3), padding=1, dtype=self.dtype,
                            precision=self.precision,
                            name=f"features_{torch_idx}")(h)
                if torch_idx == tap_layer:
                    return h.astype(orig_dtype)
                torch_idx += 1
                if self.use_batchnorm:
                    h = nn.BatchNorm(use_running_average=not train,
                                     momentum=0.9, epsilon=1e-5,
                                     dtype=self.dtype,
                                     name=f"features_bn_{torch_idx}")(h)
                    if torch_idx == tap_layer:
                        return h.astype(orig_dtype)
                    torch_idx += 1
                h = nn.relu(h)
                if torch_idx == tap_layer:
                    return h.astype(orig_dtype)
                torch_idx += 1
        if tap_layer is not None:
            raise ValueError(f"tap_layer {tap_layer} out of range")

        feats = h  # [B, 7, 7, 512] at 224 input

        # torch flattens CHW; transpose so .pth-converted FC weights line up.
        b = h.shape[0]
        h = jnp.transpose(h, (0, 3, 1, 2)).reshape(b, -1)

        h = nn.Dense(self.fc_width, dtype=self.dtype,
                     precision=self.precision, name="classifier_0")(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        h = nn.Dense(self.fc_width, dtype=self.dtype,
                     precision=self.precision, name="classifier_3")(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        logits = nn.Dense(self.num_classes, dtype=self.dtype,
                          precision=self.precision,
                          name="classifier_6")(h)
        logits = logits.astype(orig_dtype)
        if return_features:
            return logits, feats.astype(orig_dtype)
        return logits


def feature_slice_apply(vgg: VGG16, variables, x, upto: int = 16,
                        train: bool = False):
    """Run ``features[:upto]`` (plain-vgg16 torch indexing) — i.e. tap at
    ``upto - 1``, translated for batchnorm variants via ``tap_index``.

    The perceptual loss uses ``upto=16`` (ref:07adv:102-103)."""
    return vgg.apply(variables, x, train=train,
                     tap_layer=vgg.tap_index(upto - 1))

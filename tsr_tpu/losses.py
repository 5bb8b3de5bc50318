"""Training losses.

- MSE pixel loss (ref:07:142)
- L1 pixel loss (ref:14:219)
- VGG perceptual loss: mean squared distance in ``features[:16]`` space of a
  frozen VGG16 (ref:07adv:95-112, ref:14:189-196). Reference quirk preserved:
  the perceptual network receives **un-normalized [0,1] images** — no
  ImageNet normalization (ref:07adv:150-151, ref:14:239).
- Cross-entropy for the judge (ref:05:59).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax

from tsr_tpu.models import vgg as vgg_mod


def mse_loss(pred, target):
    return jnp.mean((pred - target) ** 2)


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def cross_entropy_loss(logits, labels, label_smoothing: float = 0.0):
    if label_smoothing:
        num = logits.shape[-1]
        onehot = optax.smooth_labels(
            jnp.eye(num, dtype=logits.dtype)[labels], label_smoothing
        )
        return optax.softmax_cross_entropy(logits, onehot).mean()
    return optax.softmax_cross_entropy_with_integer_labels(
        logits, labels
    ).mean()


def make_perceptual_loss(vgg: vgg_mod.VGG16, vgg_variables,
                         upto: int = 16):
    """Build ``phi(x), phi(y) -> mean((phi(x)-phi(y))**2)`` with a frozen
    VGG ``features[:upto]`` slice (ref:07adv:95-112).

    The returned closure treats ``vgg_variables`` as a constant (no gradient
    flows into it), matching the reference's ``requires_grad = False``.
    """
    tap = upto - 1

    def perceptual(x01, y01):
        fx = vgg.apply(vgg_variables, x01, train=False, tap_layer=tap)
        fy = vgg.apply(vgg_variables, y01, train=False, tap_layer=tap)
        return jnp.mean((fx - fy) ** 2)

    return perceptual


def restoration_loss(pred, target, perceptual=None,
                     perceptual_weight: float = 0.1,
                     pixel: str = "l1"):
    """Combined restoration loss.

    ``pixel='mse'`` with no perceptual = specialized trainer (ref:07:142);
    ``pixel='l1'`` + 0.1·perceptual = advanced/unified trainers
    (ref:07adv:150-154, ref:14:238-242).
    Returns (loss, aux dict).
    """
    pix = mse_loss(pred, target) if pixel == "mse" else l1_loss(pred, target)
    aux = {"pixel_loss": pix}
    loss = pix
    if perceptual is not None:
        p = perceptual(pred, target)
        aux["perceptual_loss"] = p
        loss = loss + perceptual_weight * p
    aux["loss"] = loss
    return loss, aux

"""Shared training-state machinery for all four reference training paths.

The reference has four loops: judge (ref:05), specialized MSE U-Net
(ref:07), advanced perceptual U-Net (ref:07adv), unified ResUNet (ref:14).
Here each is a factory returning a jitted (and donate-argnum'd) train step
over a :class:`TrainState`; the loops themselves live in
``tsr_tpu.train.loops``.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import core, struct

from tsr_tpu import configs, losses
from tsr_tpu.ops import distortions, image as image_ops


class TrainState(struct.PyTreeNode):
    """Minimal train state: params + optional batch_stats + optax state."""

    step: jnp.ndarray
    params: core.FrozenDict
    batch_stats: Optional[core.FrozenDict]
    opt_state: optax.OptState
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            batch_stats=(core.freeze(new_batch_stats)
                         if new_batch_stats is not None
                         else self.batch_stats),
            opt_state=new_opt,
        )

    @classmethod
    def create(cls, apply_fn, variables, tx):
        variables = core.freeze(variables)
        params = variables["params"]
        batch_stats = variables.get("batch_stats")
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            tx=tx,
            apply_fn=apply_fn,
        )

    @property
    def variables(self):
        v = {"params": self.params}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        return v


# --------------------------------------------------------------------------
# Optimizers matching the reference settings
# --------------------------------------------------------------------------

def judge_optimizer(cfg: configs.JudgeTrainConfig):
    """SGD(lr=1e-3, momentum=0.9) (ref:05:60), or AdamW for the
    from-scratch path (cfg.optimizer — see configs.JudgeTrainConfig).

    The AdamW path adds linear warmup + global-norm clipping: a plain
    (no-BN) VGG16 from random init otherwise collapses to chance on some
    seeds — the exact fragility ImageNet init papered over in the
    reference."""
    if cfg.optimizer == "adamw":
        sched = optax.linear_schedule(
            0.0, cfg.learning_rate,
            max(1, cfg.warmup_steps)) if cfg.warmup_steps else \
            cfg.learning_rate
        return optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adamw(sched, weight_decay=cfg.weight_decay))
    return optax.sgd(cfg.learning_rate, momentum=cfg.momentum)


def restoration_optimizer(cfg: configs.RestorationTrainConfig):
    """Adam(lr=1e-3) (ref:07:143)."""
    return optax.adam(cfg.learning_rate)


def advanced_optimizer(cfg: configs.AdvancedTrainConfig):
    """Adam(lr=2e-4) (ref:07adv:135)."""
    return optax.adam(cfg.learning_rate)


def unified_optimizer(cfg: configs.UnifiedTrainConfig, steps_per_epoch: int):
    """AdamW(2e-4, wd=1e-4) + cosine annealing over T_max epochs
    (ref:14:222-223). torch's CosineAnnealingLR steps per epoch; here the
    schedule is expressed per-step with the same epoch-resolution curve."""
    sched = optax.cosine_decay_schedule(
        cfg.learning_rate, max(1, cfg.cosine_t_max * steps_per_epoch)
    )
    return optax.adamw(sched, weight_decay=cfg.weight_decay)


# --------------------------------------------------------------------------
# Train-step factories
# --------------------------------------------------------------------------

def make_judge_train_step(label_smoothing: float = 0.0, jit: bool = True):
    """Judge fine-tune step: ImageNet-normalized input, CE loss (ref:05:75-87).

    Batch: (images_u8 [B,H,W,3], labels [B]). ``jit=False`` returns the raw
    step for embedding in a larger jitted graph (e.g. the scanned-epoch
    device-resident loop in ``loops.train_judge_on_device``).
    """

    def step(state: TrainState, images_u8, labels, dropout_rng):
        x = image_ops.imagenet_normalize(image_ops.to_float01(images_u8))

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
                logits, new_vars = state.apply_fn(
                    variables, x, train=True,
                    rngs={"dropout": dropout_rng},
                    mutable=["batch_stats"],
                )
            else:
                logits = state.apply_fn(
                    variables, x, train=True, rngs={"dropout": dropout_rng})
                new_vars = {}
            loss = losses.cross_entropy_loss(logits, labels, label_smoothing)
            acc = jnp.mean(jnp.argmax(logits, -1) == labels)
            return loss, (acc, new_vars.get("batch_stats"))

        (loss, (acc, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
        return new_state, {"loss": loss, "accuracy": acc}

    if not jit:
        return step
    return jax.jit(step, donate_argnums=(0,))


def make_restoration_train_step(pixel: str = "mse",
                                perceptual_weight: float = 0.1,
                                vgg_apply: Optional[Callable] = None,
                                jit: bool = True):
    """Restorer step on precomputed (bad01, clean01) float batches.

    ``pixel='mse'`` reproduces ref:07:142; pass ``vgg_apply`` (a frozen
    ``(x01) -> features`` closure) for the L1+perceptual variant
    (ref:07adv:150-154)."""

    def step(state: TrainState, bad01, clean01):
        # accept uint8 batches and convert on device: feeding pre-converted
        # float32 from host quadruples the host->device bytes
        bad01 = image_ops.to_float01(bad01) if bad01.dtype == jnp.uint8 \
            else bad01
        clean01 = (image_ops.to_float01(clean01)
                   if clean01.dtype == jnp.uint8 else clean01)

        def loss_fn(params):
            pred = state.apply_fn({"params": params}, bad01)
            perc = None
            if vgg_apply is not None:
                perc = lambda a, b: jnp.mean(  # noqa: E731
                    (vgg_apply(a) - vgg_apply(b)) ** 2)
            loss, aux = losses.restoration_loss(
                pred, clean01, perceptual=perc,
                perceptual_weight=perceptual_weight, pixel=pixel)
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        return state.apply_gradients(grads), aux

    if not jit:
        return step
    return jax.jit(step, donate_argnums=(0,))


def make_unified_train_step(
    mix_cfg: configs.RandomMixConfig,
    perceptual_weight: float = 0.1,
    vgg_apply: Optional[Callable] = None,
    remat=False,
    jit: bool = True,
):
    """Unified ResUNet step with **on-device** distortion generation.

    Takes a clean uint8 batch + PRNG key; the random-mix distortion
    (ref:14:31-64) runs inside the jitted step, replacing the reference's
    8-worker CPU generation (ref:14:213). BatchNorm batch_stats are updated
    via the mutable collection; under a sharded batch the batch-mean
    reductions become cross-device collectives automatically.

    ``remat`` selects the rematerialization placement:
      - ``False``: none — fastest when the batch fits HBM.
      - ``"vgg"``: checkpoint only the perceptual-VGG branch that needs
        input grads. The frozen VGG's early 224^2x64 activations are the
        dominant HBM residents (~0.8 GB/tensor at bs128 bf16) and cost one
        cheap extra fwd to recompute — this buys batch 128 on 16 GB
        without recomputing the ResUNet.
      - ``True``: full-fwd checkpoint (ResUNet too) — most memory-frugal,
        pays a full extra restorer forward.
    """

    def step(state: TrainState, clean_u8, key):
        bad01, clean01 = distortions.make_training_pair(
            clean_u8, key, mix_cfg)

        def fwd(params, batch_stats, bad):
            out, new_vars = state.apply_fn(
                {"params": params, "batch_stats": batch_stats},
                bad, train=True, mutable=["batch_stats"],
            )
            return out, new_vars["batch_stats"]

        if remat is True:
            fwd = jax.checkpoint(fwd)

        def loss_fn(params):
            pred, new_bs = fwd(params, state.batch_stats, bad01)
            perc = None
            if vgg_apply is not None:
                vgg_a = (jax.checkpoint(vgg_apply) if remat == "vgg"
                         else vgg_apply)
                perc = lambda a, b: jnp.mean(  # noqa: E731
                    # the clean-branch features are constant wrt params —
                    # stop_gradient makes that explicit so no activations
                    # are kept for it
                    (vgg_a(a) - jax.lax.stop_gradient(vgg_apply(b))) ** 2)
            loss, aux = losses.restoration_loss(
                pred, clean01, perceptual=perc,
                perceptual_weight=perceptual_weight, pixel="l1")
            return loss, (aux, new_bs)

        (loss, (aux, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
        return new_state, aux

    if not jit:
        return step
    return jax.jit(step, donate_argnums=(0,))


def make_restoration_eval_step(pixel: str = "mse",
                               perceptual_weight: float = 0.1,
                               vgg_apply: Optional[Callable] = None,
                               train_model: bool = False):
    """Validation loss step (ref:07:166-173, ref:14:255-260)."""

    def step(state: TrainState, bad01, clean01):
        bad01 = image_ops.to_float01(bad01) if bad01.dtype == jnp.uint8 \
            else bad01
        clean01 = (image_ops.to_float01(clean01)
                   if clean01.dtype == jnp.uint8 else clean01)
        variables = state.variables
        if state.batch_stats is not None:
            pred = state.apply_fn(variables, bad01, train=False)
        else:
            pred = state.apply_fn(variables, bad01)
        perc = None
        if vgg_apply is not None:
            perc = lambda a, b: jnp.mean(  # noqa: E731
                (vgg_apply(a) - vgg_apply(b)) ** 2)
        _, aux = losses.restoration_loss(
            pred, clean01, perceptual=perc,
            perceptual_weight=perceptual_weight, pixel=pixel)
        return aux

    return jax.jit(step)


def make_judge_eval_step():
    """Top-1 correctness count (ref:06:49-55)."""

    def step(state: TrainState, images_u8, labels):
        x = image_ops.imagenet_normalize(image_ops.to_float01(images_u8))
        logits = state.apply_fn(state.variables, x, train=False)
        pred = jnp.argmax(logits, -1)
        return jnp.sum(pred == labels), logits

    return jax.jit(step)

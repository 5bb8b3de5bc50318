"""End-to-end demo pipelines: cascade stress test and unified demo.

- :func:`cascade_stress`: ref:13:94-239 — distort step-by-step
  Blur->Fog->Noise (mild params), restore by chaining the three specialized
  U-Nets Noise->Fog->Blur **on the raw, unclamped tensor between stages**
  (ref:13:181; clamping only for the visualization copies, ref:13:184),
  and score VGG confidence at all 7 stages.
- :func:`unified_demo`: ref:15:131-229 — compound distort (Fog->Noise->Blur
  order, ref:15:93-120), blind ResUNet restore, VGG confidence on
  clean/bad/restored.

Both run the whole batch through jitted graphs — no per-image loops.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tsr_tpu import configs
from tsr_tpu.ops import distortions, image as image_ops

# Restoration chain order for the cascade (ref:13:27)
RESTORATION_ORDER = ("noise", "fog", "blur")
# Distortion order for the cascade (ref:13:153-169)
DISTORTION_ORDER = ("blur", "fog", "noise")

# Measured net restored-confidence delta per cascade restorer variant
# (RESULTS.md cascade section; readings benchmarks/readings/r4/). The
# reference's own regime is +0.103 (0.749 -> 0.852, ref:13:226-238).
VARIANT_TABLE = {
    "A": ("reference-exact severe trees, no identity anchor", -0.248),
    "B": ("severe trees + identity anchor", -0.082),
    "B'": ("B + min-max fog restorer", -0.016),
    "C": ("severity-jittered trees + identity anchor + min-max fog",
          +0.187),
}


def cascade_variant(task_configs: Dict[str, dict]) -> Tuple[str, str]:
    """Derive which measured cascade variant (RESULTS.md A/B/B'/C) a set
    of restorer checkpoints represents from their recorded provenance
    (``config.json``: identity_frac / input_minmax / severity — written by
    scripts/07 since round 5).

    Returns ``(code, description)``; code is '?' when the checkpoints
    predate provenance recording.
    """
    cfgs = [task_configs.get(t) or {} for t in RESTORATION_ORDER]
    if not any(c for c in cfgs):
        return "?", "no provenance recorded (pre-r5 checkpoints)"
    jittered = any(c.get("severity") == "jittered" for c in cfgs)
    anchored = any(c.get("identity_frac", 0) > 0 for c in cfgs)
    minmax_fog = bool((task_configs.get("fog") or {}).get("input_minmax"))
    if jittered:
        code = "C"
    elif minmax_fog and anchored:
        code = "B'"
    elif anchored:
        code = "B"
    else:
        code = "A"
    return code, VARIANT_TABLE[code][0]


@functools.partial(jax.jit, static_argnums=(0,))
def _judge_confidence(judge_apply, judge_vars, x01):
    """Jitted: eager execution through a PJRT relay pays a round-trip per
    op, so every hot path in this module is a single compiled graph."""
    logits = judge_apply(
        judge_vars, image_ops.imagenet_normalize(x01), train=False)
    probs = jax.nn.softmax(logits, -1)
    conf = jnp.max(probs, -1)
    pred = jnp.argmax(probs, -1)
    return pred, conf


def cascade_stress(
    clean_u8: np.ndarray,
    restorer_apply: Callable,
    restorer_vars: Dict[str, object],
    judge_apply: Callable,
    judge_vars,
    key,
    mild: configs.MildConfig = configs.MildConfig(),
    precomputed_stages=None,
) -> Dict[str, object]:
    """Run the 7-stage cascade on a uint8 batch.

    ``restorer_vars`` maps task name ('noise'/'fog'/'blur') to that
    SimpleUNet's variables (ref:13:98-103). ``restorer_apply`` is one
    shared apply fn, or a dict task -> apply fn — required when the
    checkpoints differ architecturally (e.g. a fog restorer saved with
    ``input_minmax``; zoo.load_model rebuilds each module from its
    config, so pass each loaded module's own ``.apply``).
    ``precomputed_stages`` (a list of four (name, uint8 batch) tuples)
    lets the caller supply phase-1 distortions applied at native
    resolution, matching ref:13:147-169.

    Returns dict with ``stages`` (list of (name, uint8 batch or float01
    batch)), per-stage ``pred``/``confidence`` arrays, and the three
    headline means (ref:13:226-238).
    """
    k1 = key
    if precomputed_stages is not None:
        # caller distorted at native resolution (ref:13:147-169 operates on
        # the native cv2 image before any resize) and resized each stage
        stages: List[Tuple[str, np.ndarray]] = list(precomputed_stages)
        assert len(stages) == 4, "expect Clean/+Blur/+Fog/+Noise"
    else:
        stages = [("Clean", clean_u8)]
        # Phase 1: distort Blur -> Fog -> Noise, uint8 between stages
        # (ref:13:153-169)
        x = distortions.mild_blur(clean_u8, mild)
        stages.append(("+ Blur", np.asarray(x)))
        x = distortions.mild_fog(x, mild)
        stages.append(("+ Fog", np.asarray(x)))
        x = distortions.mild_noise(x, k1, mild)
        stages.append(("+ Noise (final bad)", np.asarray(x)))

    # Phase 2: cascade restore Noise -> Fog -> Blur, chaining the raw
    # (unclamped) float tensor between models (ref:13:174-189)
    applies = (restorer_apply if isinstance(restorer_apply, dict)
               else {task: restorer_apply for task in RESTORATION_ORDER})

    @jax.jit
    def chain(variables_by_task, bad_u8):
        t = image_ops.to_float01(bad_u8)
        outs = []
        for task in RESTORATION_ORDER:
            t = applies[task](variables_by_task[task], t)
            outs.append(jnp.clip(t, 0.0, 1.0))  # viz copy (ref:13:184)
        return t, outs

    raw, clipped = chain(restorer_vars, stages[-1][1])
    for task, c in zip(RESTORATION_ORDER, clipped):
        stages.append((f"Restored {task}", np.asarray(c)))

    # Phase 3: judge confidence at all 7 stages (ref:13:191-206); the final
    # restored stage is judged on the clamped output.
    preds, confs = [], []
    for name, img in stages:
        x01 = (image_ops.to_float01(img) if img.dtype == np.uint8
               else jnp.asarray(img))
        p, c = _judge_confidence(judge_apply, judge_vars, x01)
        preds.append(np.asarray(p))
        confs.append(np.asarray(c))

    return {
        "stages": stages,
        "preds": preds,
        "confidences": confs,
        "mean_confidence": {
            "clean": float(np.mean(confs[0])),
            "distorted": float(np.mean(confs[3])),
            "restored": float(np.mean(confs[6])),
        },
    }


def unified_demo(
    clean_u8: np.ndarray,
    resunet_apply: Callable,
    resunet_vars,
    judge_apply: Callable,
    judge_vars,
    key,
    cfg: configs.CompoundConfig = configs.CompoundConfig(),
    bad_u8: np.ndarray = None,
) -> Dict[str, object]:
    """ref:15: compound distort (Fog->Noise->Blur), blind unified restore,
    judge confidence on clean / bad / restored. Pass ``bad_u8`` when the
    compound distortion was applied at native resolution (ref:15:170-174
    distorts the raw cv2 image before the Resize(224) transform)."""
    if bad_u8 is None:
        bad_u8 = np.asarray(distortions.make_compound_distortion(
            clean_u8, key, cfg))

    @jax.jit
    def restore(variables, u8):
        x01 = image_ops.to_float01(u8)
        out = resunet_apply(variables, x01, train=False)
        return jnp.clip(out, 0.0, 1.0)

    restored01 = restore(resunet_vars, bad_u8)

    results = {}
    for name, x in (("clean", image_ops.to_float01(clean_u8)),
                    ("bad", image_ops.to_float01(bad_u8)),
                    ("restored", restored01)):
        p, c = _judge_confidence(judge_apply, judge_vars, x)
        results[name] = {"pred": np.asarray(p), "confidence": np.asarray(c)}

    return {
        "bad_u8": bad_u8,
        "restored_u8": np.asarray(
            jnp.trunc(image_ops.scale255(restored01)).astype(jnp.uint8)),
        "judge": results,
    }

"""Post-training int8 quantization for the serving path.

The evaluation graph is forward-only, so the judge can run on the TPU's
int8 MXU path (v5e: ~394 TOPS int8 vs ~197 TFLOP/s bf16 — a 2x matmul
ceiling) without touching training. This module quantizes a trained
VGG16 judge (the classifier of ref:06/09/18's accuracy harnesses and
ref:13/15's confidence probes) to a static int8 parameter tree and
provides a jit-friendly forward with the same calling convention as
``model.apply`` — a drop-in ``judge_apply`` for
:func:`tsr_tpu.eval.make_fused_eval_step`.

Scheme (standard TPU-serving PTQ):
  * weights: symmetric per-output-channel int8 (abs-max), folded
    BatchNorm first for the vgg16_bn variant;
  * activations: symmetric per-tensor *dynamic* int8 (abs-max computed
    in-graph per batch) — no calibration set needed, and the reduction
    fuses into the preceding elementwise op;
  * conv/dot run int8 x int8 -> int32 via ``preferred_element_type``,
    then dequantize-and-bias in float32 (fuses with the ReLU).

The reference has no quantized path (its serving story is torch fp32 on
GPU); this is a TPU-native extension measured by
``benchmarks/quant_bench.py`` and gated on accuracy parity by
``tests/test_quant.py``.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import lax

from tsr_tpu.models.vgg import VGG16

_CONV_DIMS = ("NHWC", "HWIO", "NHWC")

# Dequantized conv activations are STORED in bf16. The int8 graph's HBM
# footprint was dominated by f32 dequant temps — two f32[512,224,224,64]
# allocations of 6.12 GB each out of the 15.78 GB that failed AOT compile
# at batch 512 with "Exceeded hbm capacity by 30.47M"
# (benchmarks/readings/r5/int8_aot.jsonl; VERDICT r4 task 7). bf16 storage
# halves them; the scale/bias math stays f32 and bf16's 8-bit mantissa
# matches int8's own precision, so the added error sits below the
# quantization noise (tests/test_quant.py tolerances unchanged).
_ACT_DTYPE = jnp.bfloat16


def absmax_quantize(w: jnp.ndarray, axes) -> tuple:
    """Symmetric abs-max int8 quantization of ``w`` over ``axes``.

    Returns ``(q, scale)`` with ``q`` int8 in [-127, 127] and ``scale``
    float32 shaped like ``w`` reduced over ``axes`` (kept dims squeezed),
    such that ``q * scale ~= w``.
    """
    s = jnp.max(jnp.abs(w), axis=axes, keepdims=True)
    s = jnp.maximum(s, 1e-8).astype(jnp.float32) / 127.0
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return q, jnp.squeeze(s, axis=axes)


def _quantize_act(h: jnp.ndarray) -> tuple:
    """Dynamic per-tensor int8 for an activation tensor (in-graph)."""
    s = jnp.maximum(jnp.max(jnp.abs(h)), 1e-8).astype(jnp.float32) / 127.0
    q = jnp.clip(jnp.round(h / s), -127, 127).astype(jnp.int8)
    return q, s


def fold_batchnorm_vgg(model: VGG16, variables) -> Dict[str, Any]:
    """Fold BatchNorm (inference form) of a vgg16_bn judge into the
    preceding conv's kernel/bias, returning a *plain*-VGG16-shaped
    ``{'params': ...}`` tree (no batch_stats).

    y = gamma * (conv(x) + b - mean) / sqrt(var + eps) + beta
      = conv(x) * g + (b - mean) * g + beta,   g = gamma / sqrt(var+eps)
    """
    params = variables["params"]
    if not model.use_batchnorm:
        return {"params": params}
    stats = variables["batch_stats"]
    out: Dict[str, Any] = {}
    torch_idx = 0
    for v in model.cfg:
        if v == "M":
            torch_idx += 1
            continue
        conv = params[f"features_{torch_idx}"]
        bn_name = f"features_bn_{torch_idx + 1}"
        bn, bs = params[bn_name], stats[bn_name]
        g = bn["scale"] / jnp.sqrt(bs["var"] + 1e-5)
        out[f"features_{torch_idx}"] = {
            "kernel": conv["kernel"] * g[None, None, None, :],
            "bias": (conv["bias"] - bs["mean"]) * g + bn["bias"],
        }
        torch_idx += 3  # conv, bn, relu
    for name in ("classifier_0", "classifier_3", "classifier_6"):
        out[name] = dict(params[name])
    return {"params": out}


def quantize_vgg16(model: VGG16, variables) -> Dict[str, Any]:
    """Quantize a trained VGG16's parameters to the int8 serving tree.

    Accepts plain or batchnorm variants (BN is folded first). Returns a
    plain pytree ``{'convs': [{q, scale, bias}...], 'fcs': [...]}`` in
    forward order — jit/device_put friendly, independent of Flax naming.
    """
    folded = fold_batchnorm_vgg(model, variables)["params"]
    convs, torch_idx = [], 0
    step = 3 if model.use_batchnorm else 2
    for v in model.cfg:
        if v == "M":
            torch_idx += 1
            continue
        # After folding, conv names follow the *variant's* torch indices.
        p = folded[f"features_{torch_idx}"]
        q, s = absmax_quantize(p["kernel"], axes=(0, 1, 2))
        convs.append({"q": q, "scale": s,
                      "bias": p["bias"].astype(jnp.float32)})
        torch_idx += step
    fcs = []
    for name in ("classifier_0", "classifier_3", "classifier_6"):
        p = folded[name]
        q, s = absmax_quantize(p["kernel"], axes=(0,))
        fcs.append({"q": q, "scale": s,
                    "bias": p["bias"].astype(jnp.float32)})
    return {"convs": convs, "fcs": fcs}


def _act_store(h):
    """Force ``h`` to MATERIALIZE as bf16. A bare ``.astype`` is not
    enough: XLA keeps the f32 dequant+relu fusion output as the stored
    buffer and duplicates the convert into each consumer, so the
    6.12 GB-per-tensor f32 temps survive (the batch-512 OOM). The
    barrier makes the convert the fusion's root, so the buffer that
    lives between layers is the bf16 one."""
    return lax.optimization_barrier(h.astype(_ACT_DTYPE))


def _qconv(h, layer, relu: bool = True):
    xq, sx = _quantize_act(h)
    y = lax.conv_general_dilated(
        xq, layer["q"], (1, 1), "SAME",
        dimension_numbers=_CONV_DIMS, preferred_element_type=jnp.int32)
    h = y.astype(jnp.float32) * (sx * layer["scale"]) + layer["bias"]
    return _act_store(jax.nn.relu(h) if relu else h)


def _qdense(h, layer, relu: bool = True):
    xq, sx = _quantize_act(h)
    y = lax.dot_general(xq, layer["q"], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
    h = y.astype(jnp.float32) * (sx * layer["scale"]) + layer["bias"]
    return jax.nn.relu(h) if relu else h


def make_int8_judge_apply(model: VGG16):
    """Build the int8 forward for ``model``'s architecture.

    Returns ``apply(qvars, x, train=False) -> logits`` — same calling
    convention as ``model.apply`` so eval harnesses take it unchanged.
    ``x`` is float NHWC (ImageNet-normalized, as the fp judge expects).
    """
    cfg = model.cfg

    def apply(qvars, x, train: bool = False):  # noqa: ARG001 (parity)
        del train  # inference-only path; dropout is identity
        h = x.astype(jnp.float32)
        ci = 0
        for v in cfg:
            if v == "M":
                h = lax.reduce_window(
                    h, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                    "VALID")
            else:
                h = _qconv(h, qvars["convs"][ci])
                ci += 1
        b = h.shape[0]
        h = jnp.transpose(h, (0, 3, 1, 2)).reshape(b, -1)  # torch CHW flatten
        h = _qdense(h, qvars["fcs"][0])
        h = _qdense(h, qvars["fcs"][1])
        return _qdense(h, qvars["fcs"][2], relu=False)

    return apply


def quantized_judge(model: VGG16, variables):
    """One-call convenience: ``(judge_apply, qvars)`` for eval harnesses."""
    qvars = quantize_vgg16(model, variables)
    return make_int8_judge_apply(model), qvars


# ---------------------------------------------------------------------------
# Restorers. The fused serving path's FLOPs are dominated by the restorer
# (RESULTS.md roofline: ResUNet fwd ~55 GFLOP/img vs VGG16 ~15.5), so the
# int8 MXU win needs the restorer quantized too. Both restorers are plain
# conv graphs: SimpleUNet (ref:07:75-120) has no normalization at all;
# ResUNet (ref:14:96-186) pairs every conv with a BatchNorm, folded here
# from the running statistics (inference form).
# ---------------------------------------------------------------------------


def _q_from(kernel, bias, axes=(0, 1, 2)):
    q, s = absmax_quantize(kernel, axes=axes)
    return {"q": q, "scale": s, "bias": jnp.asarray(bias, jnp.float32)}


def _fold_conv_bn(conv, bn, stats):
    """Inference-form BatchNorm folded into the preceding conv."""
    g = bn["scale"] / jnp.sqrt(stats["var"] + 1e-5)
    return (conv["kernel"] * g[None, None, None, :],
            (conv["bias"] - stats["mean"]) * g + bn["bias"])


def _qconv_t(h, layer):
    """int8 ConvTranspose(k=2, s=2, VALID) — flax semantics."""
    xq, sx = _quantize_act(h)
    y = lax.conv_transpose(
        xq, layer["q"], (2, 2), "VALID",
        dimension_numbers=_CONV_DIMS, preferred_element_type=jnp.int32)
    return _act_store(y.astype(jnp.float32) * (sx * layer["scale"])
                      + layer["bias"])


def _maxpool2(h):
    return lax.reduce_window(h, -jnp.inf, lax.max, (1, 2, 2, 1),
                             (1, 2, 2, 1), "VALID")


def quantize_simple_unet(model, variables) -> Dict[str, Any]:
    """int8 tree for a trained SimpleUNet (``tsr_tpu.models.unet``)."""
    p = variables["params"]
    n = len(model.widths)

    def dc(name):
        return {"conv1": _q_from(**p[name]["conv1"]),
                "conv2": _q_from(**p[name]["conv2"])}

    return {
        "encs": [dc(f"enc{i + 1}") for i in range(n)],
        "bottleneck": dc("bottleneck"),
        "decs": [dc(f"dec{i + 1}") for i in range(n)],
        "ups": [_q_from(**p[f"up{i + 1}"]) for i in range(n)],
        "final": _q_from(**p["final"]),
    }


def make_int8_unet_apply(model):
    """int8 forward matching ``SimpleUNet.__call__`` (inference)."""
    n = len(model.widths)

    def dc(h, layer):
        h = _qconv(h, layer["conv1"])
        return _qconv(h, layer["conv2"])

    def apply(qvars, x):
        h = x.astype(jnp.float32)
        if model.input_minmax:  # mirror SimpleUNet's per-image stretch
            ax = tuple(range(1, h.ndim))
            lo = jnp.min(h, axis=ax, keepdims=True)
            hi = jnp.max(h, axis=ax, keepdims=True)
            h = (h - lo) / jnp.maximum(hi - lo, 1e-6)
        skips = []
        for i in range(n):
            h = dc(h, qvars["encs"][i])
            skips.append(h)
            h = _maxpool2(h)
        h = dc(h, qvars["bottleneck"])
        for i in reversed(range(n)):
            h = _qconv_t(h, qvars["ups"][i])
            h = jnp.concatenate([h, skips[i]], axis=-1)  # decoder first
            h = dc(h, qvars["decs"][i])
        return _qconv(h, qvars["final"], relu=False)

    return apply


def quantize_resunet(model, variables) -> Dict[str, Any]:
    """int8 tree for a trained ResUNet — BatchNorms folded from
    ``batch_stats`` (inference form) into their convs."""
    p, st = variables["params"], variables["batch_stats"]

    def block(name):
        b, s = p[name], st[name]
        out = {
            "conv1": _q_from(*_fold_conv_bn(b["conv1"], b["bn1"], s["bn1"])),
            "conv2": _q_from(*_fold_conv_bn(b["conv2"], b["bn2"], s["bn2"])),
            "alpha": jnp.asarray(b["prelu"]["alpha"], jnp.float32),
        }
        if "shortcut_conv" in b:
            out["shortcut"] = _q_from(*_fold_conv_bn(
                b["shortcut_conv"], b["shortcut_bn"], s["shortcut_bn"]))
        return out

    n = len(model.widths)
    return {
        "stem": _q_from(**p["stem_conv"]),
        "stem_alpha": jnp.asarray(p["stem_prelu"]["alpha"], jnp.float32),
        "encs": [block(f"res{i + 1}") for i in range(n)],
        "bottlenecks": [block(f"bottleneck{i + 1}") for i in range(3)],
        "ups": [_q_from(**p[f"up{i + 1}"]) for i in range(n)],
        "decs": [block(f"dec{i + 1}") for i in range(n)],
        "final": _q_from(**p["final"]),
    }


def make_int8_resunet_apply(model):
    """int8 forward matching ``ResUNet.__call__`` (inference)."""
    n = len(model.widths)

    def prelu(h, alpha):
        # alpha is stored f32; cast to the activation dtype or the where
        # PROMOTES every block output back to f32, resurrecting the
        # 6.12 GB temps _act_store exists to kill (int8_aot.jsonl)
        return jnp.where(h >= 0, h, alpha.astype(h.dtype) * h)

    def block(h, layer):
        y = _qconv(h, layer["conv1"], relu=False)
        y = prelu(y, layer["alpha"])
        y = _qconv(y, layer["conv2"], relu=False)
        s = _qconv(h, layer["shortcut"], relu=False) \
            if "shortcut" in layer else h
        return jax.nn.relu(y + s)

    def apply(qvars, x, train: bool = False):  # noqa: ARG001 (parity)
        del train  # inference-only
        h = x.astype(jnp.float32)
        h = _qconv(h, qvars["stem"], relu=False)
        h = prelu(h, qvars["stem_alpha"])
        skips = []
        for i in range(n):
            h = block(h, qvars["encs"][i])
            skips.append(h)
            h = _maxpool2(h)
        for i in range(3):
            h = block(h, qvars["bottlenecks"][i])
        for i in reversed(range(n)):
            h = _qconv_t(h, qvars["ups"][i])
            h = jnp.concatenate([h, skips[i]], axis=-1)
            h = block(h, qvars["decs"][i])
        return _qconv(h, qvars["final"], relu=False)

    return apply


def quantized_restorer(model, variables):
    """(restorer_apply, qvars) for eval harnesses — dispatch by type."""
    from tsr_tpu.models.unet import SimpleUNet

    if isinstance(model, SimpleUNet):
        return make_int8_unet_apply(model), quantize_simple_unet(
            model, variables)
    return make_int8_resunet_apply(model), quantize_resunet(
        model, variables)

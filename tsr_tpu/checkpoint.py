"""Checkpointing: orbax-native save/load + torch ``.pth`` interop.

The reference persists flat ``torch.save(state_dict)`` files at the repo
root (ref:05:117, 07:177-180, 14:265-267) and every consumer re-declares the
architecture and calls ``load_state_dict`` (ref:08:68-69, 17:59-63). Here:

- :func:`save_train_state` / :func:`restore_train_state`: orbax checkpoints
  carrying params, batch_stats, optimizer state and step — giving true
  resume (the reference saves no optimizer state, SURVEY.md §5).
- :func:`simple_unet_from_pth` / :func:`resunet_from_pth` /
  :func:`vgg16_from_pth`: load reference-format ``.pth`` state dicts into
  the Flax models (layout NCHW->NHWC, FC transposition, BN running stats ->
  batch_stats), enabling parity testing and checkpoint migration.
- ``*_to_state_dict``: the reverse export, so models trained here can be
  consumed by reference-style torch code.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping

import jax
import numpy as np
from flax.core import freeze, unfreeze

# --------------------------------------------------------------------------
# Orbax-native checkpoints
# --------------------------------------------------------------------------


def save_train_state(path: str, state: Mapping[str, Any]) -> None:
    """Save a pytree (params / batch_stats / opt_state / step) with orbax."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, dict(state), force=True)
    ckptr.wait_until_finished()


def restore_train_state(path: str, template: Mapping[str, Any]):
    """Restore a pytree saved by :func:`save_train_state`.

    ``template`` is a matching pytree of arrays (e.g. a freshly-initialized
    state) providing shapes/dtypes.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(
        path, target=jax.tree.map(np.asarray, dict(template))
    )


# --------------------------------------------------------------------------
# torch .pth interop
# --------------------------------------------------------------------------


def load_pth(path: str) -> Dict[str, np.ndarray]:
    """Load a torch state dict into plain numpy arrays."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def save_pth(path: str, sd: Mapping[str, np.ndarray]) -> None:
    import torch

    # ascontiguousarray: converter outputs can carry negative strides
    # (ConvTranspose kernel flips), which torch.from_numpy rejects
    torch.save(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in sd.items()},
        path)


def _conv_w(t):
    """torch Conv2d weight [out,in,kh,kw] -> flax [kh,kw,in,out]."""
    return np.transpose(t, (2, 3, 1, 0))


def _convT_w(t):
    """torch ConvTranspose2d weight [in,out,kh,kw] -> flax ConvTranspose
    kernel [kh,kw,in,out].

    flax ConvTranspose (transpose_kernel=False) spatially *mirrors* the
    kernel relative to torch's ConvTranspose2d, so flip kh/kw. For the
    reference's k=2,s=2 non-overlapping upsampling this is verified by the
    torch-parity tests."""
    return np.transpose(t, (2, 3, 0, 1))[::-1, ::-1]


def _dense_w(t):
    """torch Linear weight [out,in] -> flax Dense kernel [in,out]."""
    return np.transpose(t)


def _bn(sd, prefix):
    return (
        {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]},
        {"mean": sd[f"{prefix}.running_mean"],
         "var": sd[f"{prefix}.running_var"]},
    )


def _double_conv(sd, prefix):
    """torch nn.Sequential(conv,relu,conv,relu) -> DoubleConv params."""
    return {
        "conv1": {"kernel": _conv_w(sd[f"{prefix}.0.weight"]),
                  "bias": sd[f"{prefix}.0.bias"]},
        "conv2": {"kernel": _conv_w(sd[f"{prefix}.2.weight"]),
                  "bias": sd[f"{prefix}.2.bias"]},
    }


def simple_unet_from_pth(sd: Mapping[str, np.ndarray]):
    """Reference SimpleUNet state dict (ref:07:75-120) -> flax variables."""
    params = {
        "enc1": _double_conv(sd, "enc1"),
        "enc2": _double_conv(sd, "enc2"),
        "bottleneck": _double_conv(sd, "bottleneck"),
        "up2": {"kernel": _convT_w(sd["up2.weight"]), "bias": sd["up2.bias"]},
        "dec2": _double_conv(sd, "dec2"),
        "up1": {"kernel": _convT_w(sd["up1.weight"]), "bias": sd["up1.bias"]},
        "dec1": _double_conv(sd, "dec1"),
        "final": {"kernel": _conv_w(sd["final.weight"]),
                  "bias": sd["final.bias"]},
    }
    return freeze({"params": params})


def simple_unet_to_state_dict(variables) -> Dict[str, np.ndarray]:
    p = unfreeze(variables)["params"]
    sd = {}

    def dc(name):
        sd[f"{name}.0.weight"] = np.transpose(
            np.asarray(p[name]["conv1"]["kernel"]), (3, 2, 0, 1))
        sd[f"{name}.0.bias"] = np.asarray(p[name]["conv1"]["bias"])
        sd[f"{name}.2.weight"] = np.transpose(
            np.asarray(p[name]["conv2"]["kernel"]), (3, 2, 0, 1))
        sd[f"{name}.2.bias"] = np.asarray(p[name]["conv2"]["bias"])

    dc("enc1")
    dc("enc2")
    dc("bottleneck")
    dc("dec2")
    dc("dec1")
    for up in ("up2", "up1"):
        k = np.asarray(p[up]["kernel"])[::-1, ::-1]
        sd[f"{up}.weight"] = np.transpose(k, (2, 3, 0, 1))
        sd[f"{up}.bias"] = np.asarray(p[up]["bias"])
    sd["final.weight"] = np.transpose(
        np.asarray(p["final"]["kernel"]), (3, 2, 0, 1))
    sd["final.bias"] = np.asarray(p["final"]["bias"])
    return sd


def _res_block(sd, prefix):
    """torch ResidualBlock (ref:14:96-115) -> (params, batch_stats)."""
    bn1_p, bn1_s = _bn(sd, f"{prefix}.conv_block.1")
    bn2_p, bn2_s = _bn(sd, f"{prefix}.conv_block.4")
    params = {
        "conv1": {"kernel": _conv_w(sd[f"{prefix}.conv_block.0.weight"]),
                  "bias": sd[f"{prefix}.conv_block.0.bias"]},
        "bn1": bn1_p,
        "prelu": {"alpha": np.asarray(
            sd[f"{prefix}.conv_block.2.weight"]).reshape(())},
        "conv2": {"kernel": _conv_w(sd[f"{prefix}.conv_block.3.weight"]),
                  "bias": sd[f"{prefix}.conv_block.3.bias"]},
        "bn2": bn2_p,
    }
    stats = {"bn1": bn1_s, "bn2": bn2_s}
    if f"{prefix}.shortcut.0.weight" in sd:
        sbn_p, sbn_s = _bn(sd, f"{prefix}.shortcut.1")
        params["shortcut_conv"] = {
            "kernel": _conv_w(sd[f"{prefix}.shortcut.0.weight"]),
            "bias": sd[f"{prefix}.shortcut.0.bias"]}
        params["shortcut_bn"] = sbn_p
        stats["shortcut_bn"] = sbn_s
    return params, stats


def resunet_from_pth(sd: Mapping[str, np.ndarray]):
    """Reference ResUNet state dict (ref:14:117-186) -> flax variables."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["stem_conv"] = {"kernel": _conv_w(sd["enc1.0.weight"]),
                           "bias": sd["enc1.0.bias"]}
    params["stem_prelu"] = {
        "alpha": np.asarray(sd["enc1.1.weight"]).reshape(())}

    name_map = {
        "res1": "res1", "res2": "res2", "res3": "res3",
        "bottleneck.0": "bottleneck1", "bottleneck.1": "bottleneck2",
        "bottleneck.2": "bottleneck3",
        "dec3": "dec3", "dec2": "dec2", "dec1": "dec1",
    }
    for tname, fname in name_map.items():
        p, s = _res_block(sd, tname)
        params[fname] = p
        stats[fname] = s

    for up in ("up3", "up2", "up1"):
        params[up] = {"kernel": _convT_w(sd[f"{up}.weight"]),
                      "bias": sd[f"{up}.bias"]}
    params["final"] = {"kernel": _conv_w(sd["final.weight"]),
                       "bias": sd["final.bias"]}
    return freeze({"params": params, "batch_stats": stats})


def vgg16_from_pth(sd: Mapping[str, np.ndarray], num_classes: int = 43,
                   head_seed: int = 0):
    """torchvision-format VGG16 state dict -> flax variables.

    Works both for the fine-tuned judge (classifier.6 -> 43, ref:05:47-56)
    and a stock ImageNet checkpoint: when the checkpoint's final-FC width
    differs from ``num_classes`` (e.g. the 1000-class ImageNet head), the
    head is re-initialized fresh at ``num_classes`` — the reference's
    ``classifier[6] = Linear(4096, num_classes)`` swap (ref:05:54), using
    torch's Linear default init (uniform ±1/sqrt(fan_in)). The first FC
    layer needs no channel permutation because the Flax model flattens in
    torch's CHW order."""
    params: Dict[str, Any] = {}
    for k, v in sd.items():
        if k.startswith("features.") and k.endswith(".weight"):
            idx = k.split(".")[1]
            params[f"features_{idx}"] = {
                "kernel": _conv_w(v),
                "bias": sd[f"features.{idx}.bias"],
            }
    for tidx, fname in ((0, "classifier_0"), (3, "classifier_3"),
                        (6, "classifier_6")):
        params[fname] = {"kernel": _dense_w(sd[f"classifier.{tidx}.weight"]),
                         "bias": sd[f"classifier.{tidx}.bias"]}
    head = params["classifier_6"]
    if head["kernel"].shape[1] != num_classes:
        fan_in = head["kernel"].shape[0]
        bound = 1.0 / np.sqrt(fan_in)
        rng = np.random.default_rng(head_seed)
        params["classifier_6"] = {
            "kernel": rng.uniform(-bound, bound,
                                  (fan_in, num_classes)).astype(np.float32),
            "bias": rng.uniform(-bound, bound,
                                num_classes).astype(np.float32),
        }
    return freeze({"params": params})


def vgg16_to_state_dict(variables) -> Dict[str, np.ndarray]:
    p = unfreeze(variables)["params"]
    sd: Dict[str, np.ndarray] = {}
    for name, val in p.items():
        if name.startswith("features_"):
            idx = name.split("_")[1]
            sd[f"features.{idx}.weight"] = np.transpose(
                np.asarray(val["kernel"]), (3, 2, 0, 1))
            sd[f"features.{idx}.bias"] = np.asarray(val["bias"])
    for tidx, fname in ((0, "classifier_0"), (3, "classifier_3"),
                        (6, "classifier_6")):
        sd[f"classifier.{tidx}.weight"] = np.transpose(
            np.asarray(p[fname]["kernel"]))
        sd[f"classifier.{tidx}.bias"] = np.asarray(p[fname]["bias"])
    return sd

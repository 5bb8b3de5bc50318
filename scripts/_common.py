"""Shared plumbing for the numbered scripts.

Each script mirrors one reference script's behavior and default paths
(SURVEY.md §2) but is a thin wrapper over the tsr_tpu library, with
argparse instead of edit-the-constants (ref:07:13-15). ``--synthetic``
builds a synthetic sign tree first so every script runs in air-gapped
environments.
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Honor an explicit JAX_PLATFORMS=cpu request despite this image's
# sitecustomize (which force-registers the axon TPU backend), and enable
# the persistent compilation cache (first TPU compiles of the big models
# take minutes; repeat script invocations reuse them).
from tsr_tpu.utils import profiling as _profiling

_profiling.honor_cpu_request()
_profiling.enable_compilation_cache()

DATA_ROOT = "./data"
CLEAN_DIR = "./data/gtsrb/GTSRB/Training"
PROCESSED = "./data/processed"
RESTORED = "./data/restored"

CKPT_DIR = "./checkpoints"


def base_parser(desc: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=desc)
    p.add_argument("--clean-dir", default=os.environ.get(
        "TSR_GTSRB_DIR", CLEAN_DIR))
    p.add_argument("--synthetic", action="store_true",
                   help="generate a synthetic sign tree at --clean-dir "
                        "if it does not exist")
    p.add_argument("--synthetic-classes", type=int, default=10)
    p.add_argument("--synthetic-per-class", type=int, default=40)
    p.add_argument("--image-size", type=int, default=224,
                   help="model input resolution (reference: 224)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ckpt-dir", default=os.environ.get(
        "TSR_CKPT_DIR", CKPT_DIR))
    p.add_argument("--resize-backend", default="cv2",
                   choices=["cv2", "pil"],
                   help="host decode-resize backend; 'pil' gives bit "
                        "parity with the reference's torchvision "
                        "Resize (matters only for >image-size sources; "
                        "see PARITY.md 'Resize parity')")
    p.add_argument("--mesh", default=None, metavar="SPEC",
                   help="device mesh for SPMD sharding, e.g. 'data=8' or "
                        "'data=4,model=2' (data-parallel batches; "
                        "model axis adds tensor parallelism). Default: "
                        "single device")
    return p


def add_resize_flag(p):
    """--resize for the eval harnesses (scripts 06/09/18). Default host =
    the reference's exact input semantics (the accuracy-parity mode);
    'device' uploads native-resolution pixels and resizes on device
    (<=1 LSB vs cv2, PARITY.md) — the serving-throughput mode on a
    bandwidth-limited host<->device link."""
    p.add_argument("--resize", default="host", choices=["host", "device"])
    return p


def add_int8_flag(p):
    """--int8 for the accuracy/serving harnesses (scripts 06/09/18)."""
    p.add_argument("--int8", action="store_true",
                   help="quantize the judge to int8 (per-channel weights, "
                        "dynamic activations) and classify on the MXU's "
                        "int8 path — serving mode; see tsr_tpu/quant.py")
    return p


def maybe_int8_judge(args, judge, judge_vars):
    """(judge_apply, judge_vars) honoring ``--int8``."""
    if getattr(args, "int8", False):
        from tsr_tpu import quant

        return quant.quantized_judge(judge, judge_vars)
    return judge.apply, judge_vars


def maybe_int8_restorer(args, model, variables, unified=False):
    """(restorer_apply, restorer_vars) honoring ``--int8``.

    ``unified=True`` wraps the fp ResUNet with ``train=False`` (the int8
    forward is inference-only already)."""
    if getattr(args, "int8", False):
        from tsr_tpu import quant

        return quant.quantized_restorer(model, variables)
    if unified:
        return (lambda v, x: model.apply(v, x, train=False)), variables
    return model.apply, variables


def mesh_from_args(args):
    """Build the jax.sharding.Mesh requested by --mesh (or None)."""
    spec = getattr(args, "mesh", None)
    if not spec:
        return None
    from tsr_tpu.parallel import mesh as pmesh

    m = pmesh.mesh_from_spec(spec)
    print(f"Mesh: {dict(zip(m.axis_names, m.devices.shape))} over "
          f"{m.devices.size} devices")
    return m


def ensure_clean_tree(args) -> str:
    if getattr(args, "resize_backend", "cv2") != "cv2":
        from tsr_tpu.data import gtsrb

        gtsrb.set_resize_backend(args.resize_backend)
    root = Path(args.clean_dir)
    if args.synthetic and root.exists() and (root / ".synthetic").exists():
        # a previous --synthetic run was interrupted mid-write: the marker
        # is written only after completion params are known, but image
        # counts are the ground truth. Rebuild on mismatch. Trees without
        # the marker (real GTSRB) are never touched.
        import json as _json
        import shutil as _shutil

        meta = _json.loads((root / ".synthetic").read_text())
        n = len(list(root.glob("*/*")))
        if n != meta["num_classes"] * meta["per_class"]:
            print(f"Synthetic tree at {root} incomplete "
                  f"({n}/{meta['num_classes'] * meta['per_class']}); "
                  "rebuilding.")
            _shutil.rmtree(root)
    if not Path(args.clean_dir).exists():
        if args.synthetic:
            from tsr_tpu.data import synthetic

            print(f"Generating synthetic tree at {args.clean_dir} ...")
            # Shipped native-size spread (synthetic.TREE_SIZE/TREE_JITTER)
            # + the CALIB photometrics = the calibrated configuration whose
            # judge vulnerability profile matches the reference's ordering
            # (benchmarks/calibrate_standin.py).
            synthetic.write_image_tree(
                args.clean_dir, num_classes=args.synthetic_classes,
                per_class=args.synthetic_per_class,
                size=synthetic.TREE_SIZE, seed=args.seed,
                size_jitter=synthetic.TREE_JITTER)
        else:
            raise SystemExit(
                f"{args.clean_dir} not found. Run scripts/01_download_data.py"
                " or pass --synthetic.")
    return args.clean_dir


def restorer_provenance(distorted_dir: str, identity_frac: float,
                        input_minmax: bool) -> dict:
    """Checkpoint config for a specialized restorer: architecture options
    plus training provenance (identity-anchor fraction and whether the
    distorted tree was reference-exact or strength-jittered, read from the
    tree's ``.distortion`` marker). pipeline/scripts/13 derive the cascade
    variant label (RESULTS.md A/B/B'/C) from these keys."""
    import json as _json

    cfg: dict = {"identity_frac": float(identity_frac)}
    if input_minmax:
        cfg["input_minmax"] = True
    marker = Path(distorted_dir) / ".distortion"
    if marker.exists():
        try:
            kind = _json.loads(marker.read_text()).get("kind", "")
            cfg["severity"] = ("jittered" if kind.endswith("_rand")
                               else "reference")
        except (ValueError, OSError):
            pass
    return cfg


def judge_ckpt_path(args=None) -> str:
    d = getattr(args, "ckpt_dir", None) or os.environ.get(
        "TSR_CKPT_DIR", CKPT_DIR)
    return os.path.join(d, "vgg16_baseline")


def restorer_ckpt_path(task: str, args=None) -> str:
    d = getattr(args, "ckpt_dir", None) or os.environ.get(
        "TSR_CKPT_DIR", CKPT_DIR)
    return os.path.join(d, f"restoration_{task.lower()}")


def unified_ckpt_path(args=None) -> str:
    d = getattr(args, "ckpt_dir", None) or os.environ.get(
        "TSR_CKPT_DIR", CKPT_DIR)
    return os.path.join(d, "restoration_unified_resnet")

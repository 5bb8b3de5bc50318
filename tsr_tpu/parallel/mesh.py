"""Device mesh + sharding layer.

The reference has no parallelism at all (SURVEY.md §2: single device,
DataLoader prefetch only). The TPU-native scaling story is SPMD over a
``jax.sharding.Mesh``:

- **data axis**: batch sharding — the natural parallelism for this workload
  (vision batches, no sequences). Gradients/batch-norm reductions become ICI
  collectives XLA inserts automatically under jit.
- **model axis**: tensor parallelism for the judge's 4096-wide FC layers
  (Megatron-style column→row split) and the widest conv blocks — mostly
  useful to keep VGG activations + optimizer state within HBM at very large
  batch; conv layers stay replicated where TP would force per-layer
  all-gathers.

``shard_variables`` applies logical sharding rules by parameter-path
pattern; everything unmatched is replicated.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = -1,
    model: int = 1,
    devices: Optional[Sequence] = None,
    axis_names: Tuple[str, str] = ("data", "model"),
) -> Mesh:
    """Create a 2-D (data, model) mesh. ``data=-1`` uses all remaining
    devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model == n, (data, model, n)
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names)


def parse_mesh_spec(spec: Optional[str]) -> Optional[dict]:
    """Parse a ``--mesh`` CLI spec: ``"data=8"``, ``"data=4,model=2"``, or
    a bare int (``"8"`` == ``"data=8"``). Returns None for None/empty."""
    if not spec:
        return None
    out = {"data": 1, "model": 1}
    if spec.isdigit():
        out["data"] = int(spec)
        return out
    for part in spec.split(","):
        k, _, v = part.partition("=")
        k = k.strip()
        if k not in out or not v.strip().lstrip("-").isdigit():
            raise ValueError(
                f"bad mesh spec {spec!r}; want e.g. 'data=8' or "
                "'data=4,model=2'")
        out[k] = int(v)
    return out


def mesh_from_spec(spec: Optional[str]) -> Optional[Mesh]:
    axes = parse_mesh_spec(spec)
    if axes is None:
        return None
    return make_mesh(data=axes["data"], model=axes["model"])


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Parameter-path regex -> PartitionSpec. Megatron split for the giant VGG
# classifier: classifier_0 column-parallel, classifier_3 row-parallel.
VGG_TP_RULES = (
    (r".*classifier_0.*kernel", P(None, "model")),
    (r".*classifier_0.*bias", P("model")),
    (r".*classifier_3.*kernel", P("model", None)),
)

# ResUNet / SimpleUNet: shard the widest conv output channels so optimizer
# state splits across the model axis (cheap for 1x1/3x3 convs at 512 ch).
RESTORER_TP_RULES = (
    (r".*bottleneck\d?.*conv\d.*kernel", P(None, None, None, "model")),
    (r".*bottleneck.*conv\d.*bias", P("model")),
)


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                    for k in path)


def shard_variables(variables, mesh: Mesh, rules: Sequence = ()):
    """Place a variable pytree on ``mesh``: params matching a rule get its
    PartitionSpec, everything else is replicated."""

    def place(path, x):
        p = _path_str(path)
        spec = P()
        for pat, s in rules:
            if re.fullmatch(pat, p):
                spec = s
                break
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, variables)


def shard_batch(batch, mesh: Mesh):
    """Place (leading-dim shard) one array or a tuple of arrays."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def shard_batch_or_replicate(batch, mesh: Mesh):
    """Shard the batch over the data axis when its leading dim divides
    evenly; replicate otherwise (the uneven final validation/eval batch —
    computing it redundantly on every device keeps one jit signature per
    shape and is exact)."""
    data = mesh.shape[mesh.axis_names[0]]
    lead = {x.shape[0] for x in jax.tree.leaves(batch)}
    if len(lead) == 1 and next(iter(lead)) % data == 0:
        return shard_batch(batch, mesh)
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), batch)


def shard_state(state, mesh: Mesh, tp_rules: Sequence = ()):
    """Place a TrainState on ``mesh``: params/opt_state get ``tp_rules``
    (optimizer moments mirror the param tree paths, so the same patterns
    hit them), batch_stats are replicated, everything unmatched is
    replicated. With ``tp_rules=()`` this is pure data parallelism."""
    kw = dict(
        params=shard_variables(state.params, mesh, tp_rules),
        opt_state=shard_variables(state.opt_state, mesh, tp_rules),
    )
    if getattr(state, "batch_stats", None) is not None:
        kw["batch_stats"] = shard_variables(state.batch_stats, mesh)
    return state.replace(**kw)

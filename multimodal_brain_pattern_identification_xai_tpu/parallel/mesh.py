"""Device-mesh construction and sharding rules.

Axes: ``data`` (batch/DP), ``model`` (tensor-parallel dense shards),
``seq`` (time-axis sequence parallelism for long EEG).  On a pod slice the
mesh should be laid out so ``model``/``seq`` ride the fastest ICI links;
``jax.make_mesh`` handles device ordering.
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import config as C


def make_mesh(cfg: Optional[C.MeshConfig] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model, seq) mesh.  ``data = -1`` absorbs all devices
    not claimed by the other axes."""
    cfg = cfg or C.MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    model, seq = max(cfg.model, 1), max(cfg.seq, 1)
    data = cfg.data if cfg.data > 0 else n // (model * seq)
    if data * model * seq != n:
        raise ValueError(
            f"mesh {data}x{model}x{seq} != {n} devices")
    arr = np.asarray(devices).reshape(data, model, seq)
    return Mesh(arr, ("data", "model", "seq"))


def batch_sharding(mesh: Mesh, ndim: int = 1,
                   seq_axis: Optional[int] = None) -> NamedSharding:
    """Shard the leading (batch) axis over ``data``; optionally shard
    ``seq_axis`` over ``seq`` (long-EEG inputs)."""
    spec = [None] * ndim
    spec[0] = "data"
    if seq_axis is not None:
        spec[seq_axis] = "seq"
    return NamedSharding(mesh, P(*spec))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Parameter path-patterns sharded over the ``model`` axis (tensor
# parallelism): large dense kernels split on their output features —
# XLA inserts the all-gather/psum pair around them.
_TP_PATTERNS = (
    r".*fc1.*kernel", r".*dense1.*kernel", r".*classifier.*kernel",
    r".*output_0.*kernel", r".*linear1.*kernel", r".*mlp_0.*kernel",
)


def param_shardings(mesh: Mesh, params: Any,
                    patterns: Sequence[str] = _TP_PATTERNS) -> Any:
    """Replicated-by-default param shardings with TP on matched dense
    kernels (out-feature axis over ``model``)."""
    regexes = [re.compile(p) for p in patterns]

    def assign(path, leaf):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if leaf.ndim >= 2 and any(r.fullmatch(name) for r in regexes):
            spec = [None] * leaf.ndim
            spec[-1] = "model"
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(assign, params)

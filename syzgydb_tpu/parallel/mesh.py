"""Device mesh and sharding specs — the distributed layer.

The reference is single-process with no communication backend (SURVEY.md
§2.2); scaling here is TPU-native instead: the vector axis N is sharded over
a `jax.sharding.Mesh` ('data' axis — the vector-DB analog of data
parallelism) and optionally the dimension axis D over a 'feature' axis
(tensor-parallel analog for very large D).  All communication is XLA
collectives over ICI (all_gather of per-device top-k, psum of feature-partial
dots) — no hand-written transport.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
FEATURE_AXIS = "feature"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = 0      # 0 = all devices on the data axis
    feature: int = 1   # feature-axis (D) sharding degree


def make_mesh(config: MeshConfig = MeshConfig(),
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    feature = max(1, config.feature)
    data = config.data if config.data > 0 else n // feature
    # data >= 1 guard: feature > n used to compute data = n//feature = 0,
    # which slipped past the product check and built an empty mesh that
    # failed far downstream (ZeroDivisionError in pad_rows — review
    # finding r5)
    if data < 1 or data * feature > n:
        raise ValueError(
            f"mesh {data}x{feature} needs {max(data, 1) * feature} devices,"
            f" have {n}")
    dev_array = np.array(devices[: data * feature]).reshape(data, feature)
    return Mesh(dev_array, (DATA_AXIS, FEATURE_AXIS))


def row_sharding(mesh: Mesh) -> NamedSharding:
    """(N, D) arrays: N over 'data', D over 'feature'."""
    return NamedSharding(mesh, P(DATA_AXIS, FEATURE_AXIS))


def row_only_sharding(mesh: Mesh) -> NamedSharding:
    """(N,) arrays: N over 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_rows(n: int, mesh: Mesh, block: int = 8) -> int:
    """Round n up so each data shard holds a whole multiple of `block` rows."""
    shards = mesh.shape[DATA_AXIS]
    per = -(-n // shards)
    per = -(-per // block) * block
    return per * shards


def pad_cols(d: int, mesh: Mesh) -> int:
    shards = mesh.shape[FEATURE_AXIS]
    return -(-d // shards) * shards

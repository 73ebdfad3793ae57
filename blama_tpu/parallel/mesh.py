"""Device mesh construction.

The reference's device story is a boolean gpu/cpu flag
(/root/reference/inference/code/llama/Model.cpp:12-31). The TPU-native
replacement is a named jax mesh with axes:

  dp — data/replica parallel (batch dim of independent sequences)
  tp — tensor parallel (attention heads / ffn width / vocab shards over ICI)

Expert parallel (MoE) reuses the tp axis for expert sharding; pipeline
parallel of the layer axis is a planned extension of the same mesh.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = 1, tp: int | None = None, devices=None) -> Mesh:
    """Build a (dp, tp) mesh. tp=None uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if tp is None:
        if n % dp != 0:
            raise ValueError(f"{n} devices not divisible by dp={dp}")
        tp = n // dp
    if dp * tp > n:
        raise ValueError(f"mesh {dp}x{tp} needs {dp*tp} devices, have {n}")
    arr = np.array(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def single_device_mesh() -> Mesh:
    return make_mesh(1, 1)


def shard(mesh: Mesh, spec: P) -> NamedSharding:
    return NamedSharding(mesh, spec)

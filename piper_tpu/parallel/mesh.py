"""Device mesh construction and multi-host initialization.

Axes:
  data  — utterance/batch data parallelism (DP)
  model — model-parallel axis used for time-axis vocoder sharding
          (this model's "sequence parallelism", SURVEY.md §5) and for
          sharding the largest activations when they exceed chip HBM.

Collectives ride ICI within a slice; `jax.distributed.initialize` + DCN
handle multi-host (jax assigns DCN automatically for inter-host mesh
dims when device order groups hosts).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up (no-op on a single host)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    *,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """('data', 'model') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def local_mesh() -> Mesh:
    """All-data-parallel mesh over local devices."""
    return make_mesh(model=1)

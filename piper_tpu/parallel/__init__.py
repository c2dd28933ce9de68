"""Parallelism: device meshes, shardings, multi-host init.

The reference has no parallelism layer of its own (SURVEY.md §2d —
Lightning DDP only, batch=1 inference). This package is new TPU-first
design: data-parallel bucketed batches via NamedSharding, sharded GAN
training, and time-axis vocoder sharding with halo exchange.
"""

from .mesh import make_mesh, local_mesh  # noqa: F401
from .sharding import (  # noqa: F401
    batch_sharding,
    replicate,
    shard_batch,
    make_sharded_train_step,
)

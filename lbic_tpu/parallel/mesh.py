"""Device mesh + sharding helpers.

The reference is strictly single-GPU (no torch.distributed anywhere —
SURVEY.md §2.15); parallelism here is architected fresh, TPU-first:

  * axis "data": data parallelism — batch sharded, params replicated,
    gradient psum riding ICI (inserted automatically by XLA's SPMD
    partitioner under jit-with-shardings).
  * axis "row": spatial sharding of the block-row dimension of the folded
    image — stride-1 SAME convs shard cleanly; XLA inserts the halo
    exchanges for the masked-conv windows.

1-chip and N-chip run the same jitted program; only the mesh changes.
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = 0, row: int = 1, devices=None) -> Mesh:
    """Mesh with axes (data, row). data=0 means 'all remaining devices'."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == 0:
        assert n % row == 0, (n, row)
        data = n // row
    assert data * row <= n, f"mesh {data}x{row} > {n} devices"
    arr = np.asarray(devices[: data * row]).reshape(data, row)
    return Mesh(arr, ("data", "row"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """(N, Hb, Wb, C) batches: batch over 'data', block-rows over 'row'."""
    return NamedSharding(mesh, P("data", "row", None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), batch)

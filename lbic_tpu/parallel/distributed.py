"""Multi-host runtime: jax.distributed bootstrap, process roles, data
sharding, and host-side gathers.

The reference has no distributed code at all (SURVEY.md §2.15); this is
the TPU-pod story that BASELINE.md's ">=10x at N>=2 hosts" target names.
Design: every process runs the same SPMD program over a GLOBAL mesh;
per-host work (data loading, PNG writes, checkpoints, logging) is
partitioned by process index. Collectives ride ICI/DCN via XLA; the only
host-side cross-process traffic is the tiny metric/bitstream gathers
(jax.experimental.multihost_utils) and the coordination service.

Bootstrap env (set by the launcher on each host):
    LBIC_COORDINATOR   host:port of process 0
    LBIC_NUM_PROCESSES total process count
    LBIC_PROCESS_ID    this process's rank
On TPU pods where JAX can auto-detect (GKE/Borg metadata),
initialize_from_env() falls back to jax.distributed.initialize() with no
arguments when LBIC_AUTO_DISTRIBUTED=1.
"""

import logging
import os
from typing import Sequence

import jax
import numpy as np

_initialized = False


def initialize_from_env() -> bool:
    """Initialize jax.distributed from LBIC_* env vars. Idempotent;
    returns True when running multi-process."""
    global _initialized
    if _initialized:
        return jax.process_count() > 1
    coord = os.environ.get("LBIC_COORDINATOR")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["LBIC_NUM_PROCESSES"]),
            process_id=int(os.environ["LBIC_PROCESS_ID"]),
        )
        _initialized = True
        return True
    if os.environ.get("LBIC_AUTO_DISTRIBUTED") == "1":
        jax.distributed.initialize()
        _initialized = True
        return jax.process_count() > 1
    return False


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_main() -> bool:
    """Process 0 owns checkpoints, results files, and INFO logging."""
    return jax.process_index() == 0


def quiet_non_main_logging(level=logging.WARNING) -> None:
    """Demote logging on non-main processes (process-0-only logs)."""
    if not is_main():
        logging.getLogger().setLevel(level)


def shard_indices(n: int) -> np.ndarray:
    """This process's strided share of range(n) — per-process data/work
    sharding for dataset iteration, recon-set regeneration, and eval."""
    return np.arange(process_index(), n, process_count())


def shard_files(files: Sequence) -> list:
    return [files[i] for i in shard_indices(len(files))]


def barrier(tag: str = "barrier") -> None:
    """Block until every process arrives (e.g. after process-0 writes a
    checkpoint that others will read from the shared FS)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


def global_batch(mesh, batch, spec=None):
    """Per-process host-local batch -> one global jax.Array sharded over
    the mesh. Each process contributes its local rows along 'data';
    jointly they form the global batch (the multi-host analog of
    parallel.shard_batch)."""
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    if spec is None:
        spec = P(("data",), "row", None, None)
    return jax.tree.map(
        lambda a: multihost_utils.host_local_array_to_global_array(
            np.asarray(a), mesh, spec), batch)


def gather_scalars(values: Sequence[float]) -> np.ndarray:
    """All-gather a per-process list of scalars -> (num_processes, k)
    array on every process (metric gather for eval/validation; the
    host-side analog of the reference's single-process accumulation,
    agents/blkbsdimgcomp_agent.py:633-641)."""
    arr = np.asarray(list(values), np.float64)
    if jax.process_count() == 1:
        return arr[None]
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(arr))


def gather_object_lists(items: list) -> list:
    """All-gather small per-process python objects (e.g. per-image result
    dicts or bitstream lengths); returns the concatenated list in process
    order. Uses length-padded uint8 pickle buffers over process_allgather
    — fine for KB-scale metadata, not bulk tensors."""
    if jax.process_count() == 1:
        return list(items)
    import pickle

    from jax.experimental import multihost_utils

    blob = np.frombuffer(pickle.dumps(list(items)), np.uint8)
    n = np.asarray([blob.size])
    sizes = np.asarray(multihost_utils.process_allgather(n)).ravel()
    buf = np.zeros(int(sizes.max()), np.uint8)
    buf[: blob.size] = blob
    bufs = np.asarray(multihost_utils.process_allgather(buf))
    out = []
    for i, size in enumerate(sizes):
        out.extend(pickle.loads(bufs[i, :int(size)].tobytes()))
    return out

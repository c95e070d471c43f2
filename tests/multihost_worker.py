"""Worker for the 2-process multi-host CPU test (launched by
tests/test_multihost.py via subprocess, one per rank).

Exercises the real multi-host path end-to-end on the Gloo-backed CPU
backend: jax.distributed bootstrap from LBIC_* env, a global (data,)
mesh spanning both processes, per-process data-sharded training steps
with the REAL train step (gradient psum inserted by XLA), a metric
gather, and main-only checkpointing with barriers.

Prints one JSON line with digests the parent asserts on.
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=2")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    from lbic_tpu.parallel import distributed as dist

    assert dist.initialize_from_env(), "expected multi-process env"
    rank = dist.process_index()
    world = dist.process_count()
    assert world == 2

    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P

    from lbic_tpu.config import LbicConfig
    from lbic_tpu.data.dataset import BatchLoader, ImageDatasetACL
    from lbic_tpu.models import lbic as M
    from lbic_tpu.ops.blockfold import block_fold
    from lbic_tpu.train import init_state, make_train_step

    # global mesh over all (2 procs x 2 local) = 4 devices on axis 'data'
    devs = np.asarray(jax.devices()).reshape(len(jax.devices()), 1)
    mesh = Mesh(devs, ("data", "row"))

    cfg = LbicConfig(net_version="v9", block_size=4, KS=(3, 1, 1, 1),
                     N=16, M=8, lambda_=100.0)
    md = M.make_model_def(cfg)
    state = init_state(md, jax.random.PRNGKey(0), 1e-3)
    step = make_train_step(md, cfg.lambda_, donate=False)

    # per-process data shard: identical permutation, disjoint strides
    ds = ImageDatasetACL([os.environ["LBIC_TEST_DATA"]], patch_size=8,
                         augment=True)
    loader = BatchLoader(ds, batch_size=2, shuffle=True, seed=3,
                         shard=(rank, world))
    n_batches = len(loader)
    batch_digest = []
    losses = []
    for x, z in loader:
        xb = np.asarray(block_fold(jnp.asarray(x), cfg.block_size))
        zb = np.asarray(block_fold(jnp.asarray(z), cfg.block_size))
        batch_digest.append(float(np.sum(xb)))
        # local (2, ...) rows -> global (4, ...) batch over the mesh
        gx, gz = dist.global_batch(mesh, (xb, zb))
        state, m = step(state, gx, gz, jax.random.PRNGKey(7))
        losses.append(float(m["loss"]))

    # params must be identical across processes (gradient psum)
    psum = float(sum(float(jnp.sum(jnp.abs(l)))
                     for l in jax.tree.leaves(state.params)))

    # metric gather: every process sees both processes' values
    gathered = dist.gather_scalars([float(rank + 1)])
    obj = dist.gather_object_lists([{"rank": rank, "n": n_batches}])

    # main-only checkpoint + barrier: both processes then read it
    ckpt_dir = os.environ["LBIC_TEST_CKPT"]
    path = os.path.join(ckpt_dir, "mh_ckpt.npz")
    if dist.is_main():
        np.savez(path, psum=psum)
    dist.barrier("test_ckpt")
    seen = float(np.load(path)["psum"])

    print(json.dumps({
        "rank": rank,
        "world": world,
        "n_devices": len(jax.devices()),
        "n_batches": n_batches,
        "batch_digest": batch_digest,
        "losses": losses,
        "params_psum": psum,
        "gathered": gathered.ravel().tolist(),
        "objects": sorted(o["rank"] for o in obj),
        "ckpt_psum": seen,
    }), flush=True)


if __name__ == "__main__":
    main()

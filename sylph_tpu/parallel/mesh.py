"""Mesh construction and sharding helpers.

TPU-native replacement for the reference's NCCL/DDP plumbing
(tools/train_net.py:71-106, tools/setup.py:91-93):

  * ``create_mesh`` — 1-D data mesh over all addressable devices (the
    model is ~32M params; pure data parallelism is the right point in
    the sharding space, as it was for the reference's 64-GPU runs);
  * ``shard_batch`` — place a host batch with its leading axis split
    over the mesh;
  * ``gather_class_codes`` — the class-axis eval parallelism: each
    device generates codes for its slice of the class list, then
    all-gathers the fixed-shape (N, 256)/(N,) arrays (replacing
    ``all_gather_object``, meta_fcos_runner.py:386-391).

Multi-host: ``jax.distributed.initialize()`` before calling
``create_mesh`` makes the same code span pod slices — collectives ride
ICI within a slice and DCN across, chosen by XLA.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(num_devices: Optional[int] = None,
                axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis_name: str = "data"):
    """Place a pytree of host arrays batch-sharded over the mesh.

    Single-host: a plain sharded device_put. Multi-host (after
    jax.distributed.initialize): each process passes its LOCAL slice of
    the global batch and the global array is assembled from
    process-local shards — the SPMD analog of DDP's per-rank loader.

    On a single-device mesh, mesh-committed (NamedSharding) arrays are
    pure overhead: any committed input pushes the whole dispatch onto
    the slow sharded path (~1s/call through the remote tunnel vs ~8 ms
    plain). Sharding a 1-way axis is a no-op anyway, so place plain
    device arrays instead.
    """
    if mesh.size == 1 and jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x)),
                            batch)
    sharding = batch_sharding(mesh, axis_name)

    if jax.process_count() > 1:
        def put(x):
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x))
        return jax.tree.map(put, batch)

    def put(x):
        x = jnp.asarray(x)
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)


def gather_class_codes(codes: Dict[str, jnp.ndarray],
                       axis_name: str = "data") -> Dict[str, jnp.ndarray]:
    """all_gather per-shard class codes along the class axis.

    Call inside shard_map/pjit: each shard holds codes for its local
    classes; the result is the concatenated global bank, identical on
    every shard.
    """
    return {
        k: jax.lax.all_gather(v, axis_name, axis=0, tiled=True)
        for k, v in codes.items()
    }

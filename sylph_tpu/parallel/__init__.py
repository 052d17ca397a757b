"""Device-mesh parallelism.

The reference's only strategy is DDP over NCCL (SURVEY.md §2.2,
train_net.py:71-106). Here the equivalent is a 1-D ``Mesh(("data",))``
with the episode/image batch sharded over it; gradient reduction falls
out of jit sharding, loss normalization uses psum inside the loss
(ops/fcos_losses.py), and class codes gather with ``all_gather`` on
fixed-shape arrays (vs torch's all_gather_object).
"""

from .mesh import (batch_sharding, create_mesh, gather_class_codes,
                   replicated_sharding, shard_batch)

__all__ = ["create_mesh", "batch_sharding", "replicated_sharding",
           "shard_batch", "gather_class_codes"]

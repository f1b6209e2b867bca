"""Device-mesh and sharding helpers for multi-chip execution.

The reference is strictly single-device (no torch.distributed anywhere; see
SURVEY.md section 2.9). This framework instead expresses scaling through a
jax.sharding.Mesh with a 'data' axis:

 - Training: the batch dimension is sharded over 'data'; parameters stay
   replicated, and XLA's SPMD partitioner inserts the gradient psum over ICI
   automatically (the GSPMD equivalent of DistributedDataParallel, with no
   NCCL-style hand-written collectives).
 - Offline eval generation: images are trivially parallel over 'data'.

Tensor/pipeline/expert parallelism are deliberately absent: the model is a
<10M-parameter MLP, far below the threshold where sharding parameters pays for
the collective traffic; the mesh API keeps the door open if a larger trunk is
ever added.

On a single chip every helper degrades to a no-op, so the same training code
runs unchanged from 1 chip to a pod slice.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'


def make_mesh(devices=None, axis=DATA_AXIS):
    """A 1-D mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def data_sharding(mesh, ndim=2, axis=DATA_AXIS):
    """NamedSharding that splits the leading (batch) dim over the data axis."""
    spec = P(axis, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def shard_batch(arrays, mesh, axis=DATA_AXIS):
    """Device-put a pytree of arrays with the leading dim sharded over `axis`."""
    def put(x):
        return jax.device_put(x, data_sharding(mesh, ndim=x.ndim, axis=axis))
    return jax.tree_util.tree_map(put, arrays)


def constrain_batch(x, mesh, axis=DATA_AXIS):
    """Inside jit: constrain an activation's batch dim to the data axis, letting
    the SPMD partitioner split the downstream matmuls across chips."""
    if mesh is None or np.prod(mesh.devices.shape) == 1:
        return x
    return jax.lax.with_sharding_constraint(x, data_sharding(mesh, ndim=x.ndim, axis=axis))

"""Device-mesh and sharding helpers for multi-chip execution.

The reference is strictly single-device (no torch.distributed anywhere; see
SURVEY.md section 2.9). This framework instead expresses scaling through a
jax.sharding.Mesh with a 'data' axis:

 - Training: the batch dimension is sharded over 'data'; parameters stay
   replicated, and XLA's SPMD partitioner inserts the gradient psum over ICI
   automatically (the GSPMD equivalent of DistributedDataParallel, with no
   NCCL-style hand-written collectives).
 - Offline eval generation: images are trivially parallel over 'data'.

 - Tensor parallelism: `make_mesh_2d` + `loco_param_specs` shard the MLP's
   hidden dimension over a 'model' axis with Megatron-style alternating
   column/row-parallel weights. The SPMD partitioner inserts the all-gather /
   reduce-scatter collectives from the annotations alone. At the reference's
   model size (<10M params) this never pays for its ICI traffic — data
   parallelism is the production configuration — but the axis is first-class
   so a larger trunk shards without touching the training step.

Pipeline/expert parallelism are deliberately absent: 3 residual blocks leave
nothing to pipeline, and there is no MoE routing.

On a single chip every helper degrades to a no-op, so the same training code
runs unchanged from 1 chip to a pod slice.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'
MODEL_AXIS = 'model'


def make_mesh(devices=None, axis=DATA_AXIS):
    """A 1-D mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def make_mesh_2d(dp, tp, devices=None):
    """A (data=dp, model=tp) 2-D mesh. Data-parallel replicas ride the outer
    mesh dimension so the heavier tensor-parallel collectives stay on the
    fastest (innermost) ICI links."""
    if devices is None:
        devices = jax.devices()
    assert len(devices) >= dp * tp, f"need {dp * tp} devices, have {len(devices)}"
    grid = np.asarray(devices[:dp * tp]).reshape(dp, tp)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def loco_param_specs(axis=MODEL_AXIS):
    """PartitionSpec pytrees (params, bn_state) for the Loco model's tensor-
    parallel layout, mirroring models/loco.py:init_loco_params.

    Megatron-style alternation keeps activations feature-sharded through the
    residual trunk with one collective pair per block:
      w1 column-parallel -> hidden activations sharded on `axis`;
      each stage: w1 row-parallel (block-internal activations replicated),
      w2 column-parallel (back to sharded for the residual add);
      head: w2 row-parallel (y2 replicated for the aux head),
      w3 column-parallel, w_fin row-parallel -> replicated outputs.
    Stage specs carry a leading None for the stacked num_stage axis.
    """
    col = {'w': P(None, axis), 'b': P(axis)}
    row = {'w': P(axis, None), 'b': P()}
    rep = {'w': P(None, None), 'b': P()}
    bn_sharded = {'scale': P(axis), 'bias': P(axis)}
    bn_rep = {'scale': P(), 'bias': P()}

    def stacked(spec):
        return jax.tree_util.tree_map(lambda s: P(None, *s), spec,
                                      is_leaf=lambda x: isinstance(x, P))

    params_spec = {
        'w1': col,
        'bn1': bn_sharded,
        'w2': row,
        'w3': col,
        'bn3': bn_sharded,
        'w_aux': rep,
        'w_fin': row,
        'stages': {
            'w1': stacked(row),
            'bn1': stacked(bn_rep),
            'w2': stacked(col),
            'bn2': stacked(bn_sharded),
        },
    }
    bn_state_spec = {
        'bn1': {'mean': P(axis), 'var': P(axis)},
        'bn3': {'mean': P(axis), 'var': P(axis)},
        'stages': {
            'bn1': {'mean': P(None, None), 'var': P(None, None)},
            'bn2': {'mean': P(None, axis), 'var': P(None, axis)},
        },
    }
    return params_spec, bn_state_spec


def _apply_specs(tree, mesh, specs, place):
    return jax.tree_util.tree_map(
        lambda x, s: place(x, NamedSharding(mesh, s)), tree, specs,
        is_leaf=lambda x: isinstance(x, P))


def shard_by_specs(tree, mesh, specs):
    """Device-put a pytree with per-leaf PartitionSpecs (same tree structure)."""
    return _apply_specs(tree, mesh, specs, jax.device_put)


def constrain_by_specs(tree, mesh, specs):
    """Inside jit: with_sharding_constraint a pytree by per-leaf PartitionSpecs."""
    return _apply_specs(tree, mesh, specs, jax.lax.with_sharding_constraint)


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

"""Device mesh + data-parallel sharding helpers.

The reference has NO distribution (SURVEY.md §2.9); this module adds the
TPU-native equivalent: a 1-D 'data' mesh for batch parallelism (images are
embarrassingly parallel), with XLA inserting the gradient all-reduce when a
jitted train step consumes a batch sharded on 'data' against replicated
parameters.  DCN-spanning meshes would put 'data' on the slow axis — fine,
since only grads cross it once per step.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D data-parallel mesh over the first n (default: all) devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (DATA_AXIS,))


def maybe_mesh(mesh) -> Optional[Mesh]:
    """Pass-through helper: None, an int (device count), or a Mesh."""
    if mesh is None or isinstance(mesh, Mesh):
        return mesh
    return make_mesh(int(mesh))


def data_parallel_sharding(mesh: Optional[Mesh]):
    """Returns fn(array) -> NamedSharding sharding the leading (batch) dim."""
    def fn(x):
        if mesh is None:
            return None
        spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
        return NamedSharding(mesh, spec)

    return fn


def shard_batch(batch, mesh: Optional[Mesh]):
    """Place every leaf of a batch pytree with its leading dim sharded."""
    if mesh is None:
        return batch
    fn = data_parallel_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, fn(x)), batch)


def replicate(tree, mesh: Optional[Mesh]):
    """Fully replicate a parameter pytree over the mesh."""
    if mesh is None:
        return tree
    s = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)

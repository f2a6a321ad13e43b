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


def default_mesh(n_devices: Optional[int] = None) -> Optional[Mesh]:
    """The mesh the user-facing CLI commands run on: a 1-D data mesh over
    all visible devices, or None when there is one device (or the caller
    pins n_devices=1) — None means 'plain single-device dispatch'."""
    n = len(jax.devices()) if n_devices is None else int(n_devices)
    if n <= 1:
        return None
    return make_mesh(n)


def run_data_parallel(fn, batch, mesh: Optional[Mesh], *args, **kwargs):
    """Run ``fn(batch, *args, **kwargs)`` with the leading (batch) dim
    sharded over ``mesh``, padding the batch up to a multiple of the mesh
    size (padded rows repeat the last frame — every program this wraps is
    per-image, so padding changes nothing) and cropping every output leaf
    back to the true batch size.

    Batches SMALLER than the mesh dispatch plain (sharding them would pad
    more than it parallelizes — e.g. a 3-image trailing chunk on an
    8-device mesh would run 8 images to produce 3); batches >= the mesh
    size pad at most mesh.size - 1 rows.  With mesh=None this is exactly
    ``fn(batch, ...)``: the per-image math is identical either way, so
    multi-device runs produce byte-identical outputs to single-device ones
    (gated in tests/test_cli_dp.py)."""
    import jax.numpy as jnp

    batch = jnp.asarray(batch)
    if mesh is None or mesh.size <= 1 or batch.shape[0] < mesh.size:
        return fn(batch, *args, **kwargs)
    b = batch.shape[0]
    pad = (-b) % mesh.size
    if pad:
        batch = jnp.concatenate(
            [batch, jnp.broadcast_to(batch[-1:], (pad,) + batch.shape[1:])])
    out = fn(shard_batch(batch, mesh), *args, **kwargs)
    if pad:
        out = jax.tree.map(lambda x: x[:b], out)
    return out

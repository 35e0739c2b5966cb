"""Device-mesh sharding: domain decomposition over TPU ICI.

The reference is single-process; its halo-exchange story is the "Becomes
MPI" markers in cshift (cshift/cshift_2d.h:72,89,101,114 - never written).
Here distribution is first-class and TPU-native (SURVEY.md 2.10):

  * The lattice's (Y, Xh) axes shard over a 2D jax Mesh ("y", "x").
  * cshift stays written as rolls; under jit with sharded operands XLA's
    SPMD partitioner lowers the wrapped rows/columns to collective
    permutes over ICI - the halo exchange the reference never wrote.
  * Global reductions (Krylov dots/norms) become all-reduces.
  * Coarse MG levels shrink below the shard grid; the intended operating
    mode replicates them (gather-to-replicated crossover), mirroring the
    reference's tiny coarsest lattices.

All shardings are data placements only - the math in stencil.py/
solvers.py is unchanged, which is exactly the XLA-native scaling recipe
(annotate shardings, let the compiler insert collectives).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .stencil import StencilCoeffs


def make_mesh(n_devices: Optional[int] = None, shape=None,
              devices=None) -> Mesh:
    """A 2D ("y", "x") mesh. With only a device count, factor it as
    close to square as possible (y-major, since Y rolls dominate)."""
    devices = devices if devices is not None else jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if shape is None:
        ny = int(np.floor(np.sqrt(n_devices)))
        while n_devices % ny:
            ny -= 1
        shape = (n_devices // ny, ny) if ny < n_devices // ny else \
            (ny, n_devices // ny)
        shape = (max(shape), min(shape))  # more shards along y
    mesh_devices = np.asarray(devices).reshape(shape)
    return Mesh(mesh_devices, axis_names=("y", "x"))


def field_spec(n_dof_axes: int) -> P:
    """PartitionSpec for a (2, Y, Xh, dof...) field."""
    return P(None, "y", "x", *([None] * n_dof_axes))


def shard_field(field, mesh: Mesh, n_dof_axes: Optional[int] = None):
    """Place a (2, Y, Xh, dof...) field on the mesh."""
    if n_dof_axes is None:
        n_dof_axes = field.ndim - 3
    return jax.device_put(field, NamedSharding(mesh, field_spec(n_dof_axes)))


def replicate(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))


def shard_coeffs(coeffs: StencilCoeffs, mesh: Mesh) -> StencilCoeffs:
    """Place stencil coefficient arrays on the mesh: clover/hopping shard
    with the lattice; scalars replicate."""
    clover = coeffs.clover
    if clover is not None:
        clover = jax.device_put(
            clover, NamedSharding(mesh, P(None, "y", "x", None, None)))
    hopping = coeffs.hopping
    if hopping is not None:
        hopping = jax.device_put(
            hopping,
            NamedSharding(mesh, P(None, None, "y", "x", None, None)))
    return coeffs.replace(
        clover=clover, hopping=hopping,
        shift=replicate(coeffs.shift, mesh),
        eo_shift=replicate(coeffs.eo_shift, mesh),
        dof_shift=replicate(coeffs.dof_shift, mesh))


def shardable_dims(lat, mesh: Mesh) -> bool:
    """Whether (Y, Xh) divide the mesh shape."""
    my, mx = mesh.devices.shape
    return lat.y_len % my == 0 and lat.xh % mx == 0

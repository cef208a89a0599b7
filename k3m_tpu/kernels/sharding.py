"""Mesh-awareness for Pallas kernels (GSPMD-safe partitioning).

Pallas lowers to an XLA custom call that carries no GSPMD partitioning
rule: on a >1-device mesh the partitioner would conservatively replicate
the call and all-gather its operands — correct but catastrophically slow
(it undoes the batch sharding that IS the data-parallel strategy; the
reference's analog is DDP allreduce, train_concap_struc.py:301-310).

The TPU-native fix is a *partial* `jax.shard_map` over the batch-bearing
mesh axes: the kernel body runs per-shard on its local rows and GSPMD
keeps handling the axes the kernel doesn't touch (`axis_names` subset +
`check_vma=False`). For LayerNorm — rows are independent, params
replicated — shard_map's autodiff then inserts exactly ONE psum for the
dscale/dbias cotangents, which XLA fuses into the existing gradient
all-reduce (verified by tests/test_hlo_collectives.py: no all-gathers
appear, and the fused LN path matches the unfused one bit-for-tolerance
under a 4x2 data x model mesh).

Trainers publish their mesh for the duration of step tracing via
`kernel_mesh_scope(mesh)`; kernels pick it up with `current_kernel_mesh()`
and fall back to plain single-device calls when no mesh (or mesh.size==1)
is active — so the measured single-chip path is byte-identical to round 2.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Optional

import jax
from jax.sharding import PartitionSpec as P

_MESH: contextvars.ContextVar = contextvars.ContextVar(
    "k3m_kernel_mesh", default=None)

BATCH_AXIS = "data"


@contextlib.contextmanager
def kernel_mesh_scope(mesh):
    """Publish `mesh` to Pallas kernels while tracing a train/eval step.

    A contextvar (not a module global) so two trainers with different
    meshes in one process — e.g. the DP==single-device parity tests —
    can't contaminate each other: the scope is only active while THIS
    trainer's jitted function is being traced."""
    tok = _MESH.set(mesh if (mesh is not None and mesh.size > 1) else None)
    try:
        yield
    finally:
        _MESH.reset(tok)


def current_kernel_mesh():
    return _MESH.get()


def shard_rows(fn, mesh, n_args: int, ndims, out_ndim: int):
    """shard_map `fn` over the batch ('data') axis only.

    Args 0..n_args-1 are batch-leading tensors sharded on their first
    axis; the rest are replicated (params). `ndims` gives each argument's
    rank (None entries allowed for optional args). The 'model' axis is
    left to GSPMD (`axis_names={'data'}`)."""
    def spec(nd, sharded):
        if nd is None:
            return None
        if sharded:
            return P(BATCH_AXIS, *([None] * (nd - 1)))
        return P(*([None] * nd))

    in_specs = tuple(spec(nd, i < n_args) for i, nd in enumerate(ndims))
    out_spec = P(BATCH_AXIS, *([None] * (out_ndim - 1)))
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_spec, axis_names={BATCH_AXIS},
                         check_vma=False)


def batch_shards(mesh) -> int:
    """Number of shards the leading batch axis is split into."""
    return mesh.shape.get(BATCH_AXIS, 1)


def model_shards(mesh) -> int:
    return mesh.shape.get("model", 1)

"""Device mesh + GSPMD sharding rules.

The reference scales via torch DDP over NCCL/gloo
(train_concap_struc.py:161,301-310; pretrain.py:59-75). The TPU-native
equivalent is a single jitted program over a `jax.sharding.Mesh` with
parameter/batch PartitionSpecs; XLA inserts all-reduces on ICI
(no user-level communication code).

Axes:
  'data'  — batch (pure DP; gradients all-reduced by XLA)
  'model' — tensor parallelism over attention heads / FFN / vocab

Param rules (path-pattern -> PartitionSpec):
  QKV + FFN-in kernels     : shard output dim on 'model'
  attn-out + FFN-out kernel: shard input dim on 'model'
  word embeddings          : shard vocab dim on 'model'
  everything else          : replicated
"""

from __future__ import annotations

import re
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n_total = len(devices)
    if n_data is None:
        n_data = n_total // n_model
    assert n_data * n_model == n_total, (n_data, n_model, n_total)
    dev_array = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(dev_array, ("data", "model"))


# (regex over '/'-joined param path, partition spec for the param's kernel)
_COL_PARALLEL = re.compile(
    r"(query|key|value|query1|key1|value1|query2|key2|value2|intermediate"
    r"|v_intermediate|t_intermediate)/kernel$")
_ROW_PARALLEL = re.compile(
    r"(attention_output|output|v_output|t_output|bi_dense1|bi_dense2)/kernel$")
_VOCAB_PARALLEL = re.compile(r"word_embeddings$")


def param_spec(path_str: str, value: Any) -> P:
    if value.ndim == 0:
        return P()
    if _COL_PARALLEL.search(path_str):
        return P(None, "model")
    if _ROW_PARALLEL.search(path_str):
        return P("model", None)
    if _VOCAB_PARALLEL.search(path_str) and value.ndim == 2:
        return P("model", None)
    return P()  # replicated


def _path_str(path) -> str:
    return "/".join(getattr(k, "key", str(k)) for k in path)


def params_shardings(params, mesh: Mesh):
    return jax.tree_util.tree_map_with_path(
        lambda p, v: NamedSharding(mesh, param_spec(_path_str(p), v)), params)


def batch_shardings(batch, mesh: Mesh):
    def spec(v):
        if hasattr(v, "ndim") and v.ndim >= 1:
            return NamedSharding(mesh, P("data"))
        return NamedSharding(mesh, P())
    return jax.tree.map(spec, batch)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def commit_scalars(tree, mesh: Mesh):
    """device_put every leaf that is NOT already NamedSharding-committed
    (optimizer step counters etc.) onto `mesh`, replicated.

    The jit tracing cache keys each input by its sharding/mesh context.
    `optax`'s count scalars come out of `jit(tx.init)` uncommitted, while
    the train step returns them committed to the mesh — so without this
    the SECOND train_step call silently retraces and recompiles the whole
    step (an extra ~8 min for the full-size alignment step on the target
    host; pinned by tests/test_no_recompile.py)."""
    rep = replicated(mesh)

    def fix(x):
        if isinstance(getattr(x, "sharding", None), NamedSharding):
            return x
        return jax.device_put(x, rep)

    return jax.tree.map(fix, tree)


def shard_params(params, mesh: Mesh):
    return jax.device_put(params, params_shardings(params, mesh))


def shard_batch(batch, mesh: Mesh):
    shardings = batch_shardings(batch, mesh)
    if jax.process_count() > 1:
        # Multi-host: each process holds only its slice of the global batch
        # (the loaders shard sample indices per host); assemble the global
        # array from the process-local data. Per-host local batch size must
        # be global_batch / process_count — the loader contract.
        return jax.tree.map(
            lambda v, s: jax.make_array_from_process_local_data(
                s, np.asarray(v)),
            batch, shardings)
    return jax.device_put(batch, shardings)

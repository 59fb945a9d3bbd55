"""Tensor-parallel parameter partitioning over a 2-D (data, model) mesh.

The flagship model is small enough to replicate (the reference replicates its
model per GPU, src/lib.rs:154-200), so pure data parallelism is the default.
Tensor parallelism is still a first-class option for wider configs: attention
heads and the FFN hidden axis shard over the ``model`` mesh axis (Megatron
column/row-parallel layout); XLA/GSPMD inserts the psum on the row-parallel
projections. Everything else (embedder, norms, heads) replicates.

Layout rules (kernel shapes per models/model.py):

* ``attn/qkv/kernel [d, 3, H, Dh]``  — shard H          (column-parallel)
* ``attn/out/kernel [H*Dh, d]``      — shard rows       (row-parallel; rows
  are head-major, matching the ``reshape(B, L, H*Dh)`` in Attention)
* ``ff1/kernel [d, d_ff]``           — shard d_ff       (column-parallel)
* ``ff2/kernel [d_ff, d]``           — shard rows       (row-parallel)
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh_2d(n_data: int, n_model: int) -> Mesh:
    devs = jax.local_devices()
    n = n_data * n_model
    assert len(devs) >= n, f"need {n} devices, have {len(devs)}"
    grid = np.asarray(devs[:n]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def _spec_for(path: tuple[str, ...], ndim: int) -> P:
    joined = "/".join(path)
    if joined.endswith("attn/qkv/kernel"):
        return P(None, None, "model", None)
    if joined.endswith("attn/qkv/bias"):
        return P(None, "model", None)
    if joined.endswith("attn/out/kernel"):
        return P("model", None)
    if joined.endswith("ff1/kernel"):
        return P(None, "model")
    if joined.endswith("ff1/bias"):
        return P("model")
    if joined.endswith("ff2/kernel"):
        return P("model", None)
    return P()


def param_shardings(mesh: Mesh, params):
    """NamedSharding pytree for ``params`` on ``mesh``.

    With no ``model`` axis (or size 1) everything replicates — the DP layout.
    """
    tp = dict(zip(mesh.axis_names, mesh.devices.shape)).get("model", 1)

    def one(path, leaf):
        keys = tuple(str(k.key) for k in path)
        spec = _spec_for(keys, leaf.ndim) if tp > 1 else P()
        if tp > 1 and spec != P():
            # the sharded axis must divide evenly (heads / d_ff)
            axis = next(i for i, s in enumerate(spec) if s == "model")
            assert leaf.shape[axis] % tp == 0, (
                f"{'/'.join(keys)} axis {axis} ({leaf.shape[axis]}) "
                f"not divisible by model={tp}"
            )
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)

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


def param_pspecs(params, tp: int):
    """PartitionSpec pytree for ``params`` (the Megatron layout above when
    ``tp`` > 1, fully replicated otherwise). Used both to build
    NamedShardings and as shard_map in_specs for the TP fast path."""

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
        return spec

    return jax.tree_util.tree_map_with_path(one, params)


def param_shardings(mesh: Mesh, params):
    """NamedSharding pytree for ``params`` on ``mesh``.

    With no ``model`` axis (or size 1) everything replicates — the DP layout.
    """
    tp = dict(zip(mesh.axis_names, mesh.devices.shape)).get("model", 1)
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec), param_pspecs(params, tp)
    )


def _tp_forward(cfg, p, tokens, quals, sidx, smask, tp: int, axis: str):
    """CorrectionModel forward with head/d_ff shards local to each device.

    Runs inside shard_map: ``p`` holds the LOCAL parameter blocks of
    ``param_pspecs`` (qkv kernel [d, 3, H/tp, Dh], out kernel [H/tp*Dh, d],
    ff1 [d, f/tp], ff2 [f/tp, d]); everything else is replicated. Mirrors
    models/model.py exactly — the parity test pins it to model.apply.

    The fused kernels bake the residual add (and row-parallel bias) into
    their output, so each shard is fed the residual stream and bias scaled
    by 1/tp: psum then reconstructs ``x + sum_of_partials + bias`` in one
    collective per half-block (the Megatron two-allreduce-per-layer
    pattern). tp divides the head count, which is a power of two, so the
    1/tp scaling is exact in bf16; LayerNorm is scale-invariant (up to its
    1e-6 eps) so ln_ffn seeing the scaled stream is sound. Replicated work
    (entry embed, final LN, heads) is recomputed per shard — negligible
    next to the layer stack.
    """
    import flax.linen as nn
    import jax.numpy as jnp

    from ..constants import TOKEN_PAD, VOCAB_SIZE
    from ..ops import fused

    dt = cfg.compute_dtype
    B, R, L = tokens.shape
    V1 = VOCAB_SIZE + 1
    inv = 1.0 / tp

    ck, cb = p["col_proj"]["kernel"], p["col_proj"]["bias"]
    idx = np.arange(R * V1).reshape(R, V1)
    w_embT = ck[idx[:, :VOCAB_SIZE].reshape(-1)].T.astype(dt)
    w_qT = ck[idx[:, VOCAB_SIZE]].T.astype(dt)
    x = fused.entry_embed(
        tokens, quals.astype(jnp.float32), w_embT, w_qT,
        cb.astype(jnp.float32), dt,
    )

    lengths = (tokens[:, 0, :] != TOKEN_PAD).astype(jnp.int32).sum(axis=1)

    h, dh = cfg.n_heads, cfg.d_model // cfg.n_heads
    assert h % tp == 0, (h, tp)
    h_loc = h // tp
    for i in range(cfg.n_layers):
        bp = p[f"block_{i}"]
        q, k, v = fused.ln_qkv_rope(
            x, bp["ln1"]["scale"], bp["ln1"]["bias"],
            bp["attn"]["qkv"]["kernel"]
            .reshape(cfg.d_model, 3 * h_loc * dh).astype(dt),
            bp["attn"]["qkv"]["bias"].reshape(3 * h_loc * dh).astype(dt),
            h_loc,
        )
        y = fused.flash_outproj(
            q, k, v, x * inv,
            bp["attn"]["out"]["kernel"]
            .reshape(h_loc, dh, cfg.d_model).astype(dt),
            (bp["attn"]["out"]["bias"] * inv).astype(dt),
            lengths, cfg.local_window,
        )
        x = jax.lax.psum(y, axis)
        y = fused.ln_ffn(
            x * inv, bp["ln2"]["scale"], bp["ln2"]["bias"],
            bp["ff1"]["kernel"].astype(dt), bp["ff1"]["bias"].astype(dt),
            bp["ff2"]["kernel"].astype(dt),
            (bp["ff2"]["bias"] * inv).astype(dt),
        )
        x = jax.lax.psum(y, axis)

    # replicated tail, via the same flax modules the model uses (gather
    # first: the per-token final LN commutes with it — model.py:269-275)
    gathered = jnp.take_along_axis(x, sidx[..., None], axis=1)
    gathered = nn.LayerNorm(dtype=dt).apply({"params": p["ln_f"]}, gathered)
    gathered = gathered.astype(jnp.float32)
    bases_logits = nn.Dense(5, dtype=jnp.float32).apply(
        {"params": p["bases_head"]}, gathered
    )
    info_logits = nn.Dense(1, dtype=jnp.float32).apply(
        {"params": p["info_head"]}, gathered
    )[..., 0]

    neg = jnp.float32(-1e9)
    bases_logits = jnp.where(smask[..., None], bases_logits, neg)
    info_logits = jnp.where(smask, info_logits, neg)
    return info_logits, bases_logits


def make_tp_correct_step(cfg, mesh: Mesh, params):
    """Tensor-parallel fused correct step over a 2-D (data, model) mesh.

    shard_map over BOTH axes so every device runs the fused pallas kernels
    on its local batch slice x head/d_ff shard — GSPMD treats pallas_call as
    an unpartitionable custom call, which is why the pre-round-5 TP path
    dropped to the jnp twin kernels. Same (packed-tokens) signature and
    outputs as pipeline.infer.make_correct_step; ``params`` is used for its
    tree structure only.
    """
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map

    from ..constants import N_ROWS, QUAL_OFFSET, QUAL_SCALE
    from ..ops.consensus import count_decisions
    from ..pipeline.batching import unpack_tokens_jnp

    tp = dict(zip(mesh.axis_names, mesh.devices.shape))["model"]

    def step(params, tokens_packed, quals_u8, support_idx, support_mask,
             n_alns):
        tokens = unpack_tokens_jnp(tokens_packed, N_ROWS)
        quals = QUAL_SCALE * quals_u8.astype(jnp.float32) - QUAL_OFFSET
        info, logits = _tp_forward(
            cfg, params["params"], tokens, quals, support_idx, support_mask,
            tp, "model",
        )
        classes = jnp.argmax(logits, axis=-1).astype(jnp.uint8)
        decisions = count_decisions(tokens, n_alns)
        return info, classes, decisions

    data = P("data")
    return shard_map(
        step,
        mesh=mesh,
        in_specs=(param_pspecs(params, tp),) + (data,) * 5,
        out_specs=(data,) * 3,
        check_rep=False,
    )

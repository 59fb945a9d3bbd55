"""Correction transformer.

Honors the observable I/O contract of the reference TorchScript model
(src/inference.rs:147-175): inputs are the window pileup ``bases`` (token ids
0-11, [B, L, 31]) and normalised ``quals`` ([-1, 1], [B, L, 31]); outputs are a
5-way {A,C,G,T,*} classification plus a scalar info logit for every supported
pileup column. TPU adaptations:

* the ragged ``indices: List[Tensor]`` becomes a dense padded ``[B, S]`` index
  matrix with a validity mask — static shapes for XLA;
* logits come back as ``[B, S, 5]`` / ``[B, S]`` instead of flattened
  ``[sum(lens)]`` packs;
* compute in bfloat16 on the MXU, parameters in float32.

Architecture (ours — the reference blob is opaque, only its interface is
specified): each pileup column's 31 (base, qual) pairs are embedded and fused
by a dense layer into d_model (row identity is positional: row 0 is the
target, rows 1.. are ranked queries); a pre-norm rotary transformer encoder
mixes along the column axis; heads classify the gathered supported columns.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..constants import N_ROWS, TOKEN_PAD, VOCAB_SIZE


@dataclass(frozen=True)
class ModelConfig:
    d_model: int = 256
    n_layers: int = 8
    # head_dim = d_model / n_heads is kept at 128 on the flagship configs —
    # the MXU lane width — so flash-attention tiles are never lane-padded.
    n_heads: int = 2
    d_ff: int = 1024
    base_embed_dim: int = 16
    # Attention span along the pileup column axis; None = full attention.
    local_window: int | None = None
    # auto / flash (pallas) / chunked / naive — see ops/attention.py
    attn_impl: str = "auto"
    dtype: str = "bfloat16"
    # Rematerialise each block in the backward pass: saved activations drop
    # from O(n_layers * L * (d_ff + 3*d_model)) to one residual per layer,
    # which is what lets a [32, 5120] train batch fit in 16G of HBM. Free at
    # inference (XLA drops the recompute when nothing needs residuals).
    remat: bool = True

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


TINY_CONFIG = ModelConfig(
    d_model=32, n_layers=2, n_heads=2, d_ff=64, base_embed_dim=4, dtype="float32"
)

# Flagship R10.4.1 configuration. Attention is banded to +-512 pileup
# columns: consensus decisions are local, quality is unchanged vs full
# attention (eval: Q21.69 vs Q21.71 on matched seeds) and the device step is
# 2.2x faster at production window widths (L ~ 9k after insertions).
R10_CONFIG = ModelConfig(local_window=512)

# R9.4.1 variant (same topology; separate weights, slightly wider FFN to
# absorb the noisier pore chemistry).
R9_CONFIG = ModelConfig(d_ff=1536, local_window=512)

CONFIGS = {"tiny": TINY_CONFIG, "r10": R10_CONFIG, "r9": R9_CONFIG}


def _rope_tables(
    positions: jnp.ndarray, d_half: int, dtype
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(cos, sin) [B, L, 1, d_half] for :func:`_rope`. Computed once per
    forward and shared by every layer — the per-layer recompute was ~300M
    transcendentals per production batch."""
    freq = 1.0 / (10000.0 ** (jnp.arange(d_half, dtype=jnp.float32) / d_half))
    angles = positions[..., None].astype(jnp.float32) * freq  # [B, L, d_half]
    return (
        jnp.cos(angles)[:, :, None, :].astype(dtype),
        jnp.sin(angles)[:, :, None, :].astype(dtype),
    )


def _rope(x: jnp.ndarray, rope: tuple[jnp.ndarray, jnp.ndarray]) -> jnp.ndarray:
    """Rotary position embedding over the last dim of [B, L, H, Dh]."""
    cos, sin = rope
    d_half = x.shape[-1] // 2
    x1, x2 = x[..., :d_half], x[..., d_half:]
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)


class Attention(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray, rope):
        from ..ops.attention import attention as attn_op

        cfg = self.cfg
        B, L, _ = x.shape
        h, dh = cfg.n_heads, cfg.d_model // cfg.n_heads
        qkv = nn.DenseGeneral(
            (3, h, dh), axis=-1, dtype=cfg.compute_dtype, name="qkv"
        )(x)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = _rope(q, rope)
        k = _rope(k, rope)

        # [B, L, H, D] -> [B, H, L, D] for the kernels
        out = attn_op(
            q.transpose(0, 2, 1, 3),
            k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
            lengths,
            local_window=cfg.local_window,
            impl=cfg.attn_impl,
        )
        out = out.transpose(0, 2, 1, 3).reshape(B, L, h * dh)
        return nn.Dense(cfg.d_model, dtype=cfg.compute_dtype, name="out")(out)


class Block(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, lengths, rope):
        cfg = self.cfg
        y = nn.LayerNorm(dtype=cfg.compute_dtype, name="ln1")(x)
        x = x + Attention(cfg, name="attn")(y, lengths, rope)
        y = nn.LayerNorm(dtype=cfg.compute_dtype, name="ln2")(x)
        y = nn.Dense(cfg.d_ff, dtype=cfg.compute_dtype, name="ff1")(y)
        y = nn.gelu(y)
        y = nn.Dense(cfg.d_model, dtype=cfg.compute_dtype, name="ff2")(y)
        return x + y


class CorrectionModel(nn.Module):
    """bases [B,L,31] int32, quals [B,L,31] f32, support_idx [B,S] int32,
    support_mask [B,S] bool -> (info_logits [B,S], bases_logits [B,S,5])."""

    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        bases: jnp.ndarray,
        quals: jnp.ndarray,
        support_idx: jnp.ndarray,
        support_mask: jnp.ndarray,
    ):
        cfg = self.cfg
        B, L, R = bases.shape
        assert R == N_ROWS, f"expected {N_ROWS} pileup rows, got {R}"

        # Per-row features: one-hot base token (+ qual scalar). The embedding
        # is folded into the dense projection — one MXU matmul instead of a
        # 4.5M-element gather, which TPUs handle poorly.
        onehot = jax.nn.one_hot(bases, VOCAB_SIZE, dtype=cfg.compute_dtype)
        q = quals[..., None].astype(cfg.compute_dtype)
        col = jnp.concatenate([onehot, q], axis=-1)  # [B, L, R, V+1]
        col = col.reshape(B, L, R * (VOCAB_SIZE + 1))
        x = nn.Dense(cfg.d_model, dtype=cfg.compute_dtype, name="col_proj")(col)

        # Columns whose target row is padding are masked out everywhere;
        # padding is always a suffix, so a per-example length suffices.
        mask = bases[:, :, 0] != TOKEN_PAD
        lengths = mask.astype(jnp.int32).sum(axis=1)
        # Positions count real columns so padding never shifts phases; the
        # rotary tables are computed once here and shared by all layers.
        positions = jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1
        rope = _rope_tables(
            positions, cfg.d_model // cfg.n_heads // 2, cfg.compute_dtype
        )

        block_cls = nn.remat(Block) if cfg.remat else Block
        for i in range(cfg.n_layers):
            x = block_cls(cfg, name=f"block_{i}")(x, lengths, rope)
        x = nn.LayerNorm(dtype=cfg.compute_dtype, name="ln_f")(x)

        # Gather supported columns: [B, S, d]
        gathered = jnp.take_along_axis(x, support_idx[..., None], axis=1)
        gathered = gathered.astype(jnp.float32)

        bases_logits = nn.Dense(5, dtype=jnp.float32, name="bases_head")(gathered)
        info_logits = nn.Dense(1, dtype=jnp.float32, name="info_head")(gathered)[..., 0]

        neg = jnp.float32(-1e9)
        bases_logits = jnp.where(support_mask[..., None], bases_logits, neg)
        info_logits = jnp.where(support_mask, info_logits, neg)
        return info_logits, bases_logits


def init_params(cfg: ModelConfig, rng: jax.Array, max_len: int = 64, max_sup: int = 8):
    model = CorrectionModel(cfg)
    bases = jnp.full((1, max_len, N_ROWS), TOKEN_PAD, dtype=jnp.int32)
    bases = bases.at[:, :, 0].set(0)
    quals = jnp.zeros((1, max_len, N_ROWS), dtype=jnp.float32)
    sidx = jnp.zeros((1, max_sup), dtype=jnp.int32)
    smask = jnp.ones((1, max_sup), dtype=bool)
    return model.init(rng, bases, quals, sidx, smask)

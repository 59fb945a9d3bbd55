"""Correction transformer.

Honors the observable I/O contract of the reference TorchScript model
(src/inference.rs:147-175): inputs are the window pileup ``bases`` (token ids
0-11) and normalised ``quals`` ([-1, 1]); outputs are a 5-way {A,C,G,T,*}
classification plus a scalar info logit for every supported pileup column.
TPU adaptations:

* tensors are **row-major** ``[B, R, L]`` (pileup rows × columns), putting
  the long column axis on the 128-lane minor dimension. The reference's
  ``[B, L, 31]`` layout lane-pads the 31-row axis to 128 on TPU — a measured
  4-10x waste of HBM bandwidth that dominated the step (tools/ablate_r3.py);
* the ragged ``indices: List[Tensor]`` becomes a dense padded ``[B, S]``
  index matrix with a validity mask — static shapes for XLA;
* logits come back as ``[B, S, 5]`` / ``[B, S]`` instead of flattened
  ``[sum(lens)]`` packs;
* compute in bfloat16 on the MXU, parameters in float32; the hot blocks run
  as fused Pallas kernels (ops/fused.py) with jnp twins on CPU.

Architecture (ours — the reference blob is opaque, only its interface is
specified): each pileup column's 31 (base, qual) pairs are embedded and fused
by a dense projection into d_model (row identity is positional: row 0 is the
target, rows 1.. are ranked queries); a pre-norm rotary transformer encoder
mixes along the column axis; heads classify the gathered supported columns.
The embedding is expressed as two lane-aligned matmuls (a one-hot contraction
over row×vocab and a qual contraction over rows) — algebraically identical to
the original dense over concat(one_hot, qual) but with no lane-padded
intermediates. Positions are a static arange: padding is always a suffix of
the column axis (pileup invariant), so real-column positions equal absolute
positions.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
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
    # Retained for checkpoint-config compatibility; the fused attention op
    # picks pallas on TPU and the jnp twin elsewhere (ops/fused.py).
    attn_impl: str = "auto"
    dtype: str = "bfloat16"
    # Rematerialise each block in the backward pass: saved activations drop
    # from O(n_layers * L * (d_ff + 3*d_model)) to one residual per layer,
    # which is what lets a [32, 5120] train batch fit in 16G of HBM. Free at
    # inference (XLA drops the recompute when nothing needs residuals).
    remat: bool = True
    # Inference-time int8: dynamic per-row activation + per-channel weight
    # quantization of the layer-stack matmuls (qkv, out, FFN) — 2x the MXU
    # rate and half the HBM bytes on v5e. Weights stay f32 in the checkpoint
    # (quantized on the fly inside the jitted step — negligible, it is
    # per-weight not per-token work). Heads/entry/attention stay bf16/f32.
    # Training ignores this flag (the custom_vjp paths are bf16).
    int8: bool = False

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


TINY_CONFIG = ModelConfig(
    d_model=32, n_layers=2, n_heads=2, d_ff=64, base_embed_dim=4, dtype="float32"
)

# Flagship R10.4.1 configuration (round-4 promotion): the wider-shallower
# d512x3L same-parameter-budget topology. Promotion gate (matched seeds,
# tools/eval_battery.py round 4) vs the previous d256x8L flagship:
# standard Q39.18 vs Q39.27 (-0.09 dB, within the 0.2 dB gate), het 99.2%
# both; R9-profile Q34.91 vs Q34.87 (+0.04); ~10x low-coverage within gate —
# for +29-44% measured step throughput from higher arithmetic intensity
# (tools/variant_step_time.py: 1097/554 vs 763/430 w/s at L=4608/9216).
# head_dim stays 128 (the MXU lane width, 4 heads) so flash-attention tiles
# are never lane-padded. Attention is banded to +-512 pileup columns:
# consensus decisions are local; quality is unchanged vs full attention.
R10_CONFIG = ModelConfig(
    d_model=512, n_layers=3, n_heads=4, d_ff=1024, local_window=512
)
R10_WIDE_CONFIG = R10_CONFIG  # promoted; alias kept for existing callers

# Previous flagship topology (deep-narrow d256x8L) — checkpoints with this
# config.json still load and run; kept as a named config for comparisons.
R10_DEEP_CONFIG = ModelConfig(local_window=512)

# R9.4.1 variant (d256x8L topology; separate weights, slightly wider FFN to
# absorb the noisier pore chemistry).
R9_CONFIG = ModelConfig(d_ff=1536, local_window=512)

CONFIGS = {
    "tiny": TINY_CONFIG,
    "r10": R10_CONFIG,
    "r9": R9_CONFIG,
    "r10w": R10_WIDE_CONFIG,
    "r10deep": R10_DEEP_CONFIG,
}


class _DenseParams(nn.Module):
    """Parameter holder replicating an nn.Dense / nn.DenseGeneral subtree
    (``{kernel, bias}``) without binding the compute — the fused kernels
    consume the arrays directly."""

    kernel_shape: tuple
    bias_shape: tuple

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(), self.kernel_shape)
        b = self.param("bias", nn.initializers.zeros_init(), self.bias_shape)
        return k, b


class _LNParams(nn.Module):
    """Parameter holder replicating an nn.LayerNorm subtree."""

    dim: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones_init(), (self.dim,))
        b = self.param("bias", nn.initializers.zeros_init(), (self.dim,))
        return s, b


class _AttnParams(nn.Module):
    """qkv / out projection parameters (tree-compatible with the original
    Attention module: attn/qkv/{kernel,bias}, attn/out/{kernel,bias})."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self):
        cfg = self.cfg
        h, dh = cfg.n_heads, cfg.d_model // cfg.n_heads
        qkv_k, qkv_b = _DenseParams(
            (cfg.d_model, 3, h, dh), (3, h, dh), name="qkv"
        )()
        out_k, out_b = _DenseParams(
            (h * dh, cfg.d_model), (cfg.d_model,), name="out"
        )()
        return qkv_k, qkv_b, out_k, out_b


class Block(nn.Module):
    """Pre-norm transformer block over fused ops.

    ln1 -> qkv projection (one fused LN+matmul), rope + banded flash
    attention straight off the flat qkv buffer, out projection + residual,
    then a fused LN+FFN+residual kernel. No layout changes anywhere: the
    stream stays [B, L, d_model] with the 128-aligned d_model minor.
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, lengths):
        from ..ops.fused import (
            attention_block,
            attention_block_q,
            ln_ffn,
            ln_ffn_q,
            quantize_weight,
        )

        cfg = self.cfg
        dt = cfg.compute_dtype
        h, dh = cfg.n_heads, cfg.d_model // cfg.n_heads

        ln1_s, ln1_b = _LNParams(cfg.d_model, name="ln1")()
        qkv_k, qkv_b, out_k, out_b = _AttnParams(cfg, name="attn")()
        ln2_s, ln2_b = _LNParams(cfg.d_model, name="ln2")()
        ff1_k, ff1_b = _DenseParams(
            (cfg.d_model, cfg.d_ff), (cfg.d_ff,), name="ff1"
        )()
        ff2_k, ff2_b = _DenseParams(
            (cfg.d_ff, cfg.d_model), (cfg.d_model,), name="ff2"
        )()

        # (d, 3, h, dh) flattens c-major to (d, 3*h*dh): q of head i is
        # column block i, k is h+i, v is 2h+i — the slicing attention_block's
        # qkv kernel uses. The out projection reshapes to per-head slices.
        attn_fn = attention_block_q if cfg.int8 else attention_block
        x = attn_fn(
            x, ln1_s, ln1_b,
            qkv_k.reshape(cfg.d_model, 3 * h * dh).astype(dt),
            qkv_b.reshape(3 * h * dh).astype(dt),
            out_k.reshape(h, dh, cfg.d_model).astype(dt),
            out_b.astype(dt),
            lengths, h, cfg.local_window,
        )
        if cfg.int8:
            w1_i8, s1 = quantize_weight(ff1_k)
            w2_i8, s2 = quantize_weight(ff2_k)
            return ln_ffn_q(
                x, ln2_s, ln2_b, w1_i8, s1, ff1_b, w2_i8, s2, ff2_b
            )
        return ln_ffn(
            x, ln2_s, ln2_b,
            ff1_k.astype(dt), ff1_b.astype(dt),
            ff2_k.astype(dt), ff2_b.astype(dt),
        )


class CorrectionModel(nn.Module):
    """bases [B,R,L] int (vocab 0-11), quals [B,R,L] f32 in [-1,1],
    support_idx [B,S] int32, support_mask [B,S] bool
    -> (info_logits [B,S], bases_logits [B,S,5])."""

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
        dt = cfg.compute_dtype
        B, R, L = bases.shape
        assert R == N_ROWS, f"expected {N_ROWS} pileup rows, got {R}"
        V1 = VOCAB_SIZE + 1

        # col_proj is a dense over the per-column feature vector
        # concat_r(one_hot(base_r), qual_r) — kernel rows are ordered
        # r*(V+1)+v for the one-hot part and r*(V+1)+V for the qual scalar.
        # Evaluated by the fused entry kernel as two lane-aligned
        # contractions (the one-hot only ever exists in VMEM; a [B, L,
        # R*(V+1)] concat would lane-pad its 13-wide minor dim 10x on TPU).
        from ..ops.fused import entry_embed

        ck, cb = _DenseParams(
            (R * V1, cfg.d_model), (cfg.d_model,), name="col_proj"
        )()
        idx = np.arange(R * V1).reshape(R, V1)
        w_embT = ck[idx[:, :VOCAB_SIZE].reshape(-1)].T.astype(dt)  # [d, R*V]
        w_qT = ck[idx[:, VOCAB_SIZE]].T.astype(dt)  # [d, R]
        x = entry_embed(
            bases, quals.astype(jnp.float32), w_embT, w_qT,
            cb.astype(jnp.float32), dt,
        )  # [B, L, d]

        # Padding is always a suffix, so a per-example length suffices (and
        # positions are a static arange inside the attention op).
        mask = bases[:, 0, :] != TOKEN_PAD
        lengths = mask.astype(jnp.int32).sum(axis=1)

        block_cls = nn.remat(Block) if cfg.remat else Block
        for i in range(cfg.n_layers):
            x = block_cls(cfg, name=f"block_{i}")(x, lengths)

        # Gather supported columns FIRST: the final LayerNorm is per-token,
        # so it commutes with the gather — running it on [B, S, d] instead of
        # [B, L, d] cuts its traffic ~36x at production widths (S=256,
        # L~9216), identical outputs (heads only ever read gathered columns).
        gathered = jnp.take_along_axis(x, support_idx[..., None], axis=1)
        gathered = nn.LayerNorm(dtype=dt, name="ln_f")(gathered)
        gathered = gathered.astype(jnp.float32)

        bases_logits = nn.Dense(5, dtype=jnp.float32, name="bases_head")(gathered)
        info_logits = nn.Dense(1, dtype=jnp.float32, name="info_head")(gathered)[..., 0]

        neg = jnp.float32(-1e9)
        bases_logits = jnp.where(support_mask[..., None], bases_logits, neg)
        info_logits = jnp.where(support_mask, info_logits, neg)
        return info_logits, bases_logits


def init_params(cfg: ModelConfig, rng: jax.Array, max_len: int = 64, max_sup: int = 8):
    model = CorrectionModel(cfg)
    bases = jnp.full((1, N_ROWS, max_len), TOKEN_PAD, dtype=jnp.uint8)
    bases = bases.at[:, 0, :].set(0)
    quals = jnp.zeros((1, N_ROWS, max_len), dtype=jnp.float32)
    sidx = jnp.zeros((1, max_sup), dtype=jnp.int32)
    smask = jnp.ones((1, max_sup), dtype=bool)
    return model.init(rng, bases, quals, sidx, smask)

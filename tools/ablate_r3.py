"""Round-3 on-chip ablation: attribute the fused-step time per component.

Times structural variants of the correction model (attention / FFN / LN /
rope / counting disabled independently) with the DCE/memoization-proof
chained methodology from bench._chip_only. Run on the real chip:

    python tools/ablate_r3.py [B] [L] [S]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

sys.path.insert(0, "/root/repo")

from herro_tpu.constants import N_ROWS, QUAL_OFFSET, QUAL_SCALE, TOKEN_PAD, VOCAB_SIZE
from herro_tpu.models.model import ModelConfig, R10_CONFIG, _rope, _rope_tables
from herro_tpu.ops.consensus import count_decisions_jnp
from herro_tpu.pipeline.batching import unpack_tokens_jnp
from __graft_entry__ import _example_batch


class VarAttention(nn.Module):
    cfg: ModelConfig
    use_rope: bool = True

    @nn.compact
    def __call__(self, x, lengths, rope):
        from herro_tpu.ops.attention import attention as attn_op

        cfg = self.cfg
        B, L, _ = x.shape
        h, dh = cfg.n_heads, cfg.d_model // cfg.n_heads
        qkv = nn.DenseGeneral((3, h, dh), axis=-1, dtype=cfg.compute_dtype, name="qkv")(x)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if self.use_rope:
            q = _rope(q, rope)
            k = _rope(k, rope)
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


class VarBlock(nn.Module):
    cfg: ModelConfig
    use_attn: bool = True
    use_ffn: bool = True
    use_ln: bool = True
    use_rope: bool = True
    qkv_only: bool = False  # qkv/out projections but identity mixing

    @nn.compact
    def __call__(self, x, lengths, rope):
        cfg = self.cfg
        y = nn.LayerNorm(dtype=cfg.compute_dtype, name="ln1")(x) if self.use_ln else x
        if self.use_attn:
            x = x + VarAttention(cfg, use_rope=self.use_rope, name="attn")(y, lengths, rope)
        elif self.qkv_only:
            h, dh = cfg.n_heads, cfg.d_model // cfg.n_heads
            qkv = nn.DenseGeneral((3, h, dh), axis=-1, dtype=cfg.compute_dtype, name="qkv")(y)
            B, L, _ = x.shape
            o = qkv[:, :, 0].reshape(B, L, -1)
            x = x + nn.Dense(cfg.d_model, dtype=cfg.compute_dtype, name="out")(o)
        y = nn.LayerNorm(dtype=cfg.compute_dtype, name="ln2")(x) if self.use_ln else x
        if self.use_ffn:
            y = nn.Dense(cfg.d_ff, dtype=cfg.compute_dtype, name="ff1")(y)
            y = nn.gelu(y)
            y = nn.Dense(cfg.d_model, dtype=cfg.compute_dtype, name="ff2")(y)
            x = x + y
        return x


class VarModel(nn.Module):
    cfg: ModelConfig
    n_layers: int = 8
    use_attn: bool = True
    use_ffn: bool = True
    use_ln: bool = True
    use_rope: bool = True
    qkv_only: bool = False

    @nn.compact
    def __call__(self, bases, quals, support_idx, support_mask):
        cfg = self.cfg
        B, L, R = bases.shape
        onehot = jax.nn.one_hot(bases, VOCAB_SIZE, dtype=cfg.compute_dtype)
        q = quals[..., None].astype(cfg.compute_dtype)
        col = jnp.concatenate([onehot, q], axis=-1).reshape(B, L, R * (VOCAB_SIZE + 1))
        x = nn.Dense(cfg.d_model, dtype=cfg.compute_dtype, name="col_proj")(col)

        mask = bases[:, :, 0] != TOKEN_PAD
        lengths = mask.astype(jnp.int32).sum(axis=1)
        positions = jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1
        rope = _rope_tables(positions, cfg.d_model // cfg.n_heads // 2, cfg.compute_dtype)
        for i in range(self.n_layers):
            x = VarBlock(
                cfg,
                use_attn=self.use_attn,
                use_ffn=self.use_ffn,
                use_ln=self.use_ln,
                use_rope=self.use_rope,
                qkv_only=self.qkv_only,
                name=f"block_{i}",
            )(x, lengths, rope)
        x = nn.LayerNorm(dtype=cfg.compute_dtype, name="ln_f")(x)
        gathered = jnp.take_along_axis(x, support_idx[..., None], axis=1).astype(jnp.float32)
        bases_logits = nn.Dense(5, dtype=jnp.float32, name="bases_head")(gathered)
        return jnp.where(support_mask[..., None], bases_logits, -1e9)


def time_variant(name, model_kwargs, B, L, S, n=10, counting=True, model=True):
    cfg = R10_CONFIG
    m = VarModel(cfg, **model_kwargs) if model else None

    def step(params, tokens_packed, quals_u8, sidx, smask, n_alns):
        tokens = unpack_tokens_jnp(tokens_packed, N_ROWS)
        outs = []
        if model:
            quals = QUAL_SCALE * quals_u8.astype(jnp.float32) - QUAL_OFFSET
            logits = m.apply(params, tokens, quals, sidx, smask)
            outs.append(jnp.argmax(logits, axis=-1).astype(jnp.uint8))  # [B,S]
        if counting:
            outs.append(count_decisions_jnp(tokens, n_alns))  # [B,L]
        return outs

    if model:
        tk, qu, si, sm, na = (jnp.asarray(v) for v in _example_batch(2, 256, 16, seed=0))
        params = m.init(
            jax.random.PRNGKey(0), unpack_tokens_jnp(tk, N_ROWS),
            qu.astype(jnp.float32), si, sm,
        )
    else:
        params = {}

    def chained(params, tok, quals, sidx, smask, n_alns):
        def body(i, t):
            outs = step(params, t, quals, sidx, smask, n_alns)
            mix = jnp.zeros((t.shape[0],), jnp.uint8)
            for o in outs:
                mix = mix + (jnp.sum(o.astype(jnp.int32), axis=-1) % 13).astype(jnp.uint8)
            t = t.at[:, 0, 2].set(mix)
            t = t.at[:, :, 1].set(((t[:, :, 1].astype(jnp.int32) + i + 1) % 251).astype(jnp.uint8))
            return t
        return jax.lax.fori_loop(0, n, body, tok)

    f = jax.jit(chained)
    sets = []
    for seed in (3, 4):
        arrs = _example_batch(B, L, S, seed=seed)
        sets.append([jax.device_put(jnp.asarray(x)) for x in arrs])
    t0 = time.perf_counter()
    np.asarray(f(params, *sets[0]))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(f(params, *sets[1]))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:28s} {dt*1e3:8.2f} ms/step  ({B/dt:7.1f} w/s)  [compile+warm {tc:.0f}s]", flush=True)
    return dt


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 4608
    S = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    print(f"ablation at B={B} L={L} S={S}  backend={jax.default_backend()}", flush=True)

    time_variant("full", dict(), B, L, S)
    time_variant("model_only(no counting)", dict(), B, L, S, counting=False)
    time_variant("counting_only", dict(), B, L, S, model=False)
    time_variant("no_attention", dict(use_attn=False), B, L, S, counting=False)
    time_variant("qkv_proj_only(no mix/rope)", dict(use_attn=False, qkv_only=True), B, L, S, counting=False)
    time_variant("no_ffn", dict(use_ffn=False), B, L, S, counting=False)
    time_variant("no_ln", dict(use_ln=False), B, L, S, counting=False)
    time_variant("no_rope", dict(use_rope=False), B, L, S, counting=False)
    time_variant("0_layers", dict(n_layers=0), B, L, S, counting=False)


if __name__ == "__main__":
    main()

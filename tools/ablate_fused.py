"""On-chip ablation of the row-major fused step (round 3).

Times (a) the full correct_step, (b) structural variants with one component
removed, and (c) each fused op standalone at layer shapes — all with the
DCE/memoization-proof chained methodology from bench._chip_only.

    python tools/ablate_fused.py [B] [L] [S]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from herro_tpu.constants import N_ROWS, QUAL_OFFSET, QUAL_SCALE, TOKEN_PAD, VOCAB_SIZE
from herro_tpu.models.model import R10_CONFIG, CorrectionModel, init_params
from herro_tpu.ops import fused
from herro_tpu.ops.consensus import count_decisions_jnp
from herro_tpu.pipeline.batching import unpack_tokens_jnp
from __graft_entry__ import _example_batch


def _time_chained(f, args, n, label):
    """Compile f(*args) (a chained n-iteration program) and time the second
    dispatch on distinct data."""
    t0 = time.perf_counter()
    np.asarray(jax.jit(f)(*args[0]))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(jax.jit(f)(*args[1]))
    dt = (time.perf_counter() - t0) / n
    print(f"{label:34s} {dt*1e3:8.2f} ms/iter  [compile+warm {tc:.0f}s]", flush=True)
    return dt


def step_variant(B, L, S, n=10, *, attn=True, ffn=True, counting=True,
                 entry=True, layers=None, qkv_only=False, heads=True,
                 final_ln=True, label=""):
    cfg = R10_CONFIG
    model = CorrectionModel(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0))

    n_layers = cfg.n_layers if layers is None else layers

    import flax.linen as nn

    from herro_tpu.models.model import Block, _LNParams

    def fwd(params, tokens, quals, sidx, smask):
        # re-implement CorrectionModel.__call__ with toggles, reusing params
        cfg_ = cfg
        dt = cfg_.compute_dtype
        Bb, R, Ll = tokens.shape
        V1 = VOCAB_SIZE + 1

        p = params["params"]
        ck = p["col_proj"]["kernel"]
        cb = p["col_proj"]["bias"]
        idx = np.arange(R * V1).reshape(R, V1)
        w_emb = ck[idx[:, :VOCAB_SIZE].reshape(-1)].astype(dt)
        w_q = ck[idx[:, VOCAB_SIZE]].astype(dt)

        if entry:
            x = fused.entry_embed(
                tokens, quals.astype(jnp.float32), w_emb.T, w_q.T,
                cb.astype(jnp.float32), dt,
            )
        else:
            x = jnp.zeros((Bb, Ll, cfg_.d_model), dt) + quals[:, 0, :, None].astype(dt)

        mask = tokens[:, 0, :] != TOKEN_PAD
        lengths = mask.astype(jnp.int32).sum(axis=1)

        h, dh = cfg_.n_heads, cfg_.d_model // cfg_.n_heads
        for i in range(n_layers):
            bp = p[f"block_{i}"]
            ln1_s, ln1_b = bp["ln1"]["scale"], bp["ln1"]["bias"]
            qkv_k, qkv_b = bp["attn"]["qkv"]["kernel"], bp["attn"]["qkv"]["bias"]
            out_k, out_b = bp["attn"]["out"]["kernel"], bp["attn"]["out"]["bias"]
            if attn and qkv_only:
                # qkv projection runs, flash+outproj skipped: isolates the
                # ln_qkv_rope half of the attention stack in-step.
                q_, k_, v_ = fused.ln_qkv_rope(
                    x, ln1_s, ln1_b,
                    qkv_k.reshape(cfg_.d_model, 3 * h * dh).astype(dt),
                    qkv_b.reshape(3 * h * dh).astype(dt),
                    h,
                )
                mix = q_.sum(axis=(1, 3)) + k_.sum(axis=(1, 3)) + v_.sum(
                    axis=(1, 3)
                )
                x = x + (mix[:, :, None] * 1e-6).astype(dt)
            elif attn:
                x = fused.attention_block(
                    x, ln1_s, ln1_b,
                    qkv_k.reshape(cfg_.d_model, 3 * h * dh).astype(dt),
                    qkv_b.reshape(3 * h * dh).astype(dt),
                    out_k.reshape(h, dh, cfg_.d_model).astype(dt),
                    out_b.astype(dt),
                    lengths, h, cfg_.local_window,
                )
            if ffn:
                x = fused.ln_ffn(
                    x, bp["ln2"]["scale"], bp["ln2"]["bias"],
                    bp["ff1"]["kernel"].astype(dt), bp["ff1"]["bias"].astype(dt),
                    bp["ff2"]["kernel"].astype(dt), bp["ff2"]["bias"].astype(dt),
                )
        if not heads:
            # cheapest possible consumption of x with the right output shapes
            Sn = sidx.shape[1]
            info = x[:, :Sn, 0].astype(jnp.float32)
            logits = x[:, :Sn, :5].astype(jnp.float32)
            return info, logits
        # production order (models/model.py): gather supported columns FIRST,
        # then LN on [B, S, d] — final LN commutes with the per-token gather
        g = jnp.take_along_axis(x, sidx[..., None], axis=1)
        if final_ln:
            xf = g.astype(jnp.float32)
            mu = xf.mean(-1, keepdims=True)
            var = jnp.maximum((xf * xf).mean(-1, keepdims=True) - mu * mu, 0.0)
            y = (xf - mu) * jax.lax.rsqrt(var + 1e-6)
            y = y * p["ln_f"]["scale"] + p["ln_f"]["bias"]
            g = y.astype(dt)
        g = g.astype(jnp.float32)
        logits = g @ p["bases_head"]["kernel"] + p["bases_head"]["bias"]
        info = (g @ p["info_head"]["kernel"] + p["info_head"]["bias"])[..., 0]
        return info, logits

    def chained(params, tok, quals, sidx, smask, n_alns):
        def body(i, t):
            tokens = unpack_tokens_jnp(t, N_ROWS)
            q = QUAL_SCALE * quals.astype(jnp.float32) - QUAL_OFFSET
            info, logits = fwd(params, tokens, q, sidx, smask)
            classes = jnp.argmax(logits, -1).astype(jnp.uint8)
            mix = (
                jnp.sum(classes.astype(jnp.int32), axis=1)
                + jnp.sum(info.astype(jnp.float32), axis=1).astype(jnp.int32)
            )
            if counting:
                dec = count_decisions_jnp(tokens, n_alns)
                mix = mix + jnp.sum(dec.astype(jnp.int32), axis=1)
            mix = (mix % 13).astype(jnp.uint8)
            t = t.at[:, 2, 0].set(mix)
            t = t.at[:, 1, :].set(
                ((t[:, 1, :].astype(jnp.int32) + i + 1) % 251).astype(jnp.uint8)
            )
            return t
        return jax.lax.fori_loop(0, n, body, tok)

    sets = []
    for seed in (3, 4):
        arrs = _example_batch(B, L, S, seed=seed)
        sets.append([params] + [jax.device_put(jnp.asarray(x)) for x in arrs])
    return _time_chained(chained, sets, n, label)


def op_standalone(which, B, L, n=20):
    """One fused op chained at layer shapes."""
    cfg = R10_CONFIG
    dt = jnp.bfloat16
    d, f = cfg.d_model, cfg.d_ff
    h = cfg.n_heads
    rng = np.random.default_rng(0)

    def mk(shape, scale=0.02):
        return jnp.asarray(rng.normal(0, scale, shape), dtype=dt)

    if which == "attention_block":
        w = mk((d, 3 * d)); b = mk((3 * d,))
        wo = mk((h, d // h, d)); bo = mk((d,))
        s = jnp.ones((d,), jnp.float32); bb = jnp.zeros((d,), jnp.float32)
        lengths = jnp.full((B,), L, jnp.int32)

        def chained(x):
            def body(i, x):
                y = fused.attention_block(
                    x, s, bb, w, b, wo, bo, lengths, h, cfg.local_window
                )
                return y + (i % 7).astype(dt) * 1e-6
            return jax.lax.fori_loop(0, n, body, x)
    elif which == "ln_ffn":
        w1 = mk((d, f)); b1 = mk((f,))
        w2 = mk((f, d)); b2 = mk((d,))
        s = jnp.ones((d,), jnp.float32); bb = jnp.zeros((d,), jnp.float32)

        def chained(x):
            def body(i, x):
                return fused.ln_ffn(x, s, bb, w1, b1, w2, b2) + (
                    i % 7
                ).astype(dt) * 1e-6
            return jax.lax.fori_loop(0, n, body, x)
    elif which == "counting":
        from herro_tpu.ops.consensus import count_decisions

        def chained(tok):
            def body(i, t):
                dec = count_decisions(t, jnp.full((B,), 30, jnp.int32))
                return t.at[:, 0, :].set(dec)
            return jax.lax.fori_loop(0, n, body, tok)

        sets = []
        for seed in (3, 4):
            r = np.random.default_rng(seed)
            sets.append([jnp.asarray(r.integers(0, 12, (B, N_ROWS, L), dtype=np.uint8))])
        return _time_chained(chained, sets, n, which)

    sets = []
    for seed in (3, 4):
        r = np.random.default_rng(seed)
        sets.append([jnp.asarray(r.normal(0, 1, (B, L, d)), dtype=dt)])
    return _time_chained(chained, sets, n, which)


def skeleton(B, L, S):
    """Decompose the 0-layer skeleton (round-5: 15.8 ms at B=32 L=9216 — as
    large as either attention half): final LN, gather+heads, entry, and the
    chained-harness floor (unpack + qual normalise + carry updates)."""
    full0 = step_variant(B, L, S, layers=0, counting=False,
                         label="0 layers (entry+LNf+heads)")
    no_lnf = step_variant(B, L, S, layers=0, counting=False, final_ln=False,
                          label="0 layers, no final LN")
    no_heads = step_variant(B, L, S, layers=0, counting=False, heads=False,
                            label="0 layers, no LNf/heads")
    floor = step_variant(B, L, S, layers=0, counting=False, heads=False,
                         entry=False, label="harness floor (no entry)")
    print(f"\nfinal LN = {(full0 - no_lnf)*1e3:.2f} ms")
    print(f"gather+heads = {(no_lnf - no_heads)*1e3:.2f} ms")
    print(f"entry embed = {(no_heads - floor)*1e3:.2f} ms")
    print(f"harness floor (unpack+qual+carry) = {floor*1e3:.2f} ms")


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 4608
    S = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    print(f"fused ablation B={B} L={L} S={S} backend={jax.default_backend()}",
          flush=True)
    if "--skeleton" in sys.argv:
        skeleton(B, L, S)
        return

    full = step_variant(B, L, S, label="full step")
    no_cnt = step_variant(B, L, S, counting=False, label="no counting")
    no_attn = step_variant(B, L, S, attn=False, counting=False, label="no attention(+ln_mm)")
    qkv_o = step_variant(B, L, S, counting=False, qkv_only=True, label="qkv only (no flash)")
    no_ffn = step_variant(B, L, S, ffn=False, counting=False, label="no ffn")
    zero_layers = step_variant(B, L, S, layers=0, counting=False, label="0 layers (entry+heads)")
    no_entry = step_variant(B, L, S, entry=False, counting=False, label="no entry embed")

    print(f"\ncounting = {(full - no_cnt)*1e3:.2f} ms")
    print(f"attention stack = {(no_cnt - no_attn)*1e3:.2f} ms")
    print(f"  qkv half = {(qkv_o - no_attn)*1e3:.2f} ms, flash half = {(no_cnt - qkv_o)*1e3:.2f} ms")
    print(f"ffn stack = {(no_cnt - no_ffn)*1e3:.2f} ms")
    print(f"entry = {(no_cnt - no_entry)*1e3:.2f} ms; entry+heads = {zero_layers*1e3:.2f} ms")


if __name__ == "__main__":
    main()

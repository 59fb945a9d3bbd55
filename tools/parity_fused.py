"""On-chip parity + timing for the fused pallas kernels (ops/fused.py).

Compares each pallas kernel against its jnp twin *on the same device* (the
twin is the CPU-tested oracle; tests/test_model.py pins its semantics), then
times the fused correct step with bench._chip_only's DCE/memoization-proof
chained method.

    python tools/parity_fused.py          # parity + timing
    python tools/parity_fused.py parity   # parity only
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def _max_abs(a, b):
    return float(np.max(np.abs(np.float32(a) - np.float32(b))))


def parity():
    from herro_tpu.ops import fused
    from herro_tpu.ops.consensus import count_decisions_jnp

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    B, L, d, H, D = 4, 1024, 256, 2, 128
    R, V = 31, 12
    f = 1024

    # entry_embed
    bases = rng.integers(0, 12, (B, R, L)).astype(np.uint8)
    quals = rng.uniform(-1, 1, (B, R, L)).astype(np.float32)
    w_embT = jnp.asarray(rng.normal(0, 0.05, (d, R * V)), dtype=dt)
    w_qT = jnp.asarray(rng.normal(0, 0.05, (d, R)), dtype=dt)
    cb = jnp.asarray(rng.normal(0, 0.1, (d,)), dtype=jnp.float32)
    e_p = jax.jit(lambda *a: fused._entry_embed_pallas(*a, dt))(
        bases, quals, w_embT, w_qT, cb
    )
    e_j = jax.jit(lambda *a: fused._entry_embed_jnp(*a, dt))(
        bases, quals, w_embT, w_qT, cb
    )
    err = _max_abs(e_p, e_j)
    print(f"entry_embed          max_abs {err:.4f}")
    assert err < 0.05, err

    # count_decisions: exact
    tok = rng.integers(0, 12, (B, R, L)).astype(np.uint8)
    na = rng.integers(0, 31, (B,)).astype(np.int32)
    c_p = np.asarray(jax.jit(fused.count_decisions_pallas)(tok, na))
    c_j = np.asarray(jax.jit(count_decisions_jnp)(jnp.asarray(tok), jnp.asarray(na)))
    print(f"count_decisions      exact: {np.array_equal(c_p, c_j)}")
    assert np.array_equal(c_p, c_j)

    # ln_qkv_rope (+ int8 variant)
    x = jnp.asarray(rng.normal(0, 1, (B, L, d)), dtype=dt)
    s = jnp.asarray(rng.normal(1, 0.1, (d,)), dtype=jnp.float32)
    bb = jnp.asarray(rng.normal(0, 0.1, (d,)), dtype=jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.05, (d, 3 * H * D)), dtype=dt)
    bq = jnp.asarray(rng.normal(0, 0.05, (3 * H * D,)), dtype=dt)
    qp, kp, vp = jax.jit(lambda *a: fused._ln_qkv_rope_pallas(*a, H))(x, s, bb, w, bq)
    qj, kj, vj = jax.jit(lambda *a: fused._ln_qkv_rope_jnp(*a, H))(x, s, bb, w, bq)
    err = max(_max_abs(qp, qj), _max_abs(kp, kj), _max_abs(vp, vj))
    print(f"ln_qkv_rope          max_abs {err:.4f}")
    assert err < 0.05, err

    w_i8, s_col = fused.quantize_weight(w)
    o_p = jax.jit(lambda *a: fused._ln_qkv_rope_q_pallas(*a, H))(
        x, s, bb, w_i8, s_col, bq
    )
    o_j = jax.jit(lambda *a: fused._ln_qkv_rope_q_jnp(*a, H))(
        x, s, bb, w_i8, s_col, bq
    )
    err = max(_max_abs(a, b) for a, b in zip(o_p, o_j))
    print(f"ln_qkv_rope_q        max_abs {err:.4f} (pallas vs int8 twin)")
    assert err < 0.05, err

    # flash_outproj over the roped q/k/v
    wo = jnp.asarray(rng.normal(0, 0.05, (H, D, d)), dtype=dt)
    bo = jnp.asarray(rng.normal(0, 0.05, (d,)), dtype=dt)
    lens = [L, L - 300, L - 511, 700]
    lengths = jnp.asarray(lens, dtype=jnp.int32)
    for lw in (None, 256):
        a_p = np.float32(
            jax.jit(lambda *a: fused._flash_outproj_pallas(*a, lw))(
                qp, kp, vp, x, wo, bo, lengths
            )
        )
        a_j = np.float32(
            jax.jit(lambda *a: fused._flash_outproj_jnp(*a, lw))(
                qj, kj, vj, x, wo, bo, lengths
            )
        )
        err = max(
            _max_abs(a_p[i, :ln], a_j[i, :ln]) for i, ln in enumerate(lens)
        )
        print(f"flash_outproj lw={lw}  max_abs {err:.4f}")
        assert err < 0.06, err

    # ln_ffn (+ int8)
    w1 = jnp.asarray(rng.normal(0, 0.05, (d, f)), dtype=dt)
    b1 = jnp.asarray(rng.normal(0, 0.05, (f,)), dtype=dt)
    w2 = jnp.asarray(rng.normal(0, 0.05, (f, d)), dtype=dt)
    b2 = jnp.asarray(rng.normal(0, 0.05, (d,)), dtype=dt)
    xf = x.reshape(-1, d)
    f_p = jax.jit(fused._ln_ffn_pallas)(xf, s, bb, w1, b1, w2, b2)
    f_j = jax.jit(fused._ln_ffn_jnp)(xf, s, bb, w1, b1, w2, b2)
    err = _max_abs(f_p, f_j)
    print(f"ln_ffn               max_abs {err:.4f}")
    assert err < 0.06, err

    w1_i8, s1 = fused.quantize_weight(w1)
    w2_i8, s2 = fused.quantize_weight(w2)
    fq_p = jax.jit(fused._ln_ffn_q_pallas)(xf, s, bb, w1_i8, s1, b1, w2_i8, s2, b2)
    fq_j = jax.jit(fused._ln_ffn_q_jnp)(xf, s, bb, w1_i8, s1, b1, w2_i8, s2, b2)
    err = _max_abs(fq_p, fq_j)
    print(f"ln_ffn_q             max_abs {err:.4f} (pallas vs int8 twin)")
    # int8 variants: dynamic-quant rounding differences of one bf16 ULP at
    # |x|~8-16 are expected between the pallas and jnp formulations
    assert err < 0.1, err

    # full model forward: pallas path vs jnp twins, same params/inputs
    from herro_tpu.constants import N_ROWS, TOKEN_PAD
    from herro_tpu.models.model import R10_CONFIG, CorrectionModel, init_params

    cfg = R10_CONFIG
    params = init_params(cfg, jax.random.PRNGKey(0))
    model = CorrectionModel(cfg)
    B2, L2, S2 = 4, 1024, 64
    mb = rng.integers(0, 11, size=(B2, N_ROWS, L2)).astype(np.uint8)
    mb[:, 0, :] = rng.integers(0, 5, size=(B2, L2))
    mb[2, :, L2 - 300 :] = TOKEN_PAD
    mq = rng.uniform(-1, 1, size=(B2, N_ROWS, L2)).astype(np.float32)
    mq[2, :, L2 - 300 :] = 0
    sidx = np.sort(rng.integers(0, L2 - 300, size=(B2, S2)), axis=1).astype(np.int32)
    smask = np.ones((B2, S2), dtype=bool)

    info_p, logit_p = jax.jit(model.apply)(params, mb, mq, sidx, smask)
    import herro_tpu.ops.fused as fz

    orig = fz._use_pallas
    fz._use_pallas = lambda: False
    try:
        info_j, logit_j = jax.jit(model.apply)(params, mb, mq, sidx, smask)
    finally:
        fz._use_pallas = orig
    agree = float(
        np.mean(
            np.argmax(np.asarray(logit_p), -1) == np.argmax(np.asarray(logit_j), -1)
        )
    )
    print(
        f"model fwd            logits max_abs {_max_abs(logit_p, logit_j):.4f}  "
        f"argmax agree {agree:.4f}"
    )
    assert agree > 0.995, agree
    print("PARITY OK")


def timing():
    from bench import _chip_only

    for B, L, S in ((64, 4608, 128), (32, 9216, 256)):
        ws = _chip_only(B, L, S)
        print(
            f"chip_only B={B} L={L} S={S}: {ws:.1f} windows/s "
            f"({B / ws * 1e3:.1f} ms/step)",
            flush=True,
        )


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}", flush=True)
    parity()
    if len(sys.argv) <= 1 or sys.argv[1] != "parity":
        timing()

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


def _rel_err(a, b):
    a = np.asarray(a, dtype=np.float32)
    b = np.asarray(b, dtype=np.float32)
    denom = np.maximum(np.abs(b), 1e-3)
    return float(np.max(np.abs(a - b) / denom))


def parity():
    from herro_tpu.ops import fused

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    T, d, f = 2048, 256, 1024

    x = jnp.asarray(rng.normal(size=(T, d)), dtype=dt)
    scale = jnp.asarray(rng.normal(size=(d,)), dtype=jnp.float32)
    bias = jnp.asarray(rng.normal(size=(d,)), dtype=jnp.float32)
    w = jnp.asarray(rng.normal(size=(d, f)) * 0.05, dtype=dt)
    b = jnp.asarray(rng.normal(size=(f,)), dtype=dt)

    out_p = np.asarray(jax.jit(fused._ln_matmul_pallas)(x, scale, bias, w, b))
    out_j = np.asarray(jax.jit(fused._ln_matmul_jnp)(x, scale, bias, w, b))
    e = _rel_err(out_p, out_j)
    print(f"ln_matmul   rel_err {e:.4f}")
    assert e < 0.05, e

    w1 = jnp.asarray(rng.normal(size=(d, f)) * 0.05, dtype=dt)
    b1 = jnp.asarray(rng.normal(size=(f,)), dtype=dt)
    w2 = jnp.asarray(rng.normal(size=(f, d)) * 0.05, dtype=dt)
    b2 = jnp.asarray(rng.normal(size=(d,)), dtype=dt)
    out_p = np.asarray(
        jax.jit(fused._ln_ffn_pallas)(x, scale, bias, w1, b1, w2, b2)
    )
    out_j = np.asarray(
        jax.jit(fused._ln_ffn_jnp)(x, scale, bias, w1, b1, w2, b2)
    )
    e = _rel_err(out_p, out_j)
    print(f"ln_ffn      rel_err {e:.4f}")
    assert e < 0.05, e

    B, L, H, D = 4, 1024, 8, 32
    for lw in (None, 256):
        qkv = jnp.asarray(rng.normal(size=(B, L, 3 * H * D)), dtype=dt)
        lengths = jnp.asarray([L, L - 300, L - 511, 700], dtype=jnp.int32)
        out_p = np.asarray(
            jax.jit(lambda q, l: fused._rope_attention_pallas(q, l, H, lw))(
                qkv, lengths
            )
        )
        out_j = np.asarray(
            jax.jit(lambda q, l: fused._rope_attention_jnp(q, l, H, lw))(
                qkv, lengths
            )
        )
        # compare only valid columns (padding columns are don't-care)
        errs = []
        for i, ln in enumerate([L, L - 300, L - 511, 700]):
            errs.append(_rel_err(out_p[i, :ln], out_j[i, :ln]))
        e = max(errs)
        print(f"rope_attn   local_window={lw}  rel_err {e:.4f}")
        assert e < 0.08, e

    # int8 kernels: pallas vs jnp twin (identical int32 math -> tight), and
    # int8 vs the bf16 op (quantization error must stay small)
    w_i8, s_col = fused.quantize_weight(w)
    out_qp = np.asarray(
        jax.jit(fused._ln_matmul_q_pallas)(x, scale, bias, w_i8, s_col, b)
    )
    out_qj = np.asarray(
        jax.jit(fused._ln_matmul_q_jnp)(x, scale, bias, w_i8, s_col, b)
    )
    e = _rel_err(out_qp, out_qj)
    print(f"ln_matmul_q pallas-vs-twin rel_err {e:.4f}")
    assert e < 0.02, e
    eq = _rel_err(out_qj, out_j := np.asarray(
        jax.jit(fused._ln_matmul_jnp)(x, scale, bias, w, b)
    ))
    print(f"ln_matmul_q int8-vs-bf16   rel_err {eq:.4f}")

    w1_i8, s1 = fused.quantize_weight(w1)
    w2_i8, s2 = fused.quantize_weight(w2)
    out_qp = np.asarray(
        jax.jit(fused._ln_ffn_q_pallas)(
            x, scale, bias, w1_i8, s1, b1, w2_i8, s2, b2
        )
    )
    out_qj = np.asarray(
        jax.jit(fused._ln_ffn_q_jnp)(
            x, scale, bias, w1_i8, s1, b1, w2_i8, s2, b2
        )
    )
    e = _rel_err(out_qp, out_qj)
    print(f"ln_ffn_q    pallas-vs-twin rel_err {e:.4f}")
    assert e < 0.02, e

    # full model forward: pallas path vs jnp twins, same params/inputs
    from herro_tpu.models.model import R10_CONFIG, CorrectionModel, init_params
    from herro_tpu.constants import N_ROWS, TOKEN_PAD

    cfg = R10_CONFIG
    params = init_params(cfg, jax.random.PRNGKey(0))
    model = CorrectionModel(cfg)
    B, L, S = 4, 1024, 64
    bases = rng.integers(0, 11, size=(B, N_ROWS, L)).astype(np.uint8)
    bases[:, 0, :] = rng.integers(0, 5, size=(B, L))
    bases[2, :, L - 300 :] = TOKEN_PAD
    quals = rng.uniform(-1, 1, size=(B, N_ROWS, L)).astype(np.float32)
    quals[2, :, L - 300 :] = 0
    sidx = np.sort(rng.integers(0, L - 300, size=(B, S)), axis=1).astype(np.int32)
    smask = np.ones((B, S), dtype=bool)

    f_pallas = jax.jit(model.apply)
    info_p, logit_p = f_pallas(params, bases, quals, sidx, smask)

    import herro_tpu.ops.fused as fz

    orig = fz._use_pallas
    fz._use_pallas = lambda: False
    try:
        f_twin = jax.jit(model.apply)
        info_j, logit_j = f_twin(params, bases, quals, sidx, smask)
    finally:
        fz._use_pallas = orig
    e1 = _rel_err(info_p, info_j)
    e2 = _rel_err(logit_p, logit_j)
    agree = float(
        np.mean(
            np.argmax(np.asarray(logit_p), -1) == np.argmax(np.asarray(logit_j), -1)
        )
    )
    print(f"model fwd   info rel_err {e1:.4f}  logits rel_err {e2:.4f}  "
          f"argmax agree {agree:.4f}")
    assert agree > 0.995, agree
    print("PARITY OK")


def timing():
    from bench import _chip_only

    for B, L, S in ((64, 4608, 128), (32, 9216, 256)):
        ws = _chip_only(B, L, S)
        print(f"chip_only B={B} L={L} S={S}: {ws:.1f} windows/s "
              f"({B / ws * 1e3:.1f} ms/step)", flush=True)


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}", flush=True)
    parity()
    if len(sys.argv) <= 1 or sys.argv[1] != "parity":
        timing()

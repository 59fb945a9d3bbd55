"""Regenerate the frozen model-output (logit) golden fixture.

Run from the repo root:  python tests/make_logit_golden.py

Freezes the flagship checkpoint's logits on a small fixed feature batch so a
silent numeric regression anywhere in the model stack (embedding contraction,
fused LN/FFN/attention kernels and their jnp twins, quantization, checkpoint
(de)serialisation) surfaces in seconds instead of as a quality drop in a slow
eval — porting the intent of the reference's bit-rotted TorchScript golden
tests (src/inference.rs:302-410; the reference ran its blob on saved feature
fixtures and compared saved logits).

The fixture freezes the *inputs too* (tensorized tokens/quals/support), so it
is independent of featurization drift (tests/golden/featgen_v3.npz covers
that axis byte-exactly).

Regenerate ONLY when the flagship checkpoint itself is intentionally
replaced (retrain/promotion) — any other diff here is a regression.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

L, S, B = 2048, 256, 4
CKPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "resources",
    "model_r10_sim",
)


def build_inputs():
    """A deterministic small batch off the featgen golden dataset."""
    from herro_tpu.pipeline.batching import collate, tensorize
    from tests.make_golden import build_windows
    from herro_tpu.features.extract import WindowFeatures

    wins = build_windows()
    keys = sorted(k[: -len("_bases")] for k in wins if k.endswith("_bases"))
    picked = []
    for key in keys:
        bases = wins[f"{key}_bases"]
        sup = np.zeros(
            wins[f"{key}_sup_pos"].shape[0],
            dtype=[("pos", np.uint16), ("ins", np.uint8)],
        )
        sup["pos"] = wins[f"{key}_sup_pos"]
        sup["ins"] = wins[f"{key}_sup_ins"]
        meta = wins[f"{key}_meta"]
        if bases.shape[0] > L or sup.shape[0] > S or sup.shape[0] == 0:
            continue
        rid, wid = (int(s) for s in key.split("_"))
        picked.append(
            WindowFeatures(
                rid=rid,
                wid=wid,
                n_alns=int(meta[0]),
                n_total_wins=int(meta[1]),
                bases=bases,
                quals=wins[f"{key}_quals"],
                supported=sup,
                qids=list(meta[2:]),
            )
        )
        if len(picked) == B:
            break
    assert len(picked) == B, f"only {len(picked)} fixture windows fit (need {B})"
    batch = collate([tensorize(wf) for wf in picked], L, S, B)
    return batch


def run_model(batch):
    """The raw model logits on the frozen batch, exactly as the fused step
    feeds them (packed-token unpack + qual normalisation included)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from herro_tpu.constants import N_ROWS, QUAL_OFFSET, QUAL_SCALE
    from herro_tpu.models.checkpoint import load_model
    from herro_tpu.models.model import CorrectionModel
    from herro_tpu.pipeline.batching import unpack_tokens_jnp

    cfg, params = load_model(CKPT)
    model = CorrectionModel(cfg)

    @jax.jit
    def fwd(params, tokens_packed, quals_u8, sidx, smask):
        tokens = unpack_tokens_jnp(tokens_packed, N_ROWS)
        quals = QUAL_SCALE * quals_u8.astype(jnp.float32) - QUAL_OFFSET
        return model.apply(params, tokens, quals, sidx, smask)

    info, logits = fwd(
        params,
        batch.tokens_packed,
        batch.quals,
        batch.support_idx,
        batch.support_mask,
    )
    return np.asarray(info), np.asarray(logits)


if __name__ == "__main__":
    batch = build_inputs()
    info, logits = run_model(batch)
    path = os.path.join(os.path.dirname(__file__), "golden", "logits_r10.npz")
    np.savez_compressed(
        path,
        tokens_packed=batch.tokens_packed,
        quals=batch.quals,
        support_idx=batch.support_idx,
        support_mask=batch.support_mask,
        n_alns=batch.n_alns,
        info=info,
        logits=logits,
    )
    print(f"wrote {path}: info {info.shape}, logits {logits.shape}")

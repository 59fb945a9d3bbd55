"""The jitted correction step and its runner.

One ``correct_step`` fuses, in a single XLA program per (B, L, S) bucket:

* qual normalisation to [-1, 1] (reference does this on device too,
  src/inference.rs:152-153);
* the transformer forward over the pileup;
* argmax over the 5-way logits at supported columns;
* the counting-rule consensus decision for every column
  (src/consensus.rs:177-218) — so the host only stitches bytes.

With a mesh, batches are sharded over the data axis via
``jax.sharding.NamedSharding``; parameters are replicated. XLA inserts the
(trivial, all-gather-free) collectives.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..constants import QUAL_OFFSET, QUAL_SCALE
from ..models.model import CorrectionModel, ModelConfig
from ..ops.consensus import DECISION_PAD, count_decisions
from .batching import Batch


@dataclass
class InFlight:
    """A dispatched-but-unfetched device batch."""

    batch: Batch
    outputs: tuple


@dataclass
class WindowResult:
    rid: int
    wid: int
    n_alns: int
    n_total_wins: int
    decisions: np.ndarray  # uint8 [L_true] final per-column classes
    info: np.ndarray | None = None  # f32 [n_sup] info logits (parity/debug)
    # pure counting-rule decisions (no model override); populated when the
    # runner's collect_counting flag is set — lets one pass emit both the
    # model and the counting-baseline decode on identical features.
    counting: np.ndarray | None = None


def make_correct_step(cfg: ModelConfig):
    """The fused step takes *packed* token nibble rows ([B, 16, L], see
    batching.collate — row-major so the long column axis sits on the TPU's
    128-lane minor dim) — host->device bytes are the engine's throughput
    limit on bandwidth-constrained links — and unpacks on device."""
    from ..constants import N_ROWS
    from .batching import unpack_tokens_jnp

    model = CorrectionModel(cfg)

    def step(params, tokens_packed, quals_u8, support_idx, support_mask, n_alns):
        tokens = unpack_tokens_jnp(tokens_packed, N_ROWS)  # [B, 31, L] uint8
        quals = (
            QUAL_SCALE * quals_u8.astype(jnp.float32) - QUAL_OFFSET
        )
        info, logits = model.apply(
            params, tokens, quals, support_idx, support_mask
        )
        classes = jnp.argmax(logits, axis=-1).astype(jnp.uint8)
        decisions = count_decisions(tokens, n_alns)
        return info, classes, decisions

    return step


def make_correct_step_packed(cfg: ModelConfig):
    """The runner's transport variant: (info, decisions‖classes [B, L+S]).

    Every ``np.asarray`` on a device output costs a tunnel round trip on
    remote-attached hosts (~40-100 ms each here); concatenating the two
    uint8 result planes on device halves the fetches per batch. ``info``
    stays separate — it is only fetched under ``collect_info``."""
    step = make_correct_step(cfg)

    def packed_step(params, tokens_packed, quals_u8, support_idx,
                    support_mask, n_alns):
        info, classes, decisions = step(
            params, tokens_packed, quals_u8, support_idx, support_mask, n_alns
        )
        return info, jnp.concatenate([decisions, classes], axis=1)

    return packed_step


class CorrectionRunner:
    """Owns parameters, the jit cache, and (optionally) a device mesh."""

    def __init__(
        self,
        cfg: ModelConfig,
        params,
        mesh: Mesh | None = None,
        collect_info: bool = False,
        counting_only: bool = False,
        collect_counting: bool = False,
        int8: bool | None = None,
    ):
        if int8 is not None and int8 != cfg.int8:
            import dataclasses

            cfg = dataclasses.replace(cfg, int8=int8)
        self.cfg = cfg
        self.mesh = mesh
        self.collect_info = collect_info
        # Also surface the pure counting decode per window (baseline decode
        # rides along for free — the fused step computes it regardless).
        self.collect_counting = collect_counting
        # Diagnostic: skip the model override at supported columns, leaving
        # the pure counting-rule decode everywhere (quantifies the model's
        # contribution vs the counting floor).
        self.counting_only = counting_only
        step = make_correct_step_packed(cfg)
        # True when a mesh step runs the fused (pallas-capable) kernels via
        # shard_map — both the DP and the TP layout do since round 5; the
        # dryrun asserts this so a regression to the GSPMD jnp slow path
        # can't land silently.
        self.tp_fast_path = False
        if mesh is not None:
            from ..parallel.tensor import param_shardings

            data = NamedSharding(mesh, P("data"))
            pshard = param_shardings(mesh, params)
            self.params = jax.device_put(params, pshard)
            tp = dict(zip(mesh.axis_names, mesh.devices.shape)).get("model", 1)
            if tp == 1:
                # Pure data parallelism: shard_map over the batch axis so
                # each device runs the step (including its pallas kernels)
                # on its local shard — GSPMD would treat pallas_call as an
                # unpartitionable custom call and gather the whole batch.
                from jax.experimental.shard_map import shard_map

                step = shard_map(
                    step,
                    mesh=mesh,
                    in_specs=(P(),) + (P("data"),) * 5,
                    out_specs=(P("data"),) * 2,
                    check_rep=False,
                )
            elif cfg.int8:
                # int8 + TP stays on GSPMD twin partitioning: the fast path
                # does not carry the quantized matmuls, and int8 is slower
                # than bf16 on this hardware anyway (ARCHITECTURE.md §7).
                import sys

                print(
                    f"[herro-tpu] tp={tp} with int8: GSPMD jnp twin kernels "
                    "(the fused TP fast path is bf16-only)",
                    file=sys.stderr,
                )
            else:
                # Tensor parallelism: shard_map over BOTH mesh axes with
                # Megatron head/d_ff partitioning, so the fused pallas
                # kernels run on local shards and one psum per half-block
                # recombines the stream (parallel/tensor.py).
                from ..parallel.tensor import make_tp_correct_step

                tp_step = make_tp_correct_step(cfg, mesh, params)

                def step(params, tok, quals, sidx, smask, n_alns,
                         _tp_step=tp_step):
                    info, classes, decisions = _tp_step(
                        params, tok, quals, sidx, smask, n_alns
                    )
                    return info, jnp.concatenate([decisions, classes], axis=1)

                self.tp_fast_path = True
            self._step = jax.jit(
                step,
                in_shardings=(pshard, data, data, data, data, data),
                out_shardings=(data, data),
            )
        else:
            # Pin params on device: checkpoints load as host numpy trees, and
            # passing those to a jitted step re-uploads them on every batch.
            self.params = jax.device_put(params)
            self._step = jax.jit(step)

    def dispatch(self, batch: Batch) -> "InFlight":
        """Enqueue the device step without waiting; JAX dispatch is async, so
        this returns immediately with device arrays. Pair with ``finalize`` —
        keeping 2+ batches in flight hides the host<->device round-trip and
        overlaps featgen with compute (the reference gets the same overlap
        from its dedicated inference thread, src/lib.rs:189-196)."""
        out = self._step(
            self.params,
            batch.tokens_packed,
            batch.quals,
            batch.support_idx,
            batch.support_mask,
            batch.n_alns,
        )
        return InFlight(batch, out)

    def finalize(self, inflight: "InFlight") -> list[WindowResult]:
        """Fetch a dispatched batch's results (blocks) and unpack them."""
        return self._unpack(inflight.batch, *inflight.outputs)

    def run_batch(self, batch: Batch) -> list[WindowResult]:
        return self.finalize(self.dispatch(batch))

    def _unpack(self, batch: Batch, info, packed) -> list[WindowResult]:
        # one fetch for both result planes: [B, L + S] = decisions || classes
        packed = np.asarray(packed)
        S = batch.support_idx.shape[1]
        decisions = packed[:, :-S]
        classes = packed[:, -S:]
        info = np.asarray(info) if self.collect_info else None

        out = []
        for i, w in enumerate(batch.windows):
            l, s = w.length, w.n_supported
            counting = decisions[i, :l].copy()
            if self.counting_only:
                dec = counting
            else:
                # Model verdicts override counting at supported columns.
                dec = counting.copy() if self.collect_counting else counting
                dec[w.support_flat] = classes[i, :s]
            out.append(
                WindowResult(
                    rid=w.rid,
                    wid=w.wid,
                    n_alns=w.n_alns,
                    n_total_wins=w.n_total_wins,
                    decisions=dec,
                    info=info[i, :s].copy() if info is not None else None,
                    counting=counting if self.collect_counting else None,
                )
            )
        return out

"""Training loop: pjit data-parallel over a device mesh.

Loss is masked cross-entropy over supported columns (the model's only scored
outputs, per the reference contract) plus a small-weight BCE on the info
head. Parameters replicate; batches shard along the data axis; XLA inserts
the gradient all-reduce (psum over 'data').
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..constants import QUAL_OFFSET, QUAL_SCALE
from ..models.model import CorrectionModel, ModelConfig


@dataclass
class TrainBatch:
    tokens: np.ndarray  # uint8 [B, 31, L] (row-major: column axis minor)
    quals: np.ndarray  # uint8 [B, 31, L]
    support_idx: np.ndarray  # int32 [B, S]
    support_mask: np.ndarray  # bool [B, S]
    labels: np.ndarray  # int32 [B, S]
    info_labels: np.ndarray  # float32 [B, S]


@dataclass
class TrainState:
    params: dict
    opt_state: optax.OptState
    step: int = 0


def make_optimizer(
    lr: float = 3e-4, warmup: int = 100, total_steps: int = 10_000
) -> optax.GradientTransformation:
    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup, max(total_steps, warmup + 1)
    )
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(sched, weight_decay=1e-4),
    )


def make_train_step(cfg: ModelConfig, optimizer, info_weight: float = 0.1,
                    mesh: Mesh | None = None, params_like=None, opt_like=None,
                    hard_weight: float = 0.0):
    """``hard_weight`` > 0 up-weights the cross-entropy at columns where the
    truth differs from the target read's current symbol (the info label) —
    the ~17% of supported columns where correction actually changes a base.
    The easy 83% (model must merely agree with the target) otherwise dominate
    the gradient."""
    model = CorrectionModel(cfg)

    def loss_fn(params, tokens, quals_u8, sidx, smask, labels, info_labels):
        quals = QUAL_SCALE * quals_u8.astype(jnp.float32) - QUAL_OFFSET
        info, logits = model.apply(params, tokens, quals, sidx, smask)
        m = smask.astype(jnp.float32)
        denom = jnp.maximum(m.sum(), 1.0)

        ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        w = m * (1.0 + hard_weight * info_labels)
        ce = (ce * w).sum() / jnp.maximum(w.sum(), 1.0)

        bce = optax.sigmoid_binary_cross_entropy(info, info_labels)
        bce = (bce * m).sum() / denom

        acc = ((jnp.argmax(logits, -1) == labels) * m).sum() / denom
        # accuracy restricted to the hard (truth != target) columns — the
        # number that moves corrected quality.
        hm = m * info_labels
        hard_acc = ((jnp.argmax(logits, -1) == labels) * hm).sum() / jnp.maximum(
            hm.sum(), 1.0
        )
        loss = ce + info_weight * bce
        return loss, {
            "loss": loss,
            "ce": ce,
            "info_bce": bce,
            "acc": acc,
            "hard_acc": hard_acc,
        }

    def step(params, opt_state, tokens, quals, sidx, smask, labels, info_labels):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, tokens, quals, sidx, smask, labels, info_labels
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    if mesh is not None:
        from ..parallel.tensor import param_shardings

        data = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        pshard = param_shardings(mesh, params_like) if params_like is not None else repl
        oshard = opt_like if opt_like is not None else repl
        return jax.jit(
            step,
            in_shardings=(pshard, oshard, data, data, data, data, data, data),
            out_shardings=(pshard, oshard, repl),
        )
    return jax.jit(step)


class Trainer:
    def __init__(
        self,
        cfg: ModelConfig,
        params,
        lr: float = 3e-4,
        total_steps: int = 10_000,
        mesh: Mesh | None = None,
        info_weight: float = 0.1,
        hard_weight: float = 0.0,
    ):
        self.cfg = cfg
        self.optimizer = make_optimizer(lr, total_steps=total_steps)
        opt_like = None
        if mesh is not None:
            from ..parallel.tensor import param_shardings

            params = jax.device_put(params, param_shardings(mesh, params))
        opt_state = self.optimizer.init(params)
        if mesh is not None:
            # mu/nu inherit the param shardings through zeros_like; pin the
            # remaining scalars (step counts) to the replicated mesh sharding
            # so every train-step input lives on the same device set.
            repl = NamedSharding(mesh, P())
            opt_state = jax.tree.map(
                lambda x: x
                if isinstance(getattr(x, "sharding", None), NamedSharding)
                else jax.device_put(jnp.asarray(x), repl),
                opt_state,
            )
            opt_like = jax.tree.map(lambda x: x.sharding, opt_state)
        self.state = TrainState(params, opt_state)
        self._step = make_train_step(
            cfg, self.optimizer, info_weight, mesh,
            params_like=params, opt_like=opt_like, hard_weight=hard_weight,
        )
        self.mesh = mesh

    def train_step(self, batch: TrainBatch) -> dict[str, float]:
        params, opt_state, metrics = self._step(
            self.state.params,
            self.state.opt_state,
            batch.tokens,
            batch.quals,
            batch.support_idx,
            batch.support_mask,
            batch.labels.astype(np.int32),
            batch.info_labels.astype(np.float32),
        )
        self.state = TrainState(params, opt_state, self.state.step + 1)
        return {k: float(v) for k, v in metrics.items()}

    def fit(
        self,
        batches: Iterator[TrainBatch],
        log_every: int = 50,
        save_every: int = 0,
        save_dir: str | None = None,
    ) -> list[dict]:
        history = []
        for batch in batches:
            metrics = self.train_step(batch)
            history.append(metrics)
            if self.state.step % log_every == 0:
                print(
                    f"step {self.state.step}: "
                    + " ".join(f"{k}={v:.4f}" for k, v in metrics.items())
                )
            if save_every and save_dir and self.state.step % save_every == 0:
                self.save(save_dir)
        return history

    def save(self, path: str) -> None:
        """Durable mid-run checkpoint (params + step marker)."""
        import os

        from ..models.checkpoint import save_model

        save_model(path, self.cfg, self.state.params)
        with open(os.path.join(path, "step.txt"), "w") as fh:
            fh.write(str(self.state.step))

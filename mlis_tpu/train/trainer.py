"""VPR fine-tuning: contrastive training of descriptor encoders on TPU.

New capability relative to the reference (which only runs frozen torch
checkpoints): indoor-domain adaptation of the VPR encoders with a
supervised-contrastive (NT-Xent over place labels) objective, sharded over
a (data, model) mesh — batch DP over `data`, Megatron TP of the
transformer kernels over `model` (parallel/mesh.py). Checkpointing via
orbax.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from mlis_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
)


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int = 0


def nt_xent_loss(
    descriptors: jnp.ndarray,  # (B, D), assumed L2-normalizable
    place_ids: jnp.ndarray,  # (B,) int — same id == same place
    temperature: float = 0.07,
) -> jnp.ndarray:
    """Supervised NT-Xent: pull same-place descriptors together, push the
    rest apart. Mean over anchors with at least one positive."""
    d = descriptors.astype(jnp.float32)
    d = d / (jnp.linalg.norm(d, axis=1, keepdims=True) + 1e-8)
    sims = d @ d.T / temperature
    B = d.shape[0]
    eye = jnp.eye(B, dtype=bool)
    pos = (place_ids[:, None] == place_ids[None, :]) & ~eye

    sims = jnp.where(eye, -jnp.inf, sims)
    log_prob = sims - jax.nn.logsumexp(sims, axis=1, keepdims=True)
    pos_count = jnp.sum(pos, axis=1)
    per_anchor = -jnp.sum(jnp.where(pos, log_prob, 0.0), axis=1) / jnp.maximum(
        pos_count, 1
    )
    has_pos = pos_count > 0
    return jnp.sum(jnp.where(has_pos, per_anchor, 0.0)) / jnp.maximum(
        jnp.sum(has_pos), 1
    )


def make_train_step(
    apply_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
    optimizer: optax.GradientTransformation,
) -> Callable:
    """Pure (params, opt_state, images, place_ids) -> (params, opt_state, loss)."""

    def train_step(params, opt_state, images, place_ids):
        def loss_fn(p):
            desc = apply_fn(p, images)
            return nt_xent_loss(desc, place_ids)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


class VPRTrainer:
    """Sharded trainer around any JaxEncoderVPR-style model.

    `encoder_apply(params, images_f32) -> (B, D)` must be pure; preprocessing
    happens host-side or in the apply itself.
    """

    def __init__(
        self,
        encoder_apply: Callable,
        params: Any,
        learning_rate: float = 1e-4,
        weight_decay: float = 1e-4,
        n_data: int = -1,
        n_model: int = 1,
        mesh=None,
    ):
        self.mesh = mesh if mesh is not None else make_mesh(n_data, n_model)
        self.optimizer = optax.adamw(learning_rate, weight_decay=weight_decay)
        self._step_fn = make_train_step(encoder_apply, self.optimizer)

        p_shard = param_shardings(self.mesh, params)
        # identity-jit with out_shardings COPIES into fresh sharded buffers:
        # train_batch donates params/opt_state, which must never invalidate
        # the caller's arrays.
        self.params = jax.jit(lambda p: p, out_shardings=p_shard)(params)
        opt_state = self.optimizer.init(self.params)
        self.opt_state = opt_state
        self.step = 0

        b_shard = batch_sharding(self.mesh)
        r = replicated(self.mesh)
        # optimizer state inherits param shardings implicitly (None = let
        # XLA propagate from the donated inputs)
        self._jit_step = jax.jit(
            self._step_fn,
            in_shardings=(p_shard, None, b_shard, b_shard),
            out_shardings=(p_shard, None, r),
            donate_argnums=(0, 1),
        )

    def train_batch(self, images, place_ids) -> float:
        images = jnp.asarray(images, jnp.float32)
        place_ids = jnp.asarray(place_ids, jnp.int32)
        self.params, self.opt_state, loss = self._jit_step(
            self.params, self.opt_state, images, place_ids
        )
        self.step += 1
        return float(loss)

    # -- checkpointing (orbax) ---------------------------------------------------
    def save_checkpoint(self, path: str) -> None:
        import orbax.checkpoint as ocp

        ckpt = ocp.StandardCheckpointer()
        ckpt.save(
            Path(path).absolute(),
            {"params": self.params, "step": self.step},
            force=True,
        )
        ckpt.wait_until_finished()

    def load_checkpoint(self, path: str) -> None:
        import orbax.checkpoint as ocp

        ckpt = ocp.StandardCheckpointer()
        restored = ckpt.restore(
            Path(path).absolute(),
            {"params": self.params, "step": self.step},
        )
        self.params = restored["params"]
        self.step = int(restored["step"])

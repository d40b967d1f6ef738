"""Train/adapt state containers and optimizer factories.

Optimizer semantics follow the reference
(/root/reference/depth_pose_prediction/depth_pose_prediction.py:202-209):
Adam(lr) over all parameters with a StepLR(step_size, 0.1) epoch schedule for
pretraining; online adaptation uses Adam(lr) with encoders and batch-norm
frozen (reference `_set_adapt`, :807-827).

TPU-first difference: during adaptation the encoder backward pass is skipped
entirely via `stop_gradient` (see tpuslam.train.adapt) instead of computing
and discarding encoder grads — the optimizer here masks encoder params so no
Adam moments are allocated for them either.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from tpuslam.models.depth_pose import encoder_path_mask


class TrainState(struct.PyTreeNode):
    """Functional state threaded through the jitted steps (donated buffers)."""

    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array
    step: jax.Array  # int32 global step counter


def steplr(base_lr: float, step_size: int, gamma: float = 0.1):
    """Per-epoch StepLR: lr(epoch) = base_lr * gamma^(epoch // step_size)."""

    def schedule(epoch: int) -> float:
        return base_lr * (gamma ** (epoch // step_size))

    return schedule


def make_pretrain_optimizer(learning_rate: float = 1e-4) -> optax.GradientTransformation:
    """Adam with host-injected learning rate (epoch StepLR driven from host)."""
    return optax.inject_hyperparams(optax.adam)(learning_rate=learning_rate)


def set_learning_rate(opt_state, learning_rate: float):
    """Update the injected learning rate (host-side epoch schedule)."""
    opt_state.hyperparams["learning_rate"] = jnp.asarray(learning_rate, jnp.float32)
    return opt_state


def make_adapt_optimizer(
    params,
    learning_rate: float = 1e-4,
    freeze_encoder: bool = True,
    grad_clip_norm: Optional[float] = None,
) -> optax.GradientTransformation:
    """Adam over decoder params only; encoder entries are masked out.

    `grad_clip_norm` prepends global-norm clipping — the reference has no
    clipping (parity default None), but aggressive online adaptation can
    produce gradient spikes; see BASELINE.md stability notes."""
    def adam():
        if grad_clip_norm is None:
            return optax.adam(learning_rate)
        return optax.chain(
            optax.clip_by_global_norm(grad_clip_norm), optax.adam(learning_rate)
        )

    if not freeze_encoder:
        return adam()
    labels = jax.tree_util.tree_map(
        lambda frozen: "frozen" if frozen else "train", encoder_path_mask(params)
    )
    return optax.multi_transform(
        {"train": adam(), "frozen": optax.set_to_zero()},
        labels,
    )


def make_train_state(
    params,
    batch_stats,
    tx: optax.GradientTransformation,
    rng: Optional[jax.Array] = None,
    copy: bool = True,
) -> TrainState:
    """Build a TrainState.  `copy=True` (default) clones the param buffers so
    the jitted steps can donate the state without invalidating the caller's
    arrays (one-time ~100MB copy for the flagship model)."""
    if copy:
        params = jax.tree_util.tree_map(jnp.array, params)
        batch_stats = jax.tree_util.tree_map(jnp.array, batch_stats)
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        rng=rng if rng is not None else jax.random.PRNGKey(0),
        step=jnp.zeros((), jnp.int32),
    )

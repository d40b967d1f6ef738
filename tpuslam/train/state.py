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
import numpy as np
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
    flatten: bool = False,
    depth_lr_scale: float = 1.0,
) -> optax.GradientTransformation:
    """Adam over decoder params only; encoder entries are masked out.

    `grad_clip_norm` prepends global-norm clipping — the reference has no
    clipping (parity default None), but aggressive online adaptation can
    produce gradient spikes; see BASELINE.md stability notes.

    `depth_lr_scale` splits the learning rate per decoder head: the depth
    decoder trains at `learning_rate * depth_lr_scale`, the pose decoder at
    the full rate.  The reference adapts both heads at one LR — which wins
    odometry at the cost of depth quality in low-parallax regimes (round-2
    trained ladder: ATE -73% but abs_rel 0.187 -> 0.42, BASELINE.md): the
    photometric loss pulls the depth head toward its degenerate far-plane
    optimum while pose improves.  1.0 (default) is reference-exact; 0.0
    freezes the depth decoder online entirely (no moments allocated);
    intermediate values damp depth drift while odometry adapts.  When the
    scale splits the heads, `grad_clip_norm` clips each head's gradient
    group separately.

    `flatten=True` runs the inner Adam on ONE concatenated vector of the
    trainable leaves instead of a ~60-leaf tree; per-element math is
    identical (Adam is elementwise; global-norm clip sees exactly the
    trainable leaves either way — tests/test_train_steps.py asserts
    equality).  Measured OFF as the default: the STANDALONE tree-form
    update costs 8.6 ms on the dev attachment (per-dispatch overhead,
    calibration table in BASELINE.md), but inside the fused adapt scan XLA
    fuses each leaf's Adam update into the kernel producing that leaf's
    gradient, so the flat form only adds concat/scatter traffic (bench:
    7.31 vs 7.50 fps).  Keep it in mind for optimizers driven OUTSIDE a
    fused graph.  Note the opt_state pytree differs between forms, so
    checkpoints written with one resume the other via the fresh-optimizer
    fallback (tpuslam/checkpoint/io.py)."""
    def adam(lr=learning_rate):
        if grad_clip_norm is None:
            return optax.adam(lr)
        return optax.chain(
            optax.clip_by_global_norm(grad_clip_norm), optax.adam(lr)
        )

    if not freeze_encoder:
        return adam()
    if depth_lr_scale != 1.0:
        assert not flatten, "flatten composes only with depth_lr_scale=1.0"
        labels = {
            top: jax.tree_util.tree_map(
                lambda _: (
                    "frozen" if "encoder" in top
                    else "depth" if top == "depth_decoder" else "train"
                ),
                sub,
            )
            for top, sub in params.items()
        }
        depth_tx = (
            optax.set_to_zero()
            if depth_lr_scale == 0.0
            else adam(learning_rate * depth_lr_scale)
        )
        return optax.multi_transform(
            {"train": adam(), "depth": depth_tx, "frozen": optax.set_to_zero()},
            labels,
        )
    if flatten:
        return _flat_masked_transform(params, adam())
    labels = jax.tree_util.tree_map(
        lambda frozen: "frozen" if frozen else "train", encoder_path_mask(params)
    )
    return optax.multi_transform(
        {"train": adam(), "frozen": optax.set_to_zero()},
        labels,
    )


def _flat_masked_transform(
    params, inner: optax.GradientTransformation
) -> optax.GradientTransformation:
    """Apply `inner` to the trainable (non-encoder) leaves as one flat vector.

    Frozen leaves receive zero updates (the same contract as the
    multi_transform/set_to_zero form — `optax.apply_updates` still walks the
    full tree).  Leaf bookkeeping (indices, shapes, split offsets) is static,
    captured from `params` at factory time."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    frozen = jax.tree_util.tree_leaves(encoder_path_mask(params))
    assert len(frozen) == len(leaves)
    train_idx = [i for i, f in enumerate(frozen) if not f]
    shapes = [leaves[i].shape for i in train_idx]
    sizes = [int(np.prod(s)) for s in shapes]
    offsets = np.cumsum([0] + sizes).tolist()

    def _concat(tree):
        ls = jax.tree_util.tree_leaves(tree)
        return jnp.concatenate([ls[i].reshape(-1) for i in train_idx])

    def _scatter(flat, like_tree):
        ls = list(jax.tree_util.tree_leaves(like_tree))
        out = [jnp.zeros_like(l) for l in ls]
        for k, i in enumerate(train_idx):
            out[i] = flat[offsets[k] : offsets[k + 1]].reshape(shapes[k])
        return jax.tree_util.tree_unflatten(treedef, out)

    def init(params):
        return inner.init(_concat(params))

    def update(updates, state, params=None):
        flat_u, new_state = inner.update(
            _concat(updates), state, None if params is None else _concat(params)
        )
        return _scatter(flat_u, updates), new_state

    return optax.GradientTransformation(init, update)


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

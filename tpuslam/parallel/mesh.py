"""Device-mesh data parallelism for pretraining.

The reference's only parallelism is single-process `nn.DataParallel`
(/root/reference/depth_pose_prediction/depth_pose_prediction.py:178-181) with
scatter/gather per step.  The TPU-native equivalent: a 1-D `data` mesh over
ICI, `shard_map`-wrapped train step with the global batch sharded on its
leading axis, `pmean` gradient/metric reduction, replicated parameters, and
synchronised BN statistics (stronger than DataParallel, which only keeps
device-0 buffer updates).  Multi-host DCN is out of scope but nothing here
assumes a single host — the mesh is built from whatever `jax.devices()`
reports.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.7 exposes shard_map at the top level
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from tpuslam.models.depth_pose import DepthPoseNet
from tpuslam.train.batch import FrameBatch
from tpuslam.train.state import TrainState
from tpuslam.train.steps import LossConfig, forward


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(batch: FrameBatch, mesh: Mesh, axis: str = "data") -> FrameBatch:
    """Place a host batch with its leading axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def make_dp_train_step(
    model: DepthPoseNet,
    tx: optax.GradientTransformation,
    cfg: LossConfig,
    mesh: Mesh,
    axis: str = "data",
):
    """Build the jitted SPMD pretraining step.

    state is replicated; the batch is sharded along samples.  Each device
    computes its local forward/backward; BatchNorm normalises with GLOBAL
    batch statistics (sync-BN via flax `axis_name` psums inside the model);
    gradients, losses and BN statistics are `pmean`-reduced over ICI.  The
    identity tie-break noise is drawn from the REPLICATED rng and is
    batch-broadcast (losses/photometric.py), so the sharded step reproduces
    the single-device `train_step` update exactly (tests/test_parallel.py),
    not merely statistically."""
    dp_model = model.clone(bn_axis=axis)

    def _local_step(state: TrainState, batch: FrameBatch):
        def loss_fn(params, rng):
            # per-shard weights: scale so the pmean over devices equals the
            # global weighted mean (weights sum to 1 globally)
            losses, _, new_stats = forward(
                dp_model,
                params,
                state.batch_stats,
                batch,
                cfg,
                train_bn=True,
                rng=rng,
                sample_weights=batch.weights * jax.lax.axis_size(axis),
            )
            return losses["loss"], (losses, new_stats)

        # SAME key on every device: the noise is batch-broadcast, so any
        # per-device fold-in would (a) diverge from the single-device step
        # and (b) make the loss depend on the sharding layout
        rng, noise_rng = jax.random.split(state.rng)
        (_, (losses, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, noise_rng
        )
        grads = jax.lax.pmean(grads, axis)
        losses = jax.lax.pmean(losses, axis)
        new_stats = jax.lax.pmean(new_stats, axis)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params,
            batch_stats=new_stats,
            opt_state=opt_state,
            rng=rng,  # identical on all devices (split of the replicated key)
            step=state.step + 1,
        )
        return new_state, losses

    sharded = shard_map(
        _local_step,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(), P()),
    )
    return jax.jit(sharded, donate_argnums=(0,))

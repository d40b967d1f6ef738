"""Data-parallel pretraining step on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuslam.models import init_depth_pose
from tpuslam.parallel import make_dp_train_step, make_mesh, shard_batch
from tpuslam.train import (
    LossConfig,
    make_frame_batch,
    make_pretrain_optimizer,
    make_train_state,
    train_step,
)

H, W = 32, 64
K = np.array([[0.58 * W, 0, 0.5 * W, 0], [0, 1.92 * H, 0.5 * H, 0],
              [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)


def _batch(rng, b):
    rgb = rng.uniform(size=(b, 3, H, W, 3)).astype(np.float32)
    rel = rng.uniform(0.5, 2.0, size=(b, 2)).astype(np.float32)
    return make_frame_batch(rgb, K, rel)


@pytest.mark.slow
def test_dp_step_runs_on_8_device_mesh(rng):
    assert len(jax.devices()) >= 8, "conftest must force 8 virtual CPU devices"
    mesh = make_mesh(8)
    model, variables = init_depth_pose(jax.random.PRNGKey(0), height=H, width=W)
    cfg = LossConfig(scales=(0,))
    tx = make_pretrain_optimizer(1e-4)
    state = make_train_state(variables["params"], variables["batch_stats"], tx)
    step = make_dp_train_step(model, tx, cfg, mesh)
    batch = shard_batch(_batch(rng, 8), mesh)
    state, losses = step(state, batch)
    assert np.isfinite(float(losses["loss"]))
    state, losses2 = step(state, shard_batch(_batch(rng, 8), mesh))
    assert np.isfinite(float(losses2["loss"]))
    # params stayed replicated (single value per leaf)
    kernel = state.params["depth_encoder"]["conv1"]["kernel"]
    assert kernel.sharding.is_fully_replicated


@pytest.mark.slow
def test_dp_matches_single_device(rng):
    """pmean-reduced DP update == single-device update on the same batch —
    EXACTLY (float accumulation order aside): sync-BN normalises with global
    batch statistics and the tie-break noise is batch-broadcast from the
    replicated rng, so sharding is a pure layout choice, not a different
    algorithm."""
    mesh = make_mesh(2)
    model, variables = init_depth_pose(jax.random.PRNGKey(0), height=H, width=W)
    cfg = LossConfig(scales=(0,), velocity_loss_scaling=None)
    tx = make_pretrain_optimizer(1e-3)
    batch = _batch(rng, 2)

    state_a = make_train_state(variables["params"], variables["batch_stats"], tx,
                               rng=jax.random.PRNGKey(3))
    step = make_dp_train_step(model, tx, cfg, mesh)
    state_a, losses_a = step(state_a, shard_batch(batch, mesh))

    state_b = make_train_state(variables["params"], variables["batch_stats"], tx,
                               rng=jax.random.PRNGKey(3))
    state_b, losses_b = train_step(model, tx, cfg, state_b, batch)

    np.testing.assert_allclose(
        float(losses_a["loss"]), float(losses_b["loss"]), rtol=1e-6
    )
    a = np.asarray(state_a.params["depth_decoder"]["dispconv_0_conv"]["kernel"])
    b = np.asarray(state_b.params["depth_decoder"]["dispconv_0_conv"]["kernel"])
    np.testing.assert_allclose(a, b, atol=1e-6)
    # sync-BN running statistics match the single-device ones too
    sa = np.asarray(state_a.batch_stats["depth_encoder"]["bn1"]["mean"])
    sb = np.asarray(state_b.batch_stats["depth_encoder"]["bn1"]["mean"])
    np.testing.assert_allclose(sa, sb, atol=1e-6)


@pytest.mark.slow
def test_dp_step_at_production_shape(rng):
    """The DP step at the REAL pretraining shape — 192x640, global batch 8,
    all 4 scales — compiles and executes over the 8-device mesh (the
    toy-shape dryrun alone does not prove the production graph shards)."""
    assert len(jax.devices()) >= 8
    Hp, Wp = 192, 640
    Kp = np.array([[0.58 * Wp, 0, 0.5 * Wp, 0], [0, 1.92 * Hp, 0.5 * Hp, 0],
                   [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
    mesh = make_mesh(8)
    model, variables = init_depth_pose(jax.random.PRNGKey(0), height=Hp, width=Wp)
    cfg = LossConfig(scales=(0, 1, 2, 3), use_pallas_warp=False)
    tx = make_pretrain_optimizer(1e-4)
    state = make_train_state(variables["params"], variables["batch_stats"], tx)
    step = make_dp_train_step(model, tx, cfg, mesh)
    rgb = rng.uniform(size=(8, 3, Hp, Wp, 3)).astype(np.float32)
    rel = rng.uniform(0.5, 2.0, size=(8, 2)).astype(np.float32)
    batch = shard_batch(make_frame_batch(rgb, Kp, rel), mesh)
    state, losses = step(state, batch)
    assert np.isfinite(float(losses["loss"]))
    assert state.params["depth_encoder"]["conv1"][
        "kernel"
    ].sharding.is_fully_replicated

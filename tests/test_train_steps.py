"""Fused adapt/train step tests on small synthetic batches."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuslam.models import init_depth_pose
from tpuslam.train import (
    FrameBatch,
    LossConfig,
    TrainState,
    adapt_step,
    concat_batches,
    eval_step,
    make_adapt_optimizer,
    make_frame_batch,
    make_pretrain_optimizer,
    make_train_state,
    pad_batch,
    predict_pose_step,
    train_step,
)

H, W = 64, 96
K_NORM = np.array(
    [[0.58, 0, 0.5, 0], [0, 1.92, 0.5, 0], [0, 0, 1, 0], [0, 0, 0, 1]], np.float32
)


def _pixel_K():
    K = K_NORM.copy()
    K[0, :] *= W
    K[1, :] *= H
    return K


def _batch(rng, b=2):
    rgb = rng.uniform(size=(b, 3, H, W, 3)).astype(np.float32)
    rel = rng.uniform(0.5, 2.0, size=(b, 2)).astype(np.float32)
    return make_frame_batch(rgb, _pixel_K(), rel)


@pytest.fixture(scope="module")
def setup():
    model, variables = init_depth_pose(jax.random.PRNGKey(0), height=H, width=W)
    return model, variables


def test_eval_step_outputs(setup, rng):
    model, variables = setup
    cfg = LossConfig(scales=(0, 1, 2, 3))
    batch = _batch(rng, 2)
    losses, outputs = eval_step(
        model, cfg, variables["params"], variables["batch_stats"], batch
    )
    assert np.isfinite(float(losses["loss"]))
    assert outputs[("depth", 0)].shape == (2, H, W, 1)
    assert outputs[("cam_T_cam", 0, 1)].shape == (2, 4, 4)
    emb = np.asarray(outputs[("embedding",)])
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-5)


def test_adapt_step_reduces_loss(setup, rng):
    model, variables = setup
    cfg = LossConfig(scales=(0, 1))
    tx = make_adapt_optimizer(variables["params"], learning_rate=1e-4)
    state = make_train_state(variables["params"], variables["batch_stats"], tx)
    online = _batch(rng, 1)
    training = concat_batches(online, _batch(rng, 2))

    losses0, _ = eval_step(model, cfg, state.params, state.batch_stats, training)
    state, eval_losses, outputs = adapt_step(
        model, tx, cfg, state, online, training, num_steps=4
    )
    losses1, _ = eval_step(model, cfg, state.params, state.batch_stats, training)
    assert float(losses1["loss"]) < float(losses0["loss"]), "adaptation must reduce loss"
    assert eval_losses["iter_losses"].shape == (4,)
    assert int(state.step) == 1


def test_adapt_step_freezes_encoders(setup, rng):
    model, variables = setup
    cfg = LossConfig(scales=(0,))
    tx = make_adapt_optimizer(variables["params"], learning_rate=1e-2)
    state = make_train_state(variables["params"], variables["batch_stats"], tx)
    online = _batch(rng, 1)
    before_enc = np.asarray(
        variables["params"]["depth_encoder"]["conv1"]["kernel"]
    ).copy()
    before_dec = np.asarray(
        variables["params"]["depth_decoder"]["upconv_0_0_conv"]["kernel"]
    ).copy()
    before_stats = np.asarray(
        variables["batch_stats"]["depth_encoder"]["bn1"]["mean"]
    ).copy()
    state, _, _ = adapt_step(model, tx, cfg, state, online, online, num_steps=2)
    after_enc = np.asarray(state.params["depth_encoder"]["conv1"]["kernel"])
    after_dec = np.asarray(state.params["depth_decoder"]["upconv_0_0_conv"]["kernel"])
    after_stats = np.asarray(state.batch_stats["depth_encoder"]["bn1"]["mean"])
    np.testing.assert_array_equal(before_enc, after_enc)  # encoder frozen
    np.testing.assert_array_equal(before_stats, after_stats)  # BN stats frozen
    assert not np.allclose(before_dec, after_dec)  # decoder adapts


def test_adapt_step_padded_batch_matches_unpadded(setup, rng):
    """Zero-weight padding must not change the resulting parameters."""
    model, variables = setup
    cfg = LossConfig(scales=(0,))
    tx = make_adapt_optimizer(variables["params"], learning_rate=1e-3)
    online = _batch(rng, 1)

    state_a = make_train_state(variables["params"], variables["batch_stats"], tx,
                               rng=jax.random.PRNGKey(7))
    state_a, _, _ = adapt_step(model, tx, cfg, state_a, online, online, num_steps=1)

    padded = pad_batch(online, 2)
    state_b = make_train_state(variables["params"], variables["batch_stats"], tx,
                               rng=jax.random.PRNGKey(7))
    state_b, _, _ = adapt_step(model, tx, cfg, state_b, online, padded, num_steps=1)

    a = np.asarray(state_a.params["depth_decoder"]["dispconv_0_conv"]["kernel"])
    b = np.asarray(state_b.params["depth_decoder"]["dispconv_0_conv"]["kernel"])
    np.testing.assert_allclose(a, b, atol=2e-6)


def test_train_step_updates_everything(setup, rng):
    model, variables = setup
    cfg = LossConfig(scales=(0, 1))
    tx = make_pretrain_optimizer(1e-4)
    state = make_train_state(variables["params"], variables["batch_stats"], tx)
    batch = _batch(rng, 2)
    state, losses = train_step(model, tx, cfg, state, batch)
    assert np.isfinite(float(losses["loss"]))
    after_enc = np.asarray(state.params["depth_encoder"]["conv1"]["kernel"])
    before_enc = np.asarray(variables["params"]["depth_encoder"]["conv1"]["kernel"])
    assert not np.allclose(before_enc, after_enc)  # encoder trains in pretraining
    after_stats = np.asarray(state.batch_stats["depth_encoder"]["bn1"]["mean"])
    before_stats = np.asarray(variables["batch_stats"]["depth_encoder"]["bn1"]["mean"])
    assert not np.allclose(before_stats, after_stats)  # BN stats update


def test_predict_pose_step(setup, rng):
    model, variables = setup
    img = jnp.asarray(rng.uniform(size=(1, H, W, 3)).astype(np.float32))
    T, cov = predict_pose_step(model, variables["params"], variables["batch_stats"], img, img)
    assert T.shape == (1, 4, 4)
    np.testing.assert_allclose(np.asarray(cov), np.eye(6), atol=0)
    # near-identity for an identical pair at init (0.01 output scaling)
    assert np.abs(np.asarray(T[0]) - np.eye(4)).max() < 0.05


def test_concat_batches_uniform_weights(rng):
    """online(1) ++ replay(2) must give the reference's uniform 1/3 weights."""
    a = _batch(rng, 1)
    b = _batch(rng, 2)
    c = concat_batches(a, b)
    np.testing.assert_allclose(np.asarray(c.weights), [1 / 3] * 3, atol=1e-6)
    # padded afterwards: zero-weight tail, real weights unchanged
    p = pad_batch(c, 5)
    np.testing.assert_allclose(
        np.asarray(p.weights), [1 / 3, 1 / 3, 1 / 3, 0, 0], atol=1e-6
    )


def test_adapt_step_returns_last_iteration_forward(setup, rng):
    """Reference semantics (adapt, depth_pose_prediction.py:291-319): the
    returned outputs come from the forward computed with post-(K-1)-update
    weights — for K=1 that is the INITIAL parameters, so the pose must equal
    a plain forward with them (pose is noise-independent)."""
    from tpuslam.train import forward

    model, variables = setup
    cfg = LossConfig(scales=(0, 1))
    tx = make_adapt_optimizer(variables["params"], learning_rate=1e-4)
    state = make_train_state(variables["params"], variables["batch_stats"], tx)
    training = concat_batches(_batch(rng, 1), _batch(rng, 2))

    _, losses, outputs = adapt_step(
        model, tx, cfg, state, None, training, num_steps=1
    )
    _, ref_outputs, _ = forward(
        model, variables["params"], variables["batch_stats"], training, cfg
    )
    np.testing.assert_allclose(
        np.asarray(outputs[("cam_T_cam", 0, 1)]),
        np.asarray(ref_outputs[("cam_T_cam", 0, 1)]),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(outputs[("depth", 0)]),
        np.asarray(ref_outputs[("depth", 0)]),
        atol=1e-5,
    )
    # warped images are intentionally dropped from the adapt outputs
    assert not any(k[0] == "rgb" for k in outputs)
    # embeddings ride the dispatch and are L2-normalised
    emb = np.asarray(outputs[("embedding",)])
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-5)


def test_bfloat16_conv_path_smoke(rng):
    """dtype='bfloat16' conv path: forward + fused adapt run and stay finite
    (geometry/losses stay f32 — only the conv compute drops precision)."""
    import jax.numpy as jnp

    model, variables = init_depth_pose(
        jax.random.PRNGKey(0), height=H, width=W, dtype=jnp.bfloat16
    )
    cfg = LossConfig(scales=(0, 1))
    tx = make_adapt_optimizer(variables["params"], learning_rate=1e-4)
    state = make_train_state(variables["params"], variables["batch_stats"], tx)
    training = concat_batches(_batch(rng, 1), _batch(rng, 2))
    state, losses, outputs = adapt_step(
        model, tx, cfg, state, None, training, num_steps=2
    )
    assert np.isfinite(float(losses["loss"]))
    assert np.isfinite(np.asarray(outputs[("depth", 0)])).all()
    assert outputs[("cam_T_cam", 0, 1)].dtype == jnp.float32  # geometry stays f32


def test_flat_adapt_optimizer_matches_tree_form(setup, rng):
    """The flattened masked Adam (default) must produce the SAME update as
    the multi_transform tree form — Adam is elementwise and the global-norm
    clip sees exactly the trainable leaves in both, so equality is exact up
    to concat/reshape float noise."""
    model, variables = setup
    params = variables["params"]
    grads = jax.tree_util.tree_map(
        lambda p: jnp.asarray(np.random.default_rng(0).normal(size=p.shape), p.dtype),
        params,
    )
    for clip in (None, 1.0):
        tx_flat = make_adapt_optimizer(params, 1e-3, grad_clip_norm=clip, flatten=True)
        tx_tree = make_adapt_optimizer(params, 1e-3, grad_clip_norm=clip, flatten=False)
        s_flat, s_tree = tx_flat.init(params), tx_tree.init(params)
        for _ in range(3):  # a few steps so moments/bias correction engage
            u_flat, s_flat = tx_flat.update(grads, s_flat, params)
            u_tree, s_tree = tx_tree.update(grads, s_tree, params)
        flat_l = jax.tree_util.tree_leaves(u_flat)
        tree_l = jax.tree_util.tree_leaves(u_tree)
        assert len(flat_l) == len(tree_l)
        for a, b in zip(flat_l, tree_l):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_depth_lr_scale_split(setup, rng):
    """Per-head LR split (make_adapt_optimizer depth_lr_scale): 1.0 equals
    the single-LR form exactly; 0.5 halves exactly the depth-decoder update
    (Adam's normalised step is grad-identical, scaled by lr); 0.0 freezes
    the depth decoder with the pose decoder still training."""
    model, variables = setup
    params = variables["params"]
    grads = jax.tree_util.tree_map(
        lambda p: jnp.asarray(np.random.default_rng(1).normal(size=p.shape), p.dtype),
        params,
    )
    tx_ref = make_adapt_optimizer(params, 1e-3)
    tx_10 = make_adapt_optimizer(params, 1e-3, depth_lr_scale=1.0)
    tx_05 = make_adapt_optimizer(params, 1e-3, depth_lr_scale=0.5)
    tx_00 = make_adapt_optimizer(params, 1e-3, depth_lr_scale=0.0)
    updates = {}
    for name, tx in (("ref", tx_ref), ("1.0", tx_10), ("0.5", tx_05), ("0.0", tx_00)):
        s = tx.init(params)
        u, _ = tx.update(grads, s, params)
        updates[name] = u

    # scale 1.0 takes the unsplit code path -> identical trees
    for a, b in zip(
        jax.tree_util.tree_leaves(updates["ref"]),
        jax.tree_util.tree_leaves(updates["1.0"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # pose decoder identical at every scale; encoders zero at every scale
    for name in ("0.5", "0.0"):
        for a, b in zip(
            jax.tree_util.tree_leaves(updates["ref"]["pose_decoder"]),
            jax.tree_util.tree_leaves(updates[name]["pose_decoder"]),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for leaf in jax.tree_util.tree_leaves(updates[name]["depth_encoder"]):
            np.testing.assert_array_equal(np.asarray(leaf), 0.0)

    # depth decoder: exactly half the first-step update at 0.5, zero at 0.0
    for a, b in zip(
        jax.tree_util.tree_leaves(updates["ref"]["depth_decoder"]),
        jax.tree_util.tree_leaves(updates["0.5"]["depth_decoder"]),
    ):
        np.testing.assert_allclose(np.asarray(b), 0.5 * np.asarray(a), rtol=1e-6)
    for leaf in jax.tree_util.tree_leaves(updates["0.0"]["depth_decoder"]):
        np.testing.assert_array_equal(np.asarray(leaf), 0.0)

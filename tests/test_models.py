import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuslam.models import (
    DepthPoseNet,
    MobileNetV3SmallEmbedder,
    ResNetEncoder,
    encoder_path_mask,
    init_depth_pose,
    l2_normalize,
)

H, W = 96, 320  # small multiple-of-32 resolution for fast tests


@pytest.fixture(scope="module")
def depth_pose():
    model, variables = init_depth_pose(jax.random.PRNGKey(0), height=H, width=W)
    return model, variables


def test_encoder_feature_pyramid_shapes():
    enc = ResNetEncoder(18)
    x = jnp.zeros((2, H, W, 3))
    variables = enc.init(jax.random.PRNGKey(0), x)
    feats = enc.apply(variables, x)
    assert [f.shape for f in feats] == [
        (2, H // 2, W // 2, 64),
        (2, H // 4, W // 4, 64),
        (2, H // 8, W // 8, 128),
        (2, H // 16, W // 16, 256),
        (2, H // 32, W // 32, 512),
    ]


def test_encoder_resnet34_has_more_params():
    x = jnp.zeros((1, 64, 64, 3))
    p18 = ResNetEncoder(18).init(jax.random.PRNGKey(0), x)["params"]
    p34 = ResNetEncoder(34).init(jax.random.PRNGKey(0), x)["params"]
    n18 = sum(p.size for p in jax.tree_util.tree_leaves(p18))
    n34 = sum(p.size for p in jax.tree_util.tree_leaves(p34))
    assert n34 > n18 > 10_000_000  # resnet18 ~11M params


def test_depth_pose_outputs(depth_pose):
    model, variables = depth_pose
    img = jnp.ones((2, H, W, 3)) * 0.5
    pair = jnp.ones((2, H, W, 6)) * 0.5
    disps, feat4 = model.apply(variables, img, method=DepthPoseNet.depth_forward)
    assert set(disps.keys()) == {("disp", s) for s in (0, 1, 2, 3)}
    for s in range(4):
        d = disps[("disp", s)]
        assert d.shape == (2, H // 2**s, W // 2**s, 1)
        assert bool(((d > 0) & (d < 1)).all()), "sigmoid disparity in (0, 1)"
    assert feat4.shape == (2, 512)

    aa, t = model.apply(variables, pair, method=DepthPoseNet.pose_forward)
    assert aa.shape == (2, 3) and t.shape == (2, 3)
    # 0.01 scaling keeps initial predictions tiny
    assert float(jnp.abs(aa).max()) < 0.1 and float(jnp.abs(t).max()) < 0.1


def test_batch_stats_update_only_in_train_mode(depth_pose):
    model, variables = depth_pose
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, H, W, 3))
    pair = jnp.concatenate([img, img], axis=-1)
    _, mutated = model.apply(
        variables, img, pair, train=True, mutable=["batch_stats"]
    )
    before = variables["batch_stats"]["depth_encoder"]["bn1"]["mean"]
    after = mutated["batch_stats"]["depth_encoder"]["bn1"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))

    # eval mode must not touch the stats
    _, mutated_eval = model.apply(
        variables, img, pair, train=False, mutable=["batch_stats"]
    )
    after_eval = mutated_eval["batch_stats"]["depth_encoder"]["bn1"]["mean"]
    np.testing.assert_array_equal(np.asarray(before), np.asarray(after_eval))


def test_encoder_path_mask(depth_pose):
    model, variables = depth_pose
    mask = encoder_path_mask(variables["params"])
    leaves = jax.tree_util.tree_leaves(mask)
    assert any(leaves) and not all(leaves)
    assert all(jax.tree_util.tree_leaves(mask["depth_encoder"]))
    assert not any(jax.tree_util.tree_leaves(mask["depth_decoder"]))


def test_mobilenet_embedder():
    emb = MobileNetV3SmallEmbedder()
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 96, 96, 3))
    variables = emb.init(jax.random.PRNGKey(1), x)
    out = emb.apply(variables, x)
    assert out.shape == (2, 576)
    normed = l2_normalize(out)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(normed), axis=-1), np.ones(2), atol=1e-5
    )
    # distinct inputs -> distinct embeddings (random init is still a descriptor)
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))

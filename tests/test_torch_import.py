"""Reference PyTorch checkpoint import: key mapping + tensor layout."""
import numpy as np
import pytest
import torch

from tpuslam.checkpoint.torch_import import (
    _import_depth_decoder,
    _import_pose_decoder,
    _import_resnet,
    import_mobilenet_v3_small,
)


def _conv_t(o, i, k):
    return torch.arange(o * i * k * k, dtype=torch.float32).reshape(o, i, k, k)


def _resnet18_state(prefix="resnet.", in_ch=3):
    """State dict with the torchvision resnet18 key layout (random-free)."""
    state = {f"{prefix}conv1.weight": _conv_t(64, in_ch, 7)}
    for bn, ch in ((f"{prefix}bn1", 64),):
        state[f"{bn}.weight"] = torch.ones(ch)
        state[f"{bn}.bias"] = torch.zeros(ch)
        state[f"{bn}.running_mean"] = torch.full((ch,), 0.25)
        state[f"{bn}.running_var"] = torch.full((ch,), 2.0)
    chans = [64, 64, 128, 256, 512]
    for layer in range(1, 5):
        cin, cout = chans[layer - 1], chans[layer]
        for block in range(2):
            src = f"{prefix}layer{layer}.{block}"
            c1_in = cin if block == 0 else cout
            state[f"{src}.conv1.weight"] = _conv_t(cout, c1_in, 3)
            state[f"{src}.conv2.weight"] = _conv_t(cout, cout, 3)
            for bn in (1, 2):
                state[f"{src}.bn{bn}.weight"] = torch.ones(cout)
                state[f"{src}.bn{bn}.bias"] = torch.zeros(cout)
                state[f"{src}.bn{bn}.running_mean"] = torch.zeros(cout)
                state[f"{src}.bn{bn}.running_var"] = torch.ones(cout)
            if block == 0 and layer > 1:
                state[f"{src}.downsample.0.weight"] = _conv_t(cout, cin, 1)
                state[f"{src}.downsample.1.weight"] = torch.ones(cout)
                state[f"{src}.downsample.1.bias"] = torch.zeros(cout)
                state[f"{src}.downsample.1.running_mean"] = torch.zeros(cout)
                state[f"{src}.downsample.1.running_var"] = torch.ones(cout)
    return state


def test_resnet_import_matches_flax_tree():
    import jax

    from tpuslam.models import ResNetEncoder

    params, stats = _import_resnet(_resnet18_state())
    # shapes must match a fresh flax init exactly
    enc = ResNetEncoder(18)
    ref = enc.init(jax.random.PRNGKey(0), np.zeros((1, 32, 64, 3), np.float32))
    ref_shapes = jax.tree_util.tree_map(lambda x: x.shape, ref["params"])
    got_shapes = jax.tree_util.tree_map(lambda x: x.shape, params)
    assert ref_shapes == got_shapes
    ref_stats = jax.tree_util.tree_map(lambda x: x.shape, ref["batch_stats"])
    got_stats = jax.tree_util.tree_map(lambda x: x.shape, stats)
    assert ref_stats == got_stats
    # OIHW -> HWIO transpose: element (o, i, kh, kw) lands at (kh, kw, i, o)
    t = _conv_t(64, 3, 7).numpy()
    np.testing.assert_array_equal(
        params["conv1"]["kernel"][2, 3, 1, 10], t[10, 1, 2, 3]
    )
    np.testing.assert_allclose(stats["bn1"]["var"], 2.0)


def test_decoder_imports():
    import jax

    from tpuslam.models import DepthDecoder, PoseDecoder

    state = {}
    chans = [16, 32, 64, 128, 256]
    enc = [64, 64, 128, 256, 512]
    for i in range(4, -1, -1):
        cin0 = enc[-1] if i == 4 else chans[i + 1]
        state[f"upconv_{i}_0.conv.conv.weight"] = _conv_t(chans[i], cin0, 3)
        state[f"upconv_{i}_0.conv.conv.bias"] = torch.zeros(chans[i])
        cin1 = chans[i] + (enc[i - 1] if i > 0 else 0)
        state[f"upconv_{i}_1.conv.conv.weight"] = _conv_t(chans[i], cin1, 3)
        state[f"upconv_{i}_1.conv.conv.bias"] = torch.zeros(chans[i])
    for s in range(4):
        state[f"dispconv_{s}.conv.weight"] = _conv_t(1, chans[s], 3)
        state[f"dispconv_{s}.conv.bias"] = torch.zeros(1)
    params = _import_depth_decoder(state)

    dec = DepthDecoder(scales=(0, 1, 2, 3))
    feats = [np.zeros((1, 16 // 2**i, 32 // 2**i, c), np.float32)
             for i, c in enumerate(enc)]
    ref = dec.init(jax.random.PRNGKey(0), feats)["params"]
    assert jax.tree_util.tree_map(lambda x: x.shape, ref) == jax.tree_util.tree_map(
        lambda x: x.shape, params
    )

    pstate = {
        "squeeze.weight": _conv_t(256, 512, 1), "squeeze.bias": torch.zeros(256),
        "pose_0.weight": _conv_t(256, 256, 3), "pose_0.bias": torch.zeros(256),
        "pose_1.weight": _conv_t(256, 256, 3), "pose_1.bias": torch.zeros(256),
        "pose_2.weight": _conv_t(12, 256, 1), "pose_2.bias": torch.zeros(12),
    }
    pparams = _import_pose_decoder(pstate)
    pdec = PoseDecoder(num_frames_to_predict_for=2)
    pref = pdec.init(jax.random.PRNGKey(0), np.zeros((1, 2, 4, 512), np.float32))["params"]
    assert jax.tree_util.tree_map(lambda x: x.shape, pref) == jax.tree_util.tree_map(
        lambda x: x.shape, pparams
    )


def _mobilenet_v3_small_state():
    """State dict with the torchvision mobilenet_v3_small key layout.

    Sub-layer ordering inside features.{i}.block mirrors torchvision's
    InvertedResidual: [expand?, depthwise, SE?, project]."""
    from tpuslam.models.embedder import _V3_SMALL, _make_divisible

    state = {"features.0.0.weight": torch.randn(16, 3, 3, 3)}

    def bn(name, ch):
        state[f"{name}.weight"] = torch.ones(ch)
        state[f"{name}.bias"] = torch.zeros(ch)
        state[f"{name}.running_mean"] = torch.zeros(ch)
        state[f"{name}.running_var"] = torch.ones(ch)

    bn("features.0.1", 16)
    inp = 16
    for i, (k, exp, out, use_se, _, _) in enumerate(_V3_SMALL):
        src = f"features.{i + 1}.block"
        j = 0
        if exp != inp:
            state[f"{src}.{j}.0.weight"] = torch.randn(exp, inp, 1, 1)
            bn(f"{src}.{j}.1", exp)
            j += 1
        state[f"{src}.{j}.0.weight"] = torch.randn(exp, 1, k, k)
        bn(f"{src}.{j}.1", exp)
        j += 1
        if use_se:
            sq = _make_divisible(exp // 4)
            state[f"{src}.{j}.fc1.weight"] = torch.randn(sq, exp, 1, 1)
            state[f"{src}.{j}.fc1.bias"] = torch.zeros(sq)
            state[f"{src}.{j}.fc2.weight"] = torch.randn(exp, sq, 1, 1)
            state[f"{src}.{j}.fc2.bias"] = torch.zeros(exp)
            j += 1
        state[f"{src}.{j}.0.weight"] = torch.randn(out, exp, 1, 1)
        bn(f"{src}.{j}.1", out)
        inp = out
    state["features.12.0.weight"] = torch.randn(576, 96, 1, 1)
    bn("features.12.1", 576)
    # classifier keys must be ignored by the importer
    state["classifier.0.weight"] = torch.randn(1024, 576)
    state["classifier.0.bias"] = torch.zeros(1024)
    return state


def test_mobilenet_import_matches_flax_tree():
    import jax
    import jax.numpy as jnp

    from tpuslam.models.embedder import MobileNetV3SmallEmbedder

    state = _mobilenet_v3_small_state()
    params, stats = import_mobilenet_v3_small(state)

    emb = MobileNetV3SmallEmbedder()
    ref = emb.init(jax.random.PRNGKey(0), np.zeros((1, 64, 96, 3), np.float32))
    for got, want, name in (
        (params, ref["params"], "params"),
        (stats, ref["batch_stats"], "batch_stats"),
    ):
        got_s = jax.tree_util.tree_map(lambda x: x.shape, got)
        want_s = jax.tree_util.tree_map(lambda x: x.shape, want)
        assert got_s == want_s, name

    # imported tree must actually run and produce a finite 576-d embedding
    out = emb.apply(
        {"params": params, "batch_stats": stats},
        jnp.linspace(0, 1, 1 * 64 * 96 * 3).reshape(1, 64, 96, 3),
    )
    assert out.shape == (1, 576)
    assert bool(jnp.all(jnp.isfinite(out)))

    # OIHW -> HWIO: stem element (o, i, kh, kw) lands at (kh, kw, i, o)
    t = state["features.0.0.weight"].numpy()
    np.testing.assert_array_equal(params["stem"]["kernel"][2, 1, 0, 7], t[7, 0, 2, 1])

"""Reference PyTorch checkpoint import: key mapping + tensor layout."""
import numpy as np
import pytest
import torch

from tpuslam.checkpoint.torch_import import (
    _import_depth_decoder,
    _import_pose_decoder,
    _import_resnet,
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

"""Golden network parity: flax CNNs vs independent PyTorch implementations.

Completes the "within 1% of the PyTorch reference" verification chain
(tests/test_torch_golden.py covers warp+loss): the ResNet-18 encoder, depth
decoder and pose decoder are re-implemented here in NCHW torch from the
reference formulas
(/root/reference/depth_pose_prediction/networks/resnet_encoder.py:13-125,
depth_decoder.py:51-71, pose_decoder.py:37-54), with parameter names laid out
exactly like the reference checkpoints (torchvision ResNet keys;
`upconv_{i}_{j}.conv.conv` / `dispconv_{s}.conv` decoder keys), so their
`state_dict()` round-trips through `tpuslam.checkpoint.torch_import` and the
flax forwards must reproduce the torch forwards on random weights AND random
BN running stats to float32 precision.

Also unit-tests the ImageNet-init path (`import_torchvision_resnet`): the
bare-torchvision state dict (incl. `fc.*` classifier keys, which must be
ignored) and the multi-image conv1 replication/averaging of the pose stem
(resnet_encoder.py:71-75).
"""
import numpy as np
import pytest
import torch
from torch import nn
import torch.nn.functional as F

import jax.numpy as jnp

from tpuslam.checkpoint.torch_import import (
    _import_depth_decoder,
    _import_pose_decoder,
    import_torchvision_resnet,
)
from tpuslam.models.decoders import DepthDecoder, PoseDecoder
from tpuslam.models.resnet import ResNetEncoder

H, W = 64, 128


# --------------------------------------------------------------------------
# torch reference networks (independent reimplementations, reference layout)
# --------------------------------------------------------------------------
class TBasicBlock(nn.Module):
    def __init__(self, inp, out, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inp, out, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(out)
        self.conv2 = nn.Conv2d(out, out, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(out)
        self.downsample = (
            nn.Sequential(
                nn.Conv2d(inp, out, 1, stride, bias=False), nn.BatchNorm2d(out)
            )
            if (stride != 1 or inp != out)
            else None
        )

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + r)


class TResNet18(nn.Module):
    """torchvision-key-compatible ResNet-18 trunk + the reference encoder's
    forward ((x-0.45)/0.225 normalisation, 5 feature stages,
    resnet_encoder.py:115-125).  `fc` exists only so the state dict looks
    like a bare ImageNet classifier checkpoint."""

    def __init__(self, num_input_images=1):
        super().__init__()
        self.conv1 = nn.Conv2d(3 * num_input_images, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.layer1 = nn.Sequential(TBasicBlock(64, 64), TBasicBlock(64, 64))
        self.layer2 = nn.Sequential(TBasicBlock(64, 128, 2), TBasicBlock(128, 128))
        self.layer3 = nn.Sequential(TBasicBlock(128, 256, 2), TBasicBlock(256, 256))
        self.layer4 = nn.Sequential(TBasicBlock(256, 512, 2), TBasicBlock(512, 512))
        self.fc = nn.Linear(512, 1000)

    def forward(self, x):
        x = (x - 0.45) / 0.225
        f0 = F.relu(self.bn1(self.conv1(x)))
        f1 = self.layer1(F.max_pool2d(f0, 3, 2, 1))
        f2 = self.layer2(f1)
        f3 = self.layer3(f2)
        f4 = self.layer4(f3)
        return [f0, f1, f2, f3, f4]


class TConv3x3(nn.Module):
    """ReflectionPad + 3x3 conv (reference layers.py:28-48); key `conv.*`."""

    def __init__(self, inp, out):
        super().__init__()
        self.conv = nn.Conv2d(inp, out, 3)

    def forward(self, x):
        return self.conv(F.pad(x, (1, 1, 1, 1), mode="reflect"))


class TConvBlock(nn.Module):
    """Conv3x3 + ELU (reference layers.py:9-25); key `conv.conv.*`."""

    def __init__(self, inp, out):
        super().__init__()
        self.conv = TConv3x3(inp, out)

    def forward(self, x):
        return F.elu(self.conv(x))


class TDepthDecoder(nn.Module):
    """Reference depth decoder (depth_decoder.py:51-71): 5 up-stages of
    ConvBlock -> nearest upsample (sized to the skip) -> skip concat ->
    ConvBlock, sigmoid disparity heads at scales 0-3."""

    def __init__(self, num_ch_encoder=(64, 64, 128, 256, 512), scales=(0, 1, 2, 3)):
        super().__init__()
        self.scales = scales
        num_ch_dec = (16, 32, 64, 128, 256)
        for i in range(4, -1, -1):
            ch_in = num_ch_encoder[-1] if i == 4 else num_ch_dec[i + 1]
            setattr(self, f"upconv_{i}_0", TConvBlock(ch_in, num_ch_dec[i]))
            ch_in = num_ch_dec[i] + (num_ch_encoder[i - 1] if i > 0 else 0)
            setattr(self, f"upconv_{i}_1", TConvBlock(ch_in, num_ch_dec[i]))
        for s in scales:
            setattr(self, f"dispconv_{s}", TConv3x3(num_ch_dec[s], 1))

    def forward(self, features):
        out = {}
        x = features[-1]
        for i in range(4, -1, -1):
            x = getattr(self, f"upconv_{i}_0")(x)
            if i > 0:
                x = F.interpolate(x, size=features[i - 1].shape[2:], mode="nearest")
                x = torch.cat([x, features[i - 1]], 1)
            else:
                x = F.interpolate(x, scale_factor=2, mode="nearest")
            x = getattr(self, f"upconv_{i}_1")(x)
            if i in self.scales:
                out[("disp", i)] = torch.sigmoid(getattr(self, f"dispconv_{i}")(x))
        return out


class TPoseDecoder(nn.Module):
    """Reference pose decoder (pose_decoder.py:27-54), single input feature."""

    def __init__(self, num_frames=2):
        super().__init__()
        self.num_frames = num_frames
        self.squeeze = nn.Conv2d(512, 256, 1)
        self.pose_0 = nn.Conv2d(256, 256, 3, 1, 1)
        self.pose_1 = nn.Conv2d(256, 256, 3, 1, 1)
        self.pose_2 = nn.Conv2d(256, 6 * num_frames, 1)

    def forward(self, f):
        x = F.relu(self.squeeze(f))
        x = F.relu(self.pose_0(x))
        x = F.relu(self.pose_1(x))
        x = self.pose_2(x)
        x = 0.01 * x.mean(3).mean(2).view(-1, self.num_frames, 1, 6)
        return x[..., :3], x[..., 3:]


def _randomize(module: nn.Module, seed: int):
    """Random weights AND random (positive-var) BN running stats, so eval-mode
    parity exercises the running-stat path the online SLAM loop uses."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        for m in module.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) * 0.5 + 0.5)
    module.eval()
    return module


def _image(rng, c=3):
    return rng.uniform(0.0, 1.0, (2, H, W, c)).astype(np.float32)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_resnet_encoder_forward_parity(rng):
    tnet = _randomize(TResNet18(), seed=1)
    params, stats = import_torchvision_resnet(tnet.state_dict())
    flax_net = ResNetEncoder(num_layers=18, num_input_images=1)

    x = _image(rng)
    with torch.no_grad():
        want = tnet(torch.from_numpy(x).permute(0, 3, 1, 2))
    got = flax_net.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
    )
    assert len(got) == 5
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(
            np.asarray(g).transpose(0, 3, 1, 2), w.numpy(), atol=1e-4,
            err_msg=f"encoder stage {i}",
        )


def test_imagenet_stem_replication(rng):
    """import_torchvision_resnet(num_input_images=2) == the reference's
    cat([conv1]*2, dim=1)/2 (resnet_encoder.py:71-75), verified end-to-end:
    a torch 6-channel encoder loaded with the replicated ImageNet state dict
    must match the flax pose encoder imported from the BARE 3-channel dict."""
    tnet3 = _randomize(TResNet18(num_input_images=1), seed=2)
    bare = tnet3.state_dict()

    # the reference's replication, applied to an independent 6-ch torch net
    loaded = {k: v.clone() for k, v in bare.items()}
    loaded["conv1.weight"] = torch.cat([loaded["conv1.weight"]] * 2, 1) / 2
    tnet6 = TResNet18(num_input_images=2)
    tnet6.load_state_dict(loaded)
    tnet6.eval()

    params, stats = import_torchvision_resnet(bare, num_input_images=2)
    assert params["conv1"]["kernel"].shape == (7, 7, 6, 64)
    flax_net = ResNetEncoder(num_layers=18, num_input_images=2)

    x = _image(rng, c=6)
    with torch.no_grad():
        want = tnet6(torch.from_numpy(x).permute(0, 3, 1, 2))
    got = flax_net.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
    )
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(
            np.asarray(g).transpose(0, 3, 1, 2), w.numpy(), atol=1e-4,
            err_msg=f"pose encoder stage {i}",
        )


def _encoder_features(rng):
    """A random encoder-shaped feature pyramid in both layouts."""
    chans = (64, 64, 128, 256, 512)
    feats = [
        rng.normal(scale=0.5, size=(2, H // 2 ** (i + 1), W // 2 ** (i + 1), c)).astype(
            np.float32
        )
        for i, c in enumerate(chans)
    ]
    tfeats = [torch.from_numpy(f).permute(0, 3, 1, 2) for f in feats]
    return feats, tfeats


def test_depth_decoder_forward_parity(rng):
    tdec = _randomize(TDepthDecoder(), seed=3)
    params = _import_depth_decoder(tdec.state_dict())
    fdec = DepthDecoder(scales=(0, 1, 2, 3))

    feats, tfeats = _encoder_features(rng)
    with torch.no_grad():
        want = tdec(tfeats)
    got = fdec.apply({"params": params}, [jnp.asarray(f) for f in feats])
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(
            np.asarray(got[k]).transpose(0, 3, 1, 2), want[k].numpy(), atol=1e-4,
            err_msg=str(k),
        )


def test_pose_decoder_forward_parity(rng):
    tdec = _randomize(TPoseDecoder(), seed=4)
    params = _import_pose_decoder(tdec.state_dict())
    fdec = PoseDecoder(num_frames_to_predict_for=2)

    f = rng.normal(scale=0.5, size=(2, H // 32, W // 32, 512)).astype(np.float32)
    with torch.no_grad():
        want_aa, want_tr = tdec(torch.from_numpy(f).permute(0, 3, 1, 2))
    got_aa, got_tr = fdec.apply({"params": params}, jnp.asarray(f))
    # flax decoder returns (B, num_frames, 3); torch keeps an extra len-1 dim
    np.testing.assert_allclose(got_aa, want_aa[:, :, 0].numpy(), atol=1e-6)
    np.testing.assert_allclose(got_tr, want_tr[:, :, 0].numpy(), atol=1e-6)


def test_full_network_stack_parity(rng):
    """Encoder -> depth decoder -> disparity AND pose encoder -> pose decoder
    composed end-to-end: random torch nets, weights imported, forwards match.
    This plus test_torch_golden.py's warp+loss parity closes the whole
    forward chain behind the 'within 1% of PyTorch' target."""
    tenc = _randomize(TResNet18(), seed=5)
    tdec = _randomize(TDepthDecoder(), seed=6)
    tpenc = _randomize(TResNet18(num_input_images=2), seed=7)
    tpdec = _randomize(TPoseDecoder(), seed=8)

    from tpuslam.checkpoint.torch_import import _import_resnet
    from tpuslam.models.depth_pose import DepthPoseNet

    params = {}
    stats = {}
    params["depth_encoder"], stats["depth_encoder"] = _import_resnet(
        tenc.state_dict(), prefix=""
    )
    params["pose_encoder"], stats["pose_encoder"] = _import_resnet(
        tpenc.state_dict(), prefix=""
    )
    params["depth_decoder"] = _import_depth_decoder(tdec.state_dict())
    params["pose_decoder"] = _import_pose_decoder(tpdec.state_dict())
    model = DepthPoseNet()
    variables = {"params": params, "batch_stats": stats}

    x = _image(rng)
    pair = _image(rng, c=6)
    with torch.no_grad():
        want_disps = tdec(tenc(torch.from_numpy(x).permute(0, 3, 1, 2)))
        want_aa, want_tr = tpdec(
            tpenc(torch.from_numpy(pair).permute(0, 3, 1, 2))[-1]
        )
    disps, _ = model.apply(variables, jnp.asarray(x), method=DepthPoseNet.depth_forward)
    aa, tr = model.apply(
        variables, jnp.asarray(pair), method=DepthPoseNet.pose_forward
    )
    for s in (0, 1, 2, 3):
        np.testing.assert_allclose(
            np.asarray(disps[("disp", s)]).transpose(0, 3, 1, 2),
            want_disps[("disp", s)].numpy(),
            atol=1e-4,
            err_msg=f"disp scale {s}",
        )
    # DepthPoseNet.pose_decode takes frame [:, 0] like the reference (:965)
    np.testing.assert_allclose(aa, want_aa[:, 0, 0].numpy(), atol=1e-6)
    np.testing.assert_allclose(tr, want_tr[:, 0, 0].numpy(), atol=1e-6)


def test_init_encoders_from_imagenet_merges_and_validates(tmp_path, rng):
    """The resnet_pretrained / encoder_weights knobs: a local torchvision-
    style .pth initialises both encoders; requiring it without a path fails
    loudly (no egress to download)."""
    from tpuslam.checkpoint.torch_import import init_encoders_from_imagenet
    from tpuslam.models import init_depth_pose
    import jax

    tnet = _randomize(TResNet18(), seed=9)
    path = tmp_path / "resnet18.pth"
    torch.save(tnet.state_dict(), path)

    _, variables = init_depth_pose(jax.random.PRNGKey(0), height=H, width=W)
    merged = init_encoders_from_imagenet(variables, path)
    want = tnet.state_dict()["conv1.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(
        merged["params"]["depth_encoder"]["conv1"]["kernel"], want, atol=0
    )
    np.testing.assert_allclose(
        merged["params"]["pose_encoder"]["conv1"]["kernel"],
        np.concatenate([want] * 2, axis=2) / 2,
        atol=0,
    )
    # decoders untouched
    assert merged["params"]["depth_decoder"] is variables["params"]["depth_decoder"]

    with pytest.raises(FileNotFoundError):
        init_encoders_from_imagenet(variables, None, required=True)

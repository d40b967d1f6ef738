"""Import reference PyTorch checkpoints into tpuslam's flax parameter tree.

Maps the reference's per-network `.pth` state dicts
(depth_encoder/depth_decoder/pose_encoder/pose_decoder saved by
/root/reference/depth_pose_prediction/depth_pose_prediction.py:669-703, keys
following torchvision ResNet and the monodepth2 decoders) onto the
`DepthPoseNet` tree, so models pretrained with the reference can be served /
adapted by this framework.  Conv kernels transpose OIHW -> HWIO; BatchNorm
weight/bias/running_mean/running_var map to scale/bias/mean/var.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Tuple

import numpy as np


def _to_numpy(t) -> np.ndarray:
    # copy=True: torch's .numpy() SHARES storage with the tensor, and
    # np.asarray keeps the alias when dtypes match — an imported tree must
    # not silently track later in-place mutations of the source module
    # (e.g. an optimizer.step() in a parity test)
    return np.array(t.detach().cpu().numpy(), np.float32, copy=True)


def _conv(t) -> np.ndarray:
    return _to_numpy(t).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def _load_pth(path: Path) -> Dict[str, Any]:
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def _import_resnet(
    state: Dict[str, Any], prefix: str = "resnet."
) -> Tuple[Dict, Dict]:
    """Torch ResNet state dict -> (params subtree, batch_stats subtree)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def bn(src: str, dst: str):
        params[dst] = {
            "scale": _to_numpy(state[f"{src}.weight"]),
            "bias": _to_numpy(state[f"{src}.bias"]),
        }
        stats[dst] = {
            "mean": _to_numpy(state[f"{src}.running_mean"]),
            "var": _to_numpy(state[f"{src}.running_var"]),
        }

    params["conv1"] = {"kernel": _conv(state[f"{prefix}conv1.weight"])}
    bn(f"{prefix}bn1", "bn1")
    layer = 1
    while f"{prefix}layer{layer}.0.conv1.weight" in state:
        block = 0
        while f"{prefix}layer{layer}.{block}.conv1.weight" in state:
            name = f"layer{layer}_{block}"
            src = f"{prefix}layer{layer}.{block}"
            sub = {
                "conv1": {"kernel": _conv(state[f"{src}.conv1.weight"])},
                "conv2": {"kernel": _conv(state[f"{src}.conv2.weight"])},
            }
            sub_stats: Dict[str, Any] = {}
            for bn_i in (1, 2):
                sub[f"bn{bn_i}"] = {
                    "scale": _to_numpy(state[f"{src}.bn{bn_i}.weight"]),
                    "bias": _to_numpy(state[f"{src}.bn{bn_i}.bias"]),
                }
                sub_stats[f"bn{bn_i}"] = {
                    "mean": _to_numpy(state[f"{src}.bn{bn_i}.running_mean"]),
                    "var": _to_numpy(state[f"{src}.bn{bn_i}.running_var"]),
                }
            if f"{src}.downsample.0.weight" in state:
                sub["downsample_conv"] = {
                    "kernel": _conv(state[f"{src}.downsample.0.weight"])
                }
                sub["downsample_bn"] = {
                    "scale": _to_numpy(state[f"{src}.downsample.1.weight"]),
                    "bias": _to_numpy(state[f"{src}.downsample.1.bias"]),
                }
                sub_stats["downsample_bn"] = {
                    "mean": _to_numpy(state[f"{src}.downsample.1.running_mean"]),
                    "var": _to_numpy(state[f"{src}.downsample.1.running_var"]),
                }
            params[name] = sub
            stats[name] = sub_stats
            block += 1
        layer += 1
    return params, stats


def _import_depth_decoder(state: Dict[str, Any]) -> Dict:
    params: Dict[str, Any] = {}
    for i in range(5):
        for j in range(2):
            src = f"upconv_{i}_{j}.conv.conv"
            params[f"upconv_{i}_{j}_conv"] = {
                "kernel": _conv(state[f"{src}.weight"]),
                "bias": _to_numpy(state[f"{src}.bias"]),
            }
    for key in state:
        if key.startswith("dispconv_") and key.endswith(".conv.weight"):
            s = key.split("_")[1].split(".")[0]
            params[f"dispconv_{s}_conv"] = {
                "kernel": _conv(state[f"dispconv_{s}.conv.weight"]),
                "bias": _to_numpy(state[f"dispconv_{s}.conv.bias"]),
            }
    return params


def _import_pose_decoder(state: Dict[str, Any]) -> Dict:
    params: Dict[str, Any] = {}
    for name in ("squeeze", "pose_0", "pose_1", "pose_2"):
        params[name] = {
            "kernel": _conv(state[f"{name}.weight"]),
            "bias": _to_numpy(state[f"{name}.bias"]),
        }
    return params


def import_torchvision_resnet(
    state: Dict[str, Any], num_input_images: int = 1
) -> Tuple[Dict, Dict]:
    """Bare torchvision ResNet (ImageNet classifier) state dict ->
    (params, batch_stats) subtree for one `ResNetEncoder`.

    This is how the reference actually starts pretraining: its encoders are
    built with `pretrained=True`, and the multi-image pose stem replicates
    the ImageNet conv1 kernel across the stacked input images and divides by
    their count so activations keep the single-image magnitude
    (/root/reference/depth_pose_prediction/networks/resnet_encoder.py:47-76,
    :100-109).  Classifier keys (`fc.*`) are ignored.
    """
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    params, stats = _import_resnet(state, prefix="")
    if num_input_images > 1:
        k = params["conv1"]["kernel"]  # HWIO — input channels on axis 2
        params["conv1"]["kernel"] = (
            np.concatenate([k] * num_input_images, axis=2) / num_input_images
        ).astype(np.float32)
    return params, stats


def load_imagenet_encoders(
    path: Path, num_pose_images: int = 2
) -> Tuple[Dict, Dict]:
    """torchvision ResNet `.pth` -> {depth_encoder, pose_encoder} subtrees.

    One ImageNet checkpoint initialises BOTH encoders like the reference's
    `ResnetEncoder(num_layers, pretrained=True)` does for depth (1 image) and
    pose (2 stacked images, conv1 replicated/averaged).  Merge the returned
    trees into `DepthPoseNet` variables before training.
    """
    state = _load_pth(Path(path))
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    d_params, d_stats = import_torchvision_resnet(state, num_input_images=1)
    p_params, p_stats = import_torchvision_resnet(
        state, num_input_images=num_pose_images
    )
    return (
        {"depth_encoder": d_params, "pose_encoder": p_params},
        {"depth_encoder": d_stats, "pose_encoder": p_stats},
    )


def init_encoders_from_imagenet(
    variables: Dict[str, Any], encoder_weights, required: bool = False
) -> Dict[str, Any]:
    """Replace the encoder subtrees of `DepthPoseNet` variables with
    ImageNet-initialised ones (reference `pretrained=True` semantics).

    No-op when `encoder_weights` is None unless `required` (the
    `resnet_pretrained` knob), which then raises — there is no network
    egress to fetch torchvision weights from, so a local .pth is mandatory.
    """
    if encoder_weights is None:
        if required:
            raise FileNotFoundError(
                "resnet_pretrained=True requires encoder_weights pointing at "
                "a local torchvision ResNet .pth (this environment has no "
                "network egress to download ImageNet weights)"
            )
        return variables
    enc_params, enc_stats = load_imagenet_encoders(encoder_weights)
    for net in ("depth_encoder", "pose_encoder"):
        have = variables["params"][net]["conv1"]["kernel"].shape
        got = enc_params[net]["conv1"]["kernel"].shape
        if tuple(have) != tuple(got):
            raise ValueError(
                f"{net} conv1 shape mismatch: model {tuple(have)} vs "
                f"checkpoint {tuple(got)} — wrong ResNet depth or stem width?"
            )
    params = {**variables["params"], **enc_params}
    stats = {**variables["batch_stats"], **enc_stats}
    return {**variables, "params": params, "batch_stats": stats}


def import_mobilenet_v3_small(state: Dict[str, Any]) -> Tuple[Dict, Dict]:
    """torchvision mobilenet_v3_small state dict -> (params, batch_stats)
    trees for `tpuslam.models.embedder.MobileNetV3SmallEmbedder`.

    The reference's loop-closure encoder is exactly this network truncated at
    its flatten node (/root/reference/loop_closure_detection/encoder.py:28-33),
    so importing the torchvision ImageNet checkpoint reproduces its 576-d
    retrieval features (and the 0.99 detection threshold calibrated to them).

    torchvision layout: features.0.{0,1} = stem conv+BN;
    features.{i}.block.{j} = inverted residual sub-layers in order
    [expand?, depthwise, SE?, project], each Conv+BN pair except SE
    (fc1/fc2 1x1 convs with bias); features.12.{0,1} = 576-ch head conv+BN.
    Classifier keys are ignored.
    """
    from tpuslam.models.embedder import _V3_SMALL

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def bn(src: str) -> Tuple[Dict, Dict]:
        return (
            {
                "scale": _to_numpy(state[f"{src}.weight"]),
                "bias": _to_numpy(state[f"{src}.bias"]),
            },
            {
                "mean": _to_numpy(state[f"{src}.running_mean"]),
                "var": _to_numpy(state[f"{src}.running_var"]),
            },
        )

    params["stem"] = {"kernel": _conv(state["features.0.0.weight"])}
    params["stem_bn"], stats["stem_bn"] = bn("features.0.1")

    inp = 16  # stem output channels
    for i, (_, expanded, out, use_se, _, _) in enumerate(_V3_SMALL):
        src = f"features.{i + 1}.block"
        sub: Dict[str, Any] = {}
        sub_stats: Dict[str, Any] = {}
        j = 0
        if expanded != inp:
            sub["expand"] = {"kernel": _conv(state[f"{src}.{j}.0.weight"])}
            sub["expand_bn"], sub_stats["expand_bn"] = bn(f"{src}.{j}.1")
            j += 1
        sub["dw"] = {"kernel": _conv(state[f"{src}.{j}.0.weight"])}
        sub["dw_bn"], sub_stats["dw_bn"] = bn(f"{src}.{j}.1")
        j += 1
        if use_se:
            sub["se"] = {
                "fc1": {
                    "kernel": _conv(state[f"{src}.{j}.fc1.weight"]),
                    "bias": _to_numpy(state[f"{src}.{j}.fc1.bias"]),
                },
                "fc2": {
                    "kernel": _conv(state[f"{src}.{j}.fc2.weight"]),
                    "bias": _to_numpy(state[f"{src}.{j}.fc2.bias"]),
                },
            }
            j += 1
        sub["project"] = {"kernel": _conv(state[f"{src}.{j}.0.weight"])}
        sub["project_bn"], sub_stats["project_bn"] = bn(f"{src}.{j}.1")
        params[f"block_{i}"] = sub
        stats[f"block_{i}"] = sub_stats
        inp = out

    params["head"] = {"kernel": _conv(state["features.12.0.weight"])}
    params["head_bn"], stats["head_bn"] = bn("features.12.1")
    return params, stats


def load_mobilenet_embedder(path: Path) -> Dict[str, Any]:
    """Load a torchvision mobilenet_v3_small .pth -> flax variables dict
    ready for `MobileNetV3SmallEmbedder.apply`."""
    state = _load_pth(Path(path))
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    params, stats = import_mobilenet_v3_small(state)
    return {"params": params, "batch_stats": stats}


def import_reference_checkpoint(weights_folder: Path) -> Tuple[Dict, Dict]:
    """Load a reference `weights_NNN/` folder -> (params, batch_stats) trees
    compatible with `DepthPoseNet` variables."""
    weights_folder = Path(weights_folder)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    enc_state = _load_pth(weights_folder / "depth_encoder.pth")
    params["depth_encoder"], stats["depth_encoder"] = _import_resnet(enc_state)

    pose_enc_state = _load_pth(weights_folder / "pose_encoder.pth")
    # reference pose encoders built via resnet_multiimage_input store their
    # modules without the 'resnet.' wrapper... they still use it (the wrapper
    # class sets self.resnet); handle both layouts.
    prefix = "resnet." if any(k.startswith("resnet.") for k in pose_enc_state) else ""
    params["pose_encoder"], stats["pose_encoder"] = _import_resnet(
        pose_enc_state, prefix=prefix
    )

    params["depth_decoder"] = _import_depth_decoder(
        _load_pth(weights_folder / "depth_decoder.pth")
    )
    params["pose_decoder"] = _import_pose_decoder(
        _load_pth(weights_folder / "pose_decoder.pth")
    )
    return params, stats

"""Golden parity: the fused warp+loss pipeline vs an independent PyTorch
implementation of the reference formulas.

The reference's hot math — `_reconstruct_images` + `_compute_loss`
(/root/reference/depth_pose_prediction/depth_pose_prediction.py:976-1120),
`transformation_from_parameters` (utils.py:34-117), SSIM / Backproject /
Project3D (networks/layers.py:51-137) and `disp_to_depth` (utils.py:120-142)
— re-implemented here in NCHW torch, from the published formulas, and
asserted to match tpuslam's production `warp_and_loss` on a fixed batch to
<= 1e-5.  This is the strongest stand-in available for the "within 1% of the
PyTorch reference" north star given no datasets or pretrained weights: if
the composed loss surfaces agree to float precision, the optimisation
trajectories do too.

Identity tie-break noise is disabled on both sides (rng=None; the noise is
1e-5-scale and rng-convention-dependent — SURVEY §7 'RNG parity').
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from tpuslam.geometry.se3 import transformation_from_parameters
from tpuslam.train import LossConfig, make_frame_batch
from tpuslam.train.steps import warp_and_loss

B, H, W = 2, 32, 64
SCALES = (0, 1, 2, 3)


# --------------------------------------------------------------------------
# torch reference pipeline (independent reimplementation of the formulas)
# --------------------------------------------------------------------------
def rot_from_axisangle_t(axis_angle: torch.Tensor) -> torch.Tensor:
    """(B, 3) -> (B, 4, 4) rotation, reference utils.py:74-117 (note the
    1e-7-regularised axis normalisation)."""
    angle = torch.norm(axis_angle, 2, 1, True)  # (B, 1)
    axis = axis_angle / (angle + 1e-7)
    ca, sa = torch.cos(angle)[:, 0], torch.sin(angle)[:, 0]
    C = 1 - ca
    x, y, z = axis[:, 0], axis[:, 1], axis[:, 2]
    rot = torch.zeros(axis_angle.shape[0], 4, 4)
    rot[:, 0, 0] = x * x * C + ca
    rot[:, 0, 1] = x * y * C - z * sa
    rot[:, 0, 2] = z * x * C + y * sa
    rot[:, 1, 0] = x * y * C + z * sa
    rot[:, 1, 1] = y * y * C + ca
    rot[:, 1, 2] = y * z * C - x * sa
    rot[:, 2, 0] = z * x * C - y * sa
    rot[:, 2, 1] = y * z * C + x * sa
    rot[:, 2, 2] = z * z * C + ca
    rot[:, 3, 3] = 1
    return rot


def transformation_t(axis_angle, translation, invert=False) -> torch.Tensor:
    """Reference transformation_from_parameters (utils.py:34-55)."""
    R = rot_from_axisangle_t(axis_angle)
    t = translation.clone()
    if invert:
        R = R.transpose(1, 2)
        t = -t
    T = torch.eye(4).repeat(len(t), 1, 1)
    T[:, :3, 3] = t
    return R @ T if invert else T @ R


def disp_to_depth_t(disp, min_depth, max_depth):
    """Reference disp_to_depth (utils.py:120-142)."""
    if min_depth is None and max_depth is None:
        return 1 / disp
    if max_depth is None:
        return min_depth / disp
    min_disp, max_disp = 1 / max_depth, 1 / min_depth
    return 1 / (min_disp + (max_disp - min_disp) * disp)


def ssim_t(x, y):
    """Reference SSIM module (layers.py:107-137), NCHW."""
    x = F.pad(x, (1, 1, 1, 1), mode="reflect")
    y = F.pad(y, (1, 1, 1, 1), mode="reflect")
    mu_x = F.avg_pool2d(x, 3, 1)
    mu_y = F.avg_pool2d(y, 3, 1)
    sigma_x = F.avg_pool2d(x * x, 3, 1) - mu_x**2
    sigma_y = F.avg_pool2d(y * y, 3, 1) - mu_y**2
    sigma_xy = F.avg_pool2d(x * y, 3, 1) - mu_x * mu_y
    n = (2 * mu_x * mu_y + 0.01**2) * (2 * sigma_xy + 0.03**2)
    d = (mu_x**2 + mu_y**2 + 0.01**2) * (sigma_x + sigma_y + 0.03**2)
    return torch.clamp((1 - n / d) / 2, 0, 1)


def reprojection_t(pred, target):
    """0.85 SSIM + 0.15 L1 (depth_pose_prediction.py:1178-1192) -> (B,1,H,W)."""
    l1 = torch.abs(target - pred).mean(1, True)
    return 0.85 * ssim_t(pred, target).mean(1, True) + 0.15 * l1


def smooth_t(disp, img):
    """Edge-aware smoothness on (B,1,h,w) vs (B,3,h,w) -> (B,)
    (depth_pose_prediction.py:1148-1176, all-ones mask path)."""
    gdx = torch.abs(disp[:, :, :, :-1] - disp[:, :, :, 1:])
    gdy = torch.abs(disp[:, :, :-1, :] - disp[:, :, 1:, :])
    gix = torch.abs(img[:, :, :, :-1] - img[:, :, :, 1:]).mean(1, True)
    giy = torch.abs(img[:, :, :-1, :] - img[:, :, 1:, :]).mean(1, True)
    gdx = gdx * torch.exp(-gix)
    gdy = gdy * torch.exp(-giy)
    return gdx.flatten(1).mean(1) + gdy.flatten(1).mean(1)


def reference_pipeline(data, cfg: LossConfig, leaves=None):
    """Reference _reconstruct_images + _compute_loss on NCHW tensors.

    `leaves` optionally overrides entries of `data` with torch tensors
    (e.g. requires_grad leaves for the backward-parity tests, or decoder
    outputs carrying a network graph) — same keys/layouts as `data`."""
    t = {k: torch.from_numpy(v) for k, v in data.items() if isinstance(v, np.ndarray)}
    if leaves:
        t.update(leaves)
    rgb = {f: t[f"rgb_{f}"].permute(0, 3, 1, 2) for f in (0, -1, 1)}
    pyr = {s: t[f"pyr_{s}"].permute(0, 3, 1, 2) for s in SCALES}
    disps = {s: t[f"disp_{s}"].permute(0, 3, 1, 2) for s in SCALES}
    K, inv_K = t["K"], torch.linalg.inv(t["K"])
    aa, tr = t["aa"], t["tr"]
    T = {
        -1: transformation_t(aa[:B], tr[:B], invert=True),
        1: transformation_t(aa[B:], tr[B:], invert=False),
    }

    # pixel grid (layers.py:61-72)
    gx, gy = np.meshgrid(range(W), range(H), indexing="xy")
    pix = torch.from_numpy(
        np.stack([gx.reshape(-1), gy.reshape(-1), np.ones(H * W)], 0)
    ).float()[None].repeat(B, 1, 1)  # (B, 3, HW)
    ones = torch.ones(B, 1, H * W)

    warped = {}
    for s in SCALES:
        disp = F.interpolate(disps[s], (H, W), mode="bilinear", align_corners=False)
        depth = disp_to_depth_t(disp, cfg.min_depth, cfg.max_depth)
        cam = inv_K[:, :3, :3] @ pix
        cam = depth.reshape(B, 1, -1) * cam
        points = torch.cat([cam, ones], 1)  # (B, 4, HW)
        for f in (-1, 1):
            P = (K @ T[f])[:, :3, :]
            cp = P @ points
            coords = cp[:, :2] / (cp[:, 2:3] + 1e-7)
            coords = coords.reshape(B, 2, H, W).permute(0, 2, 3, 1).clone()
            coords[..., 0] = (coords[..., 0] / (W - 1) - 0.5) * 2
            coords[..., 1] = (coords[..., 1] / (H - 1) - 0.5) * 2
            warped[(f, s)] = F.grid_sample(
                rgb[f], coords, mode="bilinear",
                padding_mode="border", align_corners=True,
            )

    weights = torch.full((B,), 1.0 / B)
    losses = {}
    total = torch.zeros(())
    target = rgb[0]
    for s in SCALES:
        reproj = torch.cat([reprojection_t(warped[(f, s)], target) for f in (-1, 1)], 1)
        ident = torch.cat([reprojection_t(rgb[f], target) for f in (-1, 1)], 1)
        combined = torch.cat([ident, reproj], 1)
        to_opt = combined.min(dim=1).values  # (B, H, W)
        rl = (to_opt.mean(2).mean(1) * weights).sum()
        disp = disps[s]
        norm_disp = disp / (disp.mean(2, True).mean(3, True) + 1e-7)
        sl = (smooth_t(norm_disp, pyr[s]) * weights).sum()
        reg = cfg.disparity_smoothness / (2**s) * sl
        losses[f"reprojection_loss/scale_{s}"] = rl
        losses[f"smooth_loss/scale_{s}"] = sl
        losses[f"reg_loss/scale_{s}"] = reg
        total = total + rl + reg
    total = total / len(SCALES)
    losses["depth_loss"] = total

    vel = torch.zeros(B)
    for dist_f, trans_half in ((0, slice(0, B)), (1, slice(B, 2 * B))):
        gt = torch.abs(t["rel_dist"][:, dist_f])
        pred = torch.linalg.norm(tr[trans_half], dim=-1)
        vel = vel + torch.abs(pred - gt)
    vel = vel / 2
    losses["velocity_loss"] = cfg.velocity_loss_scaling * (vel * weights).sum()
    total = total + losses["velocity_loss"]
    losses["loss"] = total
    return losses, warped, T


def _make_data(rng, smooth_images=True):
    def img(h, w):
        x = rng.uniform(0.05, 0.95, (B, h, w, 3)).astype(np.float32)
        if smooth_images:
            # band-limit so sub-pixel warps are numerically stable across
            # implementations (box-blur twice)
            for _ in range(2):
                x = (x + np.roll(x, 1, 1) + np.roll(x, 1, 2) + np.roll(x, 2, 2)) / 4
        return x.astype(np.float32)

    data = {f"rgb_{f}": img(H, W) for f in (0, -1, 1)}
    for s in SCALES:
        data[f"pyr_{s}"] = (
            data["rgb_0"] if s == 0 else img(H // 2**s, W // 2**s)
        )
        data[f"disp_{s}"] = rng.uniform(
            0.1, 0.9, (B, H // 2**s, W // 2**s, 1)
        ).astype(np.float32)
    K = np.array(
        [[0.58 * W, 0, 0.5 * W, 0], [0, 1.92 * H, 0.5 * H, 0],
         [0, 0, 1, 0], [0, 0, 0, 1]], np.float32,
    )
    data["K"] = np.broadcast_to(K, (B, 4, 4)).copy()
    data["aa"] = rng.normal(scale=0.01, size=(2 * B, 3)).astype(np.float32)
    data["tr"] = rng.normal(scale=0.05, size=(2 * B, 3)).astype(np.float32)
    data["rel_dist"] = rng.uniform(0.5, 2.0, (B, 2)).astype(np.float32)
    return data


@pytest.mark.parametrize("min_depth,max_depth", [(0.1, None), (0.1, 100.0)])
def test_full_loss_stack_matches_torch_reference(rng, min_depth, max_depth):
    cfg = LossConfig(scales=SCALES, min_depth=min_depth, max_depth=max_depth)
    data = _make_data(rng)

    ref_losses, ref_warped, ref_T = reference_pipeline(data, cfg)

    batch = make_frame_batch(
        np.stack([data["rgb_-1"], data["rgb_0"], data["rgb_1"]], axis=1),
        data["K"],
        data["rel_dist"],
        quantize=False,
    )
    disps = {("disp", s): jnp.asarray(data[f"disp_{s}"]) for s in SCALES}
    losses, outputs = warp_and_loss(
        disps, jnp.asarray(data["aa"]), jnp.asarray(data["tr"]), batch, cfg,
        rng=None,
        pyramid={s: jnp.asarray(data[f"pyr_{s}"]) for s in SCALES},
    )

    # pose matrices (incl. the invert path) match the reference formula
    np.testing.assert_allclose(
        np.asarray(outputs[("cam_T_cam", 0, -1)]), ref_T[-1].numpy(), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(outputs[("cam_T_cam", 0, 1)]), ref_T[1].numpy(), atol=1e-6
    )
    # every warped image matches grid_sample-based reconstruction
    for f in (-1, 1):
        for s in SCALES:
            ours = np.asarray(outputs[("rgb", f, s)]).transpose(0, 3, 1, 2)
            np.testing.assert_allclose(
                ours, ref_warped[(f, s)].numpy(), atol=5e-5,
                err_msg=f"warped rgb frame {f} scale {s}",
            )
    # every loss component to <= 1e-5
    for key, want in ref_losses.items():
        got = float(losses[key])
        assert abs(got - float(want)) <= 1e-5, (key, got, float(want))

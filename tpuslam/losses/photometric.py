"""Self-supervised photometric losses, fused for a single XLA dispatch.

Reimplements the reference monodepth2-style loss stack
(/root/reference/depth_pose_prediction/depth_pose_prediction.py:1019-1192 and
networks/layers.py:107-137) as pure NHWC jnp functions: per-frame
SSIM+L1 reprojection, min-reprojection auto-masking with identity
reprojection tie-break noise, edge-aware disparity smoothness, and the
velocity (translation-magnitude) supervision term.

Everything here is shape-static and differentiable; the adapt/train steps
call `total_loss` once per scale set inside one jitted function.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

_SSIM_C1 = 0.01**2
_SSIM_C2 = 0.03**2


def _reflect_pad_hw(x: jax.Array, pad: int = 1) -> jax.Array:
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def _avg_pool3(x: jax.Array) -> jax.Array:
    """3x3 mean pool, stride 1, valid — via two separable box filters.

    Separable cumsum-free formulation keeps this on the VPU and lets XLA fuse
    with the surrounding elementwise SSIM math.
    """
    x = (x[:, :-2] + x[:, 1:-1] + x[:, 2:]) / 3.0
    x = (x[:, :, :-2] + x[:, :, 1:-1] + x[:, :, 2:]) / 3.0
    return x


def ssim(x: jax.Array, y: jax.Array) -> jax.Array:
    """SSIM distance in [0, 1] between NHWC images (reference SSIM module).

    Returns (B, H, W, C): clamp((1 - SSIM_map) / 2, 0, 1) after reflection
    padding so the output matches the input spatial size.
    """
    x = _reflect_pad_hw(x)
    y = _reflect_pad_hw(y)
    mu_x = _avg_pool3(x)
    mu_y = _avg_pool3(y)
    sigma_x = _avg_pool3(x * x) - mu_x * mu_x
    sigma_y = _avg_pool3(y * y) - mu_y * mu_y
    sigma_xy = _avg_pool3(x * y) - mu_x * mu_y
    n = (2 * mu_x * mu_y + _SSIM_C1) * (2 * sigma_xy + _SSIM_C2)
    d = (mu_x * mu_x + mu_y * mu_y + _SSIM_C1) * (sigma_x + sigma_y + _SSIM_C2)
    return jnp.clip((1 - n / d) / 2, 0.0, 1.0)


def reprojection_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """0.85*SSIM + 0.15*L1, channel-averaged -> (B, H, W).

    Reference `_compute_reprojection_loss` (depth_pose_prediction.py:1178-1192).
    """
    l1 = jnp.abs(target - pred).mean(axis=-1)
    ssim_l = ssim(pred, target).mean(axis=-1)
    return 0.85 * ssim_l + 0.15 * l1


def smooth_loss(
    disp: jax.Array, img: jax.Array, static_mask: Optional[jax.Array] = None
) -> jax.Array:
    """Edge-aware smoothness on mean-normalised disparity -> (B,) per-sample.

    Reference `_compute_smooth_loss` (depth_pose_prediction.py:1148-1176):
    mean |∂disp| * exp(-|∂img|); with `static_mask` (1 = keep) the mean runs
    over static pixels only (the mask_dynamic pretraining path).
    disp: (B, H, W, 1); img: (B, H, W, 3); static_mask: (B, H, W) or None.
    """
    d = disp[..., 0]
    grad_disp_x = jnp.abs(d[:, :, :-1] - d[:, :, 1:])
    grad_disp_y = jnp.abs(d[:, :-1, :] - d[:, 1:, :])
    grad_img_x = jnp.abs(img[:, :, :-1] - img[:, :, 1:]).mean(axis=-1)
    grad_img_y = jnp.abs(img[:, :-1, :] - img[:, 1:, :]).mean(axis=-1)
    gx = grad_disp_x * jnp.exp(-grad_img_x)
    gy = grad_disp_y * jnp.exp(-grad_img_y)
    if static_mask is None:
        return gx.mean(axis=(1, 2)) + gy.mean(axis=(1, 2))
    mx = static_mask[:, :, :-1]
    my = static_mask[:, :-1, :]
    eps = 1e-7
    sx = (gx * mx).sum(axis=(1, 2)) / (mx.sum(axis=(1, 2)) + eps)
    sy = (gy * my).sum(axis=(1, 2)) / (my.sum(axis=(1, 2)) + eps)
    return sx + sy


def normalize_disp(disp: jax.Array) -> jax.Array:
    """disp / (mean_hw(disp) + 1e-7) — reference depth_pose_prediction.py:1087-1088."""
    mean = disp.mean(axis=(1, 2), keepdims=True)
    return disp / (mean + 1e-7)


def velocity_loss(
    pred_translations: Dict[int, jax.Array],
    relative_distances: Dict[int, jax.Array],
) -> jax.Array:
    """Translation-magnitude supervision -> (B,) per-sample.

    Reference `_compute_velocity_loss` (depth_pose_prediction.py:1125-1146):
    frame 0 pairs translation(0,-1) with |relative_distance[0]| (the -1 -> 0
    gap); frame 1 pairs translation(0,1) with |relative_distance[1]|.
    `pred_translations` maps frame id in {-1, 1} -> (B, 3);
    `relative_distances` maps frame id in {0, 1} -> (B,).
    """
    loss = jnp.zeros_like(relative_distances[1])
    pairs = ((0, -1), (1, 1))
    for dist_frame, trans_frame in pairs:
        gt = jnp.abs(relative_distances[dist_frame])
        pred = jnp.linalg.norm(pred_translations[trans_frame], axis=-1)
        loss = loss + jnp.abs(pred - gt)
    return loss / len(pairs)


def _batched_reprojection(
    preds: Sequence[jax.Array], target: jax.Array
) -> jax.Array:
    """Reprojection losses of N same-shape predictions against one target,
    as ONE stacked `reprojection_loss` call -> (N, B, H, W).

    Identical math to N separate calls, but one fused SSIM graph instead of
    N small ones — measured ~7x faster on the dev TPU attachment (the
    dominant non-warp cost of the adapt iteration)."""
    n = len(preds)
    big = jnp.concatenate(preds, axis=0)  # (N*B, H, W, 3)
    tgt = jnp.tile(target, (n, 1, 1, 1))
    B = target.shape[0]
    return reprojection_loss(big, tgt).reshape((n, B) + target.shape[1:3])


def identity_reprojection(
    inputs: Dict, frame_ids: Tuple[int, ...] = (0, -1, 1)
) -> jax.Array:
    """Stacked identity (unwarped) reprojection losses -> (B, F, H, W).

    Depends only on the input frames, never on the model — the fused adapt
    step computes it once per frame and reuses it across the K iterations."""
    target = inputs[("rgb", 0, 0)]
    maps = _batched_reprojection(
        [inputs[("rgb", f, 0)] for f in frame_ids[1:]], target
    )  # (F, B, H, W)
    return maps.transpose(1, 0, 2, 3)


def total_loss(
    inputs: Dict,
    outputs: Dict,
    *,
    scales: Sequence[int],
    frame_ids: Tuple[int, ...] = (0, -1, 1),
    disparity_smoothness: float = 1e-3,
    velocity_loss_scaling: Optional[float] = 0.05,
    sample_weights: Optional[jax.Array] = None,
    rng: Optional[jax.Array] = None,
    dynamic_masks: Optional[Dict[int, jax.Array]] = None,
    identity_base: Optional[jax.Array] = None,
    scale_prior_weight: float = 0.0,
    scale_prior_disp: float = 0.15,
    reproj_maps: Optional[Dict[Tuple[int, int], jax.Array]] = None,
) -> Dict[str, jax.Array]:
    """Fused multi-scale loss — the reference `_compute_loss` semantics.

    inputs:
      ('rgb', f, 0): (B, H, W, 3) for f in frame_ids — full-resolution targets
      ('rgb', 0, s): (B, H/2^s, W/2^s, 3) for the smoothness term
      ('relative_distance', f): (B,) for f in (0, 1)
    outputs:
      ('rgb', f, s): (B, H, W, 3) warped source frames (full res) per scale
      ('disp', s): (B, H/2^s, W/2^s, 1) raw sigmoid disparity
      ('translation', 0, f): (B, 3) for f in (-1, 1)

    sample_weights default to uniform 1/B.  `rng` drives the 1e-5 identity
    tie-break noise (depth_pose_prediction.py:1054-1056); pass None for a
    deterministic eval-style loss without noise.

    `dynamic_masks` (scale -> (B, Hs, Ws), 1 = dynamic object) activates the
    reference's mask_dynamic pretraining path (:1063-1075): reprojection and
    smoothness average over static pixels globally (not per-sample weighted).

    `scale_prior_weight > 0` adds a log-mean-disparity prior
    (log mean(disp_0) - log scale_prior_disp)^2 — an anti-collapse barrier
    for low-parallax regimes, where the photometric term has a degenerate
    far-plane optimum (disp -> 0 makes every warp the identity, which the
    auto-mask then stops penalising; BASELINE.md depth-collapse finding).
    The reference has no equivalent: it relies on high-parallax data.  Apply
    only in early epochs (Pretrainer `scale_prior_epochs`) so the prior
    steers initialisation without biasing converged depth.
    """
    target = inputs[("rgb", 0, 0)]
    B = target.shape[0]
    if sample_weights is None:
        sample_weights = jnp.full((B,), 1.0 / B, dtype=target.dtype)

    losses: Dict[str, jax.Array] = {}
    total = jnp.zeros((), dtype=target.dtype)

    # Identity reprojection losses are scale-independent: compute once.
    # The 1e-5 tie-break noise is drawn FRESH per scale like the reference
    # (_compute_loss redraws randn inside its scale loop,
    # depth_pose_prediction.py:1044-1056), so tie-breaks stay uncorrelated
    # across scales.
    if identity_base is None:
        identity_base = identity_reprojection(inputs, frame_ids)  # (B, F, H, W)
    # One RNG pass for all scales (cheaper than len(scales) separate draws).
    # The noise is BROADCAST over the batch axis: tie-breaking only needs
    # per-(frame, pixel) jitter, and a batch-independent draw makes the loss
    # invariant to how the batch is sharded across devices — the DP mesh step
    # reproduces the single-device update exactly (tests/test_parallel.py).
    noise = (
        None
        if rng is None
        else 1e-5
        * jax.random.normal(
            rng,
            (len(scales), 1) + identity_base.shape[1:],
            identity_base.dtype,
        )
    )

    # NOTE: per-(frame, scale) reprojection_loss calls measure FASTER inside
    # the fused adapt graph than one stacked call (XLA CSEs the shared
    # target statistics and fuses each map with its producing warp, while a
    # stacked call materialises a 2SB concat + tiled target); standalone the
    # stacked form wins 7x — context matters (BASELINE.md round 2).
    for scale_i, scale in enumerate(scales):
        identity = identity_base if noise is None else identity_base + noise[scale_i]
        if reproj_maps is not None:
            # precomputed per-(frame, scale) error maps (the fused Pallas
            # kernel in ops/pallas_loss.py) — same values as the calls below
            reproj = jnp.stack(
                [reproj_maps[(f, scale)] for f in frame_ids[1:]], axis=1
            )  # (B, F, H, W)
        else:
            reproj = jnp.stack(
                [reprojection_loss(outputs[("rgb", f, scale)], target) for f in frame_ids[1:]],
                axis=1,
            )  # (B, F, H, W)
        combined = jnp.concatenate([identity, reproj], axis=1)
        to_optimize = combined.min(axis=1)  # (B, H, W)
        if dynamic_masks is not None:
            static0 = 1.0 - dynamic_masks[0]  # full-res mask of frame 0
            reproj_l = (to_optimize * static0).sum() / (static0.sum() + 1e-7)
        else:
            reproj_l = (to_optimize.mean(axis=(1, 2)) * sample_weights).sum()
        losses[f"reprojection_loss/scale_{scale}"] = reproj_l

        disp = outputs[("disp", scale)]
        color = inputs[("rgb", 0, scale)]
        if dynamic_masks is not None:
            smooth_l = smooth_loss(
                normalize_disp(disp), color, static_mask=1.0 - dynamic_masks[scale]
            ).mean()
        else:
            smooth_l = (smooth_loss(normalize_disp(disp), color) * sample_weights).sum()
        losses[f"smooth_loss/scale_{scale}"] = smooth_l
        reg_l = disparity_smoothness / (2**scale) * smooth_l
        losses[f"reg_loss/scale_{scale}"] = reg_l

        scale_l = reproj_l + reg_l
        losses[f"depth_loss/scale_{scale}"] = scale_l
        total = total + scale_l

    total = total / len(scales)
    losses["depth_loss"] = total

    if scale_prior_weight > 0:
        mean_disp = outputs[("disp", scales[0])].mean(axis=(1, 2, 3))  # (B,)
        prior = (jnp.log(mean_disp + 1e-7) - jnp.log(scale_prior_disp)) ** 2
        prior_l = scale_prior_weight * (prior * sample_weights).sum()
        losses["scale_prior_loss"] = prior_l
        total = total + prior_l

    if velocity_loss_scaling is not None and velocity_loss_scaling > 0:
        vel = velocity_loss(
            {f: outputs[("translation", 0, f)] for f in (-1, 1)},
            {f: inputs[("relative_distance", f)] for f in (0, 1)},
        )
        vel_l = velocity_loss_scaling * (vel * sample_weights).sum()
        losses["velocity_loss"] = vel_l
        total = total + vel_l

    losses["loss"] = total
    return losses

"""The fused forward/backward steps — the performance core of the framework.

The reference runs per frame: 5 x (python loop: forward, backward, Adam step)
plus a separate eval forward for embeddings
(/root/reference/depth_pose_prediction/depth_pose_prediction.py:291-319 and
slam/slam.py:143-147) — dozens of CUDA dispatches and host round-trips.

Here the whole inner loop is ONE jitted XLA computation per frame
(`adapt_step`): a `lax.scan` over K adaptation iterations (each iteration =
forward + backward + masked Adam update with donated buffers).  The relative
pose, depth map and per-frame losses come from the LAST iteration's
training-batch forward exactly like the reference's adapt(); the
replay-buffer embedding (pooled encoder stage 4) and the loop-closure
embedding ride the same dispatch.  Host control flow (buffer admit/evict,
loop-closure triggers, pose graph) stays outside; shapes are static so the
step compiles once.

TPU-first details:
* frozen encoders run ONCE per frame outside the scan (their outputs are
  iteration-invariant: frozen params + eval-mode BN + constant inputs) and
  are `stop_gradient`-severed — the encoder backward pass is never built,
  unlike the reference's requires_grad masking where grads still flow
  through frozen encoders AND encoders re-run forward every iteration.
  Same for the identity reprojection term and the target image pyramid.
* both pose pairs (0,-1) and (0,+1) run through the pose network as one
  doubled batch -> bigger matmuls for the MXU.
* the image pyramid for the smoothness term is built on-device with 2x2 mean
  pooling (the reference builds LANCZOS pyramids in DataLoader workers;
  smoothness weight is 1e-3 so the filter difference is metric-irrelevant,
  and it removes a host-side hot loop).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from tpuslam.geometry.camera import (
    backproject_depth,
    bilinear_sampler,
    pixel_grid,
    project_3d,
    projection_affine,
    resize_bilinear,
)
from tpuslam.geometry.depth import depth_to_disp, disp_to_depth
from tpuslam.geometry.se3 import transformation_from_parameters
from tpuslam.losses.photometric import identity_reprojection, total_loss
from tpuslam.models.depth_pose import DepthPoseNet
from tpuslam.models.embedder import l2_normalize
from tpuslam.train.batch import FrameBatch
from tpuslam.train.state import TrainState


class LossConfig(NamedTuple):
    """Static loss hyperparameters (part of the jit cache key)."""

    scales: Tuple[int, ...] = (0, 1, 2, 3)
    min_depth: Optional[float] = 0.1
    max_depth: Optional[float] = None
    disparity_smoothness: float = 1e-3
    velocity_loss_scaling: Optional[float] = 0.05
    mask_dynamic: bool = False  # mask dynamic objects (Cityscapes pretraining)
    # Pallas static-window warp kernel: ~6x faster than the XLA gather on the
    # dominant warp stage (measured on the dev TPU attachment, BASELINE.md).
    # Exact for warp displacements within one (8, 128) tile of the target
    # pixel; larger displacements clamp to the window edge (border-like).
    # Requires H % 8 == 0, W % 128 == 0, H >= 24, W >= 384 — silently falls
    # back to the XLA sampler otherwise.  Default ON: within-domain it is
    # bit-exact, out-of-domain pixels are garbage reprojections the
    # min-reprojection auto-mask discards anyway, and the end-to-end SLAM
    # quality A/B matched (BASELINE.md round 2).
    use_pallas_warp: bool = True
    # Static-warp window height = 8 + 2*extra_tiles*8 rows: extra_tiles=2
    # widens the exact vertical-displacement domain to ~16-24 px (near-field
    # road rows at 192x640 exceed the round-2 ~8 px margin — ADVICE r2).
    # DEFAULT 2: with the group-predicated sweep below, the taller window
    # costs ~6% (7.76 -> 7.28 fps on the relay) instead of the dense sweep's
    # ~43%, so the robust margin ships by default; set 1 for the speed
    # ceiling on small-flow regimes.  `pallas_sparse` row-skips window rows
    # no output pixel maps to (per-ROW pl.when — measured net negative;
    # superseded by pallas_group_skip).
    pallas_extra_tiles: int = 2
    pallas_sparse: bool = False
    # `pallas_packed` halves the warp's per-lane gather count by packing
    # both horizontal bilinear taps as bf16 halves of one u32 lane (bf16
    # tap precision; opt-in until a quality A/B on the target silicon —
    # see ops/pallas_warp.py::_row_gather_all_channels_packed).
    pallas_packed: bool = False
    # `pallas_seg_skip` predicates the sweep per 128-lane window segment
    # (3 pl.whens; a typical tile's horizontal footprint hits 1 of 3) on
    # top of packed taps — 1/6 the gathers of the dense f32 sweep.  bf16
    # tap precision like pallas_packed; opt-in pending relay measurement.
    pallas_seg_skip: bool = False
    # `pallas_group_skip` predicates the dense f32 sweep per TILE_H-row
    # vertical window group (3 pl.whens at extra_tiles=1, 5 at 2): whole
    # row groups the block's vertical footprint misses are skipped —
    # gathers, merges and tap selects together, with NO added per-row
    # arithmetic (the packed variants' measured failure mode).  DEFAULT ON:
    # tap-identical to the dense path (equal up to FMA contraction) and
    # measured faster at every window height (BASELINE.md 2026-08-18:
    # +3.5% at extra_tiles=1; -43% -> -6% cost for the extra_tiles=2
    # margin).
    pallas_group_skip: bool = True
    # `pallas_fused_grad` makes the forward warp kernel ALSO store the two
    # per-channel tap-differential images d(out)/dx, d(out)/dy, so the VJP
    # is an elementwise XLA contraction instead of a second Pallas gather
    # sweep — the backward kernel (which re-gathers everything the forward
    # already selected) disappears entirely.  Composes with the dense and
    # group_skip f32-tap paths; an explicitly-requested packed/seg_skip/
    # sparse variant takes precedence.  Gradient-identical up to FMA
    # contraction (tests/test_pallas_warp.py).
    pallas_fused_grad: bool = True
    # `pallas_fused_loss` computes the per-pixel reprojection error maps
    # (0.85*SSIM + 0.15*L1) in a fused VMEM-resident Pallas kernel
    # (ops/pallas_loss.py) instead of XLA reduce-window chains — each of
    # the 2*S warped predictions is read from HBM exactly once and only
    # the (B, H, W) error map is written back, eliminating the pooled-
    # moment materialisation that dominates the loss slice's HBM traffic
    # (BASELINE.md round-3 roofline).  Maps match the XLA composition to
    # <= ~5e-6; backward recomputes under in-kernel jax.vjp (gradient-
    # identical).  Opt-in until measured on the target silicon.
    pallas_fused_loss: bool = False
    # `pallas_bf16_out` stores the fused warp kernel's outputs (warped
    # image + the two tap differentials) as bfloat16 — in-kernel math and
    # the VJP contraction stay f32, so this only halves the HBM bytes of
    # arrays that are pure loss inputs (<= ~4e-3 relative rounding on
    # [0, 1] image data).  DEFAULT ON since round 5: measured faster on
    # the relay in two sessions (9.33 vs 9.17; 9.40 vs 9.16) and the
    # 3-seed 192x640 rung-2 quality A/B came out better-or-equal on every
    # seed and metric (ATE 7.1-7.6 -> 5.8-6.2, abs_rel 0.43-0.46 ->
    # 0.41 — BASELINE.md round 5; the direction of the quality effect is
    # a random-init-regime observation, the flip is justified by
    # faster-at-equal-or-better).  `--no-bf16-out` / pallas_bf16_out=False
    # restores exact f32 storage.
    pallas_bf16_out: bool = True
    # `pallas_tall` switches to the full-height column-stripe warp kernel
    # (ops/pallas_warp.py::pallas_warp_tall): the src window is DMA'd once
    # per (source image, column stripe) instead of once per output tile —
    # ~20x less HBM src traffic, the residual the analytic roofline says
    # blocks ~100 fps native — sources are deduplicated across scales, and
    # vertical exactness becomes unlimited (any flow; the windowed kernels
    # clamp at ~8*extra_tiles px).  Fused gradient; composes with
    # pallas_bf16_out.  Takes precedence over every other warp variant.
    # Opt-in pending on-silicon measurement (larger unrolled program).
    pallas_tall: bool = False
    # `pallas_fused_bwd` (requires pallas_tall + pallas_fused_loss): fuse
    # the loss backward with the warp VJP contraction in ONE kernel
    # (ops/pallas_fused.py) — d(err)/d(pred) is recomputed and contracted
    # with the tap differentials in VMEM instead of round-tripping the
    # (N, C, H, W) f32 dpred stack through HBM (~70-90 MB/iter at
    # 192x640).  Gradient-identical (tests); the warped by-product is
    # gradient-detached, exact because total_loss consumes reproj_maps.
    # Opt-in pending on-silicon measurement.
    pallas_fused_bwd: bool = False
    # `pallas_proj` (requires pallas_tall): compute the warp coordinates
    # IN-KERNEL from depth + a per-(direction, batch) affine camera map
    # (geometry.camera.projection_affine) instead of materialising the
    # (2*S*B, H, W, 2) coordinate field — the XLA backproject/project
    # stage and its points/coords HBM round trips (~100+ MB/iter at
    # 192x640 batch 3) disappear; the projection VJP is an elementwise
    # XLA recompute fused into the tap-differential contraction
    # (ops/pallas_warp.py::pallas_warp_tall_proj).  Values match the
    # two-stage chain to f32 association.  Opt-in pending on-silicon
    # measurement.
    pallas_proj: bool = False
    # Anti-collapse log-mean-disparity prior (losses/photometric.py) for
    # low-parallax pretraining; 0 disables.  The Pretrainer activates it for
    # the first `scale_prior_epochs` epochs only.  The target is a metric
    # MEAN DEPTH, converted through the configured disparity mapping
    # (geometry.depth.depth_to_disp) — a raw disparity target would mean a
    # wildly different depth under each min/max_depth setting.
    scale_prior_weight: float = 0.0
    scale_prior_depth: float = 15.0


def _avg_pool2(x: jax.Array) -> jax.Array:
    """2x2 mean-pool downsample (NHWC) for the on-device image pyramid."""
    B, H, W, C = x.shape
    return x.reshape(B, H // 2, 2, W // 2, 2, C).mean(axis=(2, 4))


def _image_pyramid(img: jax.Array, num_scales: int) -> Dict[int, jax.Array]:
    pyr = {0: img}
    for s in range(1, num_scales):
        pyr[s] = _avg_pool2(pyr[s - 1])
    return pyr


def _pose_pairs(batch: FrameBatch) -> jax.Array:
    """Both pose pairs (0,-1) and (0,+1) as one doubled batch (2B, H, W, 6)
    -> bigger matmuls for the MXU."""
    pair_prev = jnp.concatenate([batch.frame(-1, True), batch.frame(0, True)], axis=-1)
    pair_next = jnp.concatenate([batch.frame(0, True), batch.frame(1, True)], axis=-1)
    return jnp.concatenate([pair_prev, pair_next], axis=0)


def _decode_and_loss(
    model: DepthPoseNet,
    params,
    batch_stats,
    batch: FrameBatch,
    cfg: LossConfig,
    depth_feats,
    pose_feat,
    *,
    rng: Optional[jax.Array] = None,
    sample_weights: Optional[jax.Array] = None,
    identity_base: Optional[jax.Array] = None,
    pyramid: Optional[Dict[int, jax.Array]] = None,
):
    """Decoder halves + warps + losses, given encoder features.

    The second half of the reference's `_process_batch` (:906-923):
    disparity/pose decoding, multi-scale inverse warp, loss.  Encoder features
    arrive as arguments so the frozen-encoder adapt scan can hoist them.
    """
    variables = {"params": params, "batch_stats": batch_stats}
    disps = model.apply(variables, depth_feats, method=DepthPoseNet.depth_decode)
    aa, tr = model.apply(variables, pose_feat, method=DepthPoseNet.pose_decode)
    return warp_and_loss(
        disps, aa, tr, batch, cfg,
        rng=rng, sample_weights=sample_weights,
        identity_base=identity_base, pyramid=pyramid,
    )


def warp_and_loss(
    disps: Dict[Any, jax.Array],
    aa: jax.Array,
    tr: jax.Array,
    batch: FrameBatch,
    cfg: LossConfig,
    *,
    rng: Optional[jax.Array] = None,
    sample_weights: Optional[jax.Array] = None,
    identity_base: Optional[jax.Array] = None,
    pyramid: Optional[Dict[int, jax.Array]] = None,
):
    """Multi-scale inverse warp + loss from raw decoder outputs.

    The model-free tail of `_process_batch`: `disps` maps ('disp', s) to the
    sigmoid disparity pyramid; `aa`/`tr` are the doubled-batch (2B, 3) pose
    decoder outputs ordered [pair (prev,cur); pair (cur,next)].  Exposed
    separately so parity tests can drive the exact production warp/loss
    composition against a reference reimplementation
    (reference _reconstruct_images + _compute_loss,
    depth_pose_prediction.py:976-1120).
    """
    H, W = batch.height, batch.width
    B = batch.batch_size
    aa_prev, aa_next = aa[:B], aa[B:]
    tr_prev, tr_next = tr[:B], tr[B:]
    # frame -1: net saw (prev, cur); invert so the transform is 0 -> -1
    T_prev = transformation_from_parameters(aa_prev, tr_prev, invert=True)
    T_next = transformation_from_parameters(aa_next, tr_next, invert=False)

    # --- multi-scale inverse warp (reference _reconstruct_images) --------
    # All (scale, frame) warps fold into ONE batched projection + ONE patch
    # gather: gathers are the dominant memory traffic of the step, and TPU
    # gathers amortise much better at large batch.
    pix = pixel_grid(H, W)
    outputs: Dict[Any, jax.Array] = {}
    S = len(cfg.scales)

    def tile(x, n):
        return jnp.tile(x, (n,) + (1,) * (x.ndim - 1))

    depths = []
    for s in cfg.scales:
        disp = disps[("disp", s)]
        disp_up = resize_bilinear(disp, H, W)
        depth = disp_to_depth(disp_up, cfg.min_depth, cfg.max_depth)
        if s == 0:
            outputs[("depth", 0)] = depth
        depths.append(depth)
        outputs[("disp", s)] = disp

    depth_stack = jnp.concatenate(depths, axis=0)  # (S*B, H, W, 1)
    pallas_ok = (cfg.use_pallas_warp and H % 8 == 0 and W % 128 == 0
                 and W >= 384)
    if not pallas_ok:
        # An EXPLICITLY-REQUESTED pallas variant silently degrading to the
        # XLA sampler makes quality A/Bs vacuous (a 96x320 rungs "tall vs
        # default A/B" compares XLA vs XLA — caught in round 5).  Warn at
        # trace time, once per compile.
        requested = [k for k, v in (
            ("pallas_tall", cfg.pallas_tall),
            ("pallas_proj", cfg.pallas_proj),
            ("pallas_fused_bwd", cfg.pallas_fused_bwd),
            ("pallas_bf16_out", cfg.pallas_bf16_out),
            ("pallas_packed", cfg.pallas_packed),
            ("pallas_seg_skip", cfg.pallas_seg_skip),
            ("pallas_sparse", cfg.pallas_sparse),
        ) if v]
        if requested and cfg.use_pallas_warp:
            print(f"WARNING: warp_and_loss at {H}x{W}: pallas kernels need "
                  f"H%8==0, W%128==0, W>=384 — requested variant(s) "
                  f"{requested} are INACTIVE (XLA sampler); any A/B on them "
                  "at this shape measures nothing")
    use_tall = pallas_ok and cfg.pallas_tall
    use_proj = use_tall and cfg.pallas_proj
    T_stack = jnp.concatenate([tile(T_prev, S), tile(T_next, S)], axis=0)
    if use_proj:
        # in-kernel projection: the (points, coords) stacks never exist —
        # only the per-(direction, batch) affine maps leave XLA
        ab = projection_affine(
            jnp.tile(batch.K, (2, 1, 1)),
            jnp.tile(batch.inv_K, (2, 1, 1)),
            jnp.concatenate([T_prev, T_next], axis=0),
        )
        coords = None
    else:
        points = backproject_depth(depth_stack, tile(batch.inv_K, S), pix)
        coords = project_3d(
            jnp.tile(points, (2, 1, 1)), tile(batch.K, 2 * S), T_stack, H, W
        )  # (2*S*B, H, W, 2)
    # The sampler can gather uint8 sources directly (bit-identical, 4x less
    # gather traffic — see bilinear_sampler); measured on the dev relay the
    # extra convert pass makes it ~9% slower there, so the f32 path stays
    # default until real-silicon numbers say otherwise (BASELINE.md).
    min_h = 8 + 16 * cfg.pallas_extra_tiles
    interpret = jax.default_backend() != "tpu"
    err_all = None
    if use_tall:
        from tpuslam.ops.pallas_warp import (pallas_warp_tall,
                                             pallas_warp_tall_proj)

        # deduped sources: the tall kernel scale-tiles in VMEM
        src2 = jnp.concatenate([batch.frame(-1), batch.frame(1)], axis=0)
        fuse_bwd = False
        if cfg.pallas_fused_loss and cfg.pallas_fused_bwd:
            from tpuslam.ops.pallas_fused import (fits_vmem_fused_bwd,
                                                  warp_reproj_err,
                                                  warp_reproj_err_proj)
            from tpuslam.ops.pallas_loss import fits_vmem

            C = src2.shape[-1]
            fuse_bwd = (fits_vmem(H, W, C)
                        and fits_vmem_fused_bwd(H, W, C, cfg.pallas_bf16_out))
        if fuse_bwd:
            # composite op: same fwd kernels, ONE backward kernel — dpred
            # is contracted with the tap differentials in VMEM and never
            # round-trips HBM.  The warped by-product is gradient-
            # detached, which is exact here: with reproj_maps handed to
            # total_loss the rgb outputs never re-enter the loss graph.
            if use_proj:
                err_all, warped = warp_reproj_err_proj(
                    src2, depth_stack, ab, batch.frame(0), interpret, S,
                    cfg.pallas_bf16_out,
                )
            else:
                err_all, warped = warp_reproj_err(
                    src2, coords, batch.frame(0), interpret, S,
                    cfg.pallas_bf16_out,
                )
        elif use_proj:
            warped = pallas_warp_tall_proj(
                src2, depth_stack, ab, interpret, S, cfg.pallas_bf16_out
            )
        else:
            warped = pallas_warp_tall(
                src2, coords, interpret, S, cfg.pallas_bf16_out
            )
    elif pallas_ok and H >= min_h:
        from tpuslam.ops.pallas_warp import (pallas_warp_static,
                                             pallas_warp_static_fused)

        src = jnp.concatenate(
            [tile(batch.frame(-1), S), tile(batch.frame(1), S)], axis=0
        )
        # interpret mode off TPU (pallas compiles natively only there)
        # group_skip/fused_grad default ON; an explicitly-requested
        # packed/seg_skip/sparse variant takes precedence over both
        explicit = (cfg.pallas_packed or cfg.pallas_seg_skip
                    or cfg.pallas_sparse)
        group_skip = cfg.pallas_group_skip and not explicit
        if cfg.pallas_fused_grad and not explicit:
            warped = pallas_warp_static_fused(
                src, coords, interpret, cfg.pallas_extra_tiles, group_skip,
                cfg.pallas_bf16_out,
            )
        else:
            warped = pallas_warp_static(
                src, coords, interpret,
                cfg.pallas_extra_tiles, cfg.pallas_sparse, cfg.pallas_packed,
                cfg.pallas_seg_skip, group_skip,
            )
    else:
        src = jnp.concatenate(
            [tile(batch.frame(-1), S), tile(batch.frame(1), S)], axis=0
        )
        warped = bilinear_sampler(src, coords)
    for fi, f in enumerate((-1, 1)):
        for si, s in enumerate(cfg.scales):
            start = (fi * S + si) * B
            outputs[("rgb", f, s)] = warped[start : start + B]

    # Fused per-pixel reprojection-error maps: one kernel pass over the
    # whole warp stack (k-major/batch-minor — exactly `warped`'s layout),
    # target DMA'd once per batch row.  total_loss consumes the maps in
    # place of its per-(frame, scale) reprojection_loss calls.
    reproj_maps = None
    if cfg.pallas_fused_loss and H % 8 == 0 and W % 128 == 0:
        from tpuslam.ops.pallas_loss import fits_vmem, pallas_reproj_err

        if err_all is None and fits_vmem(H, W, warped.shape[-1]):
            err_all = pallas_reproj_err(
                warped, batch.frame(0), jax.default_backend() != "tpu"
            )
        if err_all is not None:
            reproj_maps = {}
            for fi, f in enumerate((-1, 1)):
                for si, s in enumerate(cfg.scales):
                    start = (fi * S + si) * B
                    reproj_maps[(f, s)] = err_all[start : start + B]

    outputs[("cam_T_cam", 0, -1)] = T_prev
    outputs[("cam_T_cam", 0, 1)] = T_next
    outputs[("translation", 0, -1)] = tr_prev
    outputs[("translation", 0, 1)] = tr_next

    # --- losses ----------------------------------------------------------
    pyr = pyramid if pyramid is not None else _image_pyramid(
        batch.frame(0), len(cfg.scales)
    )
    inputs = {("rgb", 0, s): pyr[s] for s in cfg.scales}
    inputs[("rgb", -1, 0)] = batch.frame(-1)
    inputs[("rgb", 1, 0)] = batch.frame(1)
    inputs[("relative_distance", 0)] = batch.rel_dist[:, 0]
    inputs[("relative_distance", 1)] = batch.rel_dist[:, 1]
    dynamic_masks = None
    if cfg.mask_dynamic:
        # mask pyramid: mean-pool then re-binarise (reference resizes the
        # mask per scale and rounds, datasets/utils.py + kitti.py:355)
        m = {0: batch.mask}
        for s in range(1, len(cfg.scales)):
            m[s] = jnp.round(_avg_pool2(m[s - 1][..., None])[..., 0])
        dynamic_masks = m
    losses = total_loss(
        inputs,
        outputs,
        scales=cfg.scales,
        disparity_smoothness=cfg.disparity_smoothness,
        velocity_loss_scaling=cfg.velocity_loss_scaling,
        sample_weights=sample_weights if sample_weights is not None else batch.weights,
        rng=rng,
        dynamic_masks=dynamic_masks,
        identity_base=identity_base,
        reproj_maps=reproj_maps,
        scale_prior_weight=cfg.scale_prior_weight,
        scale_prior_disp=(
            depth_to_disp(cfg.scale_prior_depth, cfg.min_depth, cfg.max_depth)
            if cfg.scale_prior_weight > 0
            else 0.0
        ),
    )
    return losses, outputs


def forward(
    model: DepthPoseNet,
    params,
    batch_stats,
    batch: FrameBatch,
    cfg: LossConfig,
    *,
    train_bn: bool = False,
    rng: Optional[jax.Array] = None,
    sample_weights: Optional[jax.Array] = None,
):
    """Full forward: disparity + poses + warps + losses.

    Returns (losses, outputs, new_batch_stats).  `outputs` carries everything
    SLAM needs: disp pyramid, depth(0), cam_T_cam(0,±1), translations, the
    pooled stage-4 feature of the (augmented) online frames.
    """
    stats = batch_stats

    def run(method, *args):
        # Thread the batch_stats through sequential applies — flax returns
        # the whole collection, so naive merging would resurrect stale stats.
        nonlocal stats
        variables = {"params": params, "batch_stats": stats}
        if train_bn:
            out, mut = model.apply(
                variables, *args, train=True, mutable=["batch_stats"], method=method
            )
            stats = {**stats, **mut["batch_stats"]}
            return out
        return model.apply(variables, *args, train=False, method=method)

    depth_feats = run(DepthPoseNet.depth_encode, batch.frame(0, aug=True))
    pose_feats = run(DepthPoseNet.pose_encode, _pose_pairs(batch))
    losses, outputs = _decode_and_loss(
        model, params, stats, batch, cfg, depth_feats, pose_feats[-1],
        rng=rng, sample_weights=sample_weights,
    )
    outputs[("feat4",)] = depth_feats[-1].mean(axis=(1, 2))
    return losses, outputs, stats




def _frozen_features(model, params, batch_stats, batch: FrameBatch):
    """Encoder features for the whole batch, gradient-severed.

    Under frozen encoders (reference _set_adapt: BN eval + encoders frozen,
    depth_pose_prediction.py:807-827) these are invariant across the K
    adaptation iterations — frozen params, running BN stats, constant inputs
    — so the adapt scan computes them ONCE.  The stop_gradient means the
    encoder backward is never built at all."""
    variables = {"params": params, "batch_stats": batch_stats}
    depth_feats = model.apply(
        variables, batch.frame(0, aug=True), method=DepthPoseNet.depth_encode
    )
    pose_feats = model.apply(
        variables, _pose_pairs(batch), method=DepthPoseNet.pose_encode
    )
    depth_feats = [jax.lax.stop_gradient(f) for f in depth_feats]
    return depth_feats, jax.lax.stop_gradient(pose_feats[-1])


def _adapt_scan(
    model, tx, cfg, state, training, num_steps, freeze_encoder, with_outputs
):
    """Shared K-iteration adaptation scan.

    Returns (params, opt_state, rng, last_losses, last_outputs, iter_losses,
    feat4) where feat4 is the pooled stage-4 depth feature of the hoisted
    (frozen) encoder pass, or None when encoders are not frozen, and last_*
    are the LAST iteration's training-batch forward results —
    exactly what the reference `adapt` returns (its loop keeps `outputs_eval,
    losses` from the final `_process_batch` before the final optimizer.step,
    depth_pose_prediction.py:308-319); no separate eval forward exists.

    With frozen encoders the encoder forwards, the identity reprojection
    term and the target pyramid are loop-invariant and hoisted out of the
    scan (~40% of the per-iteration FLOPs)."""
    if num_steps < 1:
        # A zero-length scan would return the all-zero init carry — including
        # a singular cam_T_cam that SLAM would then invert.  Callers wanting
        # inference-only must use eval_step (slam/slam.py routes there when
        # adaptation is off).
        raise ValueError(f"adaptation requires num_steps >= 1, got {num_steps}")
    frozen_feat4 = None
    if freeze_encoder:
        depth_feats, pose_feat = _frozen_features(
            model, state.params, state.batch_stats, training
        )
        frozen_feat4 = depth_feats[-1].mean(axis=(1, 2))
        identity_base = identity_reprojection(
            {
                ("rgb", 0, 0): training.frame(0),
                ("rgb", -1, 0): training.frame(-1),
                ("rgb", 1, 0): training.frame(1),
            }
        )
        pyramid = _image_pyramid(training.frame(0), len(cfg.scales))

        def run_forward(params, rng):
            return _decode_and_loss(
                model, params, state.batch_stats, training, cfg,
                depth_feats, pose_feat, rng=rng, identity_base=identity_base,
                pyramid=pyramid,
            )

    else:

        def run_forward(params, rng):
            losses, outputs, _ = forward(
                model, params, state.batch_stats, training, cfg,
                train_bn=False, rng=rng,
            )
            outputs.pop(("feat4",), None)
            return losses, outputs

    def loss_fn(params, rng):
        losses, outputs = run_forward(params, rng)
        if not with_outputs:
            return losses["loss"], (losses, {})
        # Keep only what SLAM/logging consumes in the scan carry — the warped
        # images are by far the largest outputs and are only loss inputs.
        small = {k: v for k, v in outputs.items() if k[0] != "rgb"}
        return losses["loss"], (losses, small)

    def one_iter(carry, _):
        params, opt_state, rng, _, _ = carry
        rng, noise_rng = jax.random.split(rng)
        (loss, (losses, outputs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, noise_rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, rng, losses, outputs), loss

    aux_shapes = jax.eval_shape(
        lambda p, r: loss_fn(p, r)[1], state.params, state.rng
    )
    aux_zeros = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), aux_shapes
    )
    (params, opt_state, rng, losses, outputs), iter_losses = jax.lax.scan(
        one_iter,
        (state.params, state.opt_state, state.rng) + aux_zeros,
        None,
        length=num_steps,
    )
    return params, opt_state, rng, losses, outputs, iter_losses, frozen_feat4


def _pack_retire(losses, outputs):
    """Everything `Slam._retire` reads per frame, as ONE f32 vector.

    The reference pays a separate host sync per tensor it reads after each
    frame (pose, losses, embedding — slam/slam.py:137-186); on the dev
    relay each transfer costs a full ~RTT and even natively each is a
    separate dispatch.  Packing [T01 (16) | embedding (D) | depth/velocity/
    total loss (3) | lc_embedding (D_lc, when present)] in-graph makes the
    per-frame readback a single small transfer; the layout is recovered
    host-side from the component shapes (slam/slam.py::_retire)."""
    parts = [
        outputs[("cam_T_cam", 0, 1)][0].reshape(-1).astype(jnp.float32),
        outputs[("embedding",)][0].astype(jnp.float32),
        jnp.stack([
            jnp.asarray(losses.get("depth_loss", 0.0), jnp.float32),
            jnp.asarray(losses.get("velocity_loss", 0.0), jnp.float32),
            jnp.asarray(losses.get("loss", 0.0), jnp.float32),
        ]),
    ]
    if ("lc_embedding",) in outputs:
        parts.append(outputs[("lc_embedding",)][0].astype(jnp.float32))
    return jnp.concatenate(parts)


@partial(
    jax.jit,
    static_argnames=("model", "tx", "cfg", "num_steps", "freeze_encoder",
                     "with_lc_embedding"),
    donate_argnames=("state",),
)
def adapt_step(
    model: DepthPoseNet,
    tx: optax.GradientTransformation,
    cfg: LossConfig,
    state: TrainState,
    online: Optional[FrameBatch],
    training: FrameBatch,
    num_steps: int,
    freeze_encoder: bool = True,
    with_lc_embedding: bool = True,
):
    """One SLAM frame: K fused adaptation iterations, one dispatch.

    Reference-exact semantics (adapt, depth_pose_prediction.py:291-319 +
    slam/slam.py:174-186): the returned losses and outputs are the LAST
    iteration's training-batch forward — computed with post-(K-1)-update
    weights before the final optimizer step; the online frame is training
    row 0, so `outputs[('cam_T_cam',0,1)][0]` is the odometry transform the
    reference extracts.  There is no separate eval forward.

    The replay/loop-closure embeddings come from the frozen encoders (the
    reference embeds with pre-adaptation weights, slam/slam.py:143-147;
    frozen encoders make pre/post identical) inside the same dispatch.

    `online` is accepted for API parity and ignored (the reference likewise
    ignores online_data when training_data is given).
    """
    del online
    params, opt_state, rng, losses, outputs, iter_losses, feat4 = _adapt_scan(
        model, tx, cfg, state, training, num_steps, freeze_encoder,
        with_outputs=True,
    )

    # Embeddings with pre-adaptation weights (== reference; == any-iteration
    # weights when encoders are frozen, where the hoisted features are free).
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    if feat4 is None:
        feat4 = model.apply(
            variables, training.frame(0, aug=True), method=DepthPoseNet.depth_encode
        )[-1].mean(axis=(1, 2))
    outputs[("feat4",)] = feat4
    outputs[("embedding",)] = l2_normalize(feat4)
    if with_lc_embedding:
        # loop-closure embedding of the online frame's +1 image, in the same
        # dispatch (the reference pays a separate MobileNet forward per
        # frame, loop_closure_detection.py:41-51)
        lc_feat = model.apply(
            variables, training.frame(1)[:1], method=DepthPoseNet.depth_encode
        )[-1].mean(axis=(1, 2))
        outputs[("lc_embedding",)] = l2_normalize(lc_feat)
    outputs[("retire_packed",)] = _pack_retire(losses, outputs)
    losses = dict(losses)
    losses["iter_losses"] = iter_losses

    new_state = TrainState(
        params=params,
        batch_stats=state.batch_stats,
        opt_state=opt_state,
        rng=rng,
        step=state.step + 1,
    )
    return new_state, losses, outputs


def _consolidate(
    model: DepthPoseNet,
    tx: optax.GradientTransformation,
    cfg: LossConfig,
    state: TrainState,
    training: FrameBatch,
    num_steps: int,
    freeze_encoder: bool = True,
):
    """Update-only fused step (no eval outputs) — the generalist's replay
    consolidation in dual-network mode and CoVIO's background update.
    Same hoisted frozen-encoder scan as `adapt_step`."""
    params, opt_state, rng, _, _, iter_losses, _ = _adapt_scan(
        model, tx, cfg, state, training, num_steps, freeze_encoder,
        with_outputs=False,
    )
    new_state = TrainState(
        params=params,
        batch_stats=state.batch_stats,
        opt_state=opt_state,
        rng=rng,
        step=state.step + 1,
    )
    return new_state, iter_losses


consolidate_step = partial(
    jax.jit,
    static_argnames=("model", "tx", "cfg", "num_steps", "freeze_encoder"),
    donate_argnames=("state",),
)(_consolidate)

# CoVIO async mode launches the update WITHOUT blocking the next frame's
# inference: the serving parameters may still alias the input state's
# buffers, so this variant must not donate them.
consolidate_step_async = partial(
    jax.jit,
    static_argnames=("model", "tx", "cfg", "num_steps", "freeze_encoder"),
)(_consolidate)


@partial(
    jax.jit,
    static_argnames=("model", "cfg", "with_lc_embedding"),
)
def eval_step(
    model: DepthPoseNet,
    cfg: LossConfig,
    params,
    batch_stats,
    batch: FrameBatch,
    with_lc_embedding: bool = False,
):
    """No-grad forward: losses + outputs + normalised embedding.

    The `adaptation: False` SLAM path (slam/slam.py:177-178) and validation.
    """
    losses, outputs, _ = forward(model, params, batch_stats, batch, cfg, train_bn=False)
    outputs[("embedding",)] = l2_normalize(outputs[("feat4",)])
    if with_lc_embedding:
        # encoder only — the embedding is the pooled stage-4 feature, so the
        # decoder forward would be pure waste on this inference-only hot path
        # (the async/frozen SLAM modes run eval_step every frame)
        lc_feat = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch.frame(1),
            method=DepthPoseNet.depth_encode,
        )[-1].mean(axis=(1, 2))
        outputs[("lc_embedding",)] = l2_normalize(lc_feat)
    outputs[("retire_packed",)] = _pack_retire(losses, outputs)
    return losses, outputs


@partial(
    jax.jit,
    static_argnames=("model", "tx", "cfg"),
    donate_argnames=("state",),
)
def train_step(
    model: DepthPoseNet,
    tx: optax.GradientTransformation,
    cfg: LossConfig,
    state: TrainState,
    batch: FrameBatch,
):
    """One pretraining step: full forward/backward with BN stat updates.

    Reference train loop body (depth_pose_prediction.py:249-263).
    """

    def loss_fn(params, rng):
        losses, _, new_stats = forward(
            model, params, state.batch_stats, batch, cfg, train_bn=True, rng=rng
        )
        return losses["loss"], (losses, new_stats)

    rng, noise_rng = jax.random.split(state.rng)
    (_, (losses, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params, noise_rng
    )
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    new_state = TrainState(
        params=params,
        batch_stats=new_stats,
        opt_state=opt_state,
        rng=rng,
        step=state.step + 1,
    )
    return new_state, losses


@partial(jax.jit, static_argnames=("model",))
def predict_pose_step(model: DepthPoseNet, params, batch_stats, image_0, image_1):
    """Relative pose between two images (loop closures).

    Reference `predict_pose` (depth_pose_prediction.py:628-664): channel-cat,
    pose net, forward transform, identity covariance placeholder.
    """
    pair = jnp.concatenate([image_0, image_1], axis=-1)
    aa, tr = model.apply(
        {"params": params, "batch_stats": batch_stats},
        pair,
        method=DepthPoseNet.pose_forward,
    )
    T = transformation_from_parameters(aa, tr, invert=False)
    return T, jnp.eye(6)


@partial(jax.jit, static_argnames=("model", "min_depth", "max_depth"))
def predict_depth_step(
    model: DepthPoseNet, params, batch_stats, image, min_depth=0.1, max_depth=None
):
    """Depth from a single image (reference `predict_from_image`, :538-554)."""
    disps, feat4 = model.apply(
        {"params": params, "batch_stats": batch_stats},
        image,
        method=DepthPoseNet.depth_forward,
    )
    return disp_to_depth(disps[("disp", 0)], min_depth, max_depth), l2_normalize(feat4)

"""Composite warp -> reprojection-error op with a FUSED backward.

Why: with `pallas_tall` + `pallas_fused_loss` the adaptation step's
backward still round-trips d(err)/d(pred) through HBM — the loss bwd
kernel (ops/pallas_loss.py) writes the (N, C, H, W) f32 dpred stack
(~35 MB/iter at 192x640 batch 3) and an XLA contraction re-reads it plus
the two tap-differential stacks to produce dcoords.  That round trip is
pure glue: dpred is consumed by exactly one elementwise contraction.
This module fuses the two — ONE backward kernel recomputes dpred from
(pred, target, g) under in-kernel `jax.vjp` (same recompute-backward as
ops/pallas_loss.py) and contracts it with the warp kernel's stored tap
differentials dx, dy in VMEM, writing only the (N, 2, H, W) coordinate
cotangent.  dpred never exists in HBM; the analytic inventory says the
cut is ~70-90 MB/iter (utils/calibration.py::analytic_bytes).

Semantics: the composite returns `(err, warped)` where `err` carries the
gradient and `warped` is GRADIENT-DETACHED (a by-product for the outputs
dict / viz).  That detachment is exactly correct in the only
configuration that uses this op: when `reproj_maps` is handed to
`total_loss` (losses/photometric.py:233-243) the warped rgb outputs are
never differentiated — the sole gradient path into the warp is via the
error maps.  Values and gradients are otherwise identical to the two-op
composition `pallas_reproj_err(pallas_warp_tall(...))` (tests).

Reference behaviour covered (behaviour only, redesigned for TPU):
`_compute_reprojection_loss` + grid_sample backward,
/root/reference/depth_pose_prediction/depth_pose_prediction.py:1178-1192.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuslam.ops.pallas_loss import (_err_math_c, _pick_block_h,
                                     _reproj_err_impl, _select_slab,
                                     _slab_scalars, _window_specs)
from tpuslam.ops.pallas_warp import (TILE_H, _pallas_warp_tall_impl,
                                     _pallas_warp_tall_proj_impl,
                                     proj_vjp_chain)


def fits_vmem_fused_bwd(H: int, W: int, C: int, bf16_taps: bool) -> bool:
    """The fused backward uses the same per-channel vjp recompute and
    row-slab windowing as ops/pallas_loss.py, so its stack budget is the
    same `_pick_block_h` gate; the extra dx/dy slab operands are small.
    `bf16_taps` no longer changes feasibility (kept for the call sites)."""
    return _pick_block_h(H, W) > 0


def _err_bwd_coords_kernel(pred_ref, tgt_ref, g_ref, dx_ref, dy_ref, dc_ref,
                           *, H, BH):
    """Recompute d(err)/d(pred) in VMEM (one jax.vjp PER CHANNEL over this
    grid step's row slab — see ops/pallas_loss.py::_err_bwd_kernel for the
    masking/halo argument) and contract with the warp tap differentials:
    dcoords_x = sum_C dpred * dx, dcoords_y likewise."""
    ys, off = _slab_scalars(H, BH)
    C = pred_ref.shape[1]
    g = g_ref[0]
    if BH != H:
        i = pl.program_id(1)
        row = ys + jax.lax.broadcasted_iota(jnp.int32, g.shape, 0)
        g = jnp.where((row >= i * BH - 1) & (row <= i * BH + BH), g, 0.0)
    acc_x = acc_y = None
    for c in range(C):
        y = tgt_ref[0, c].astype(jnp.float32)
        _, vjp = jax.vjp(lambda p, y=y: _err_math_c(p, y),
                         pred_ref[0, c].astype(jnp.float32))
        dpred = _select_slab(vjp(g)[0], off, BH) / C  # (BH, W), VMEM only
        px = dpred * dx_ref[0, c].astype(jnp.float32)
        py = dpred * dy_ref[0, c].astype(jnp.float32)
        acc_x = px if acc_x is None else acc_x + px
        acc_y = py if acc_y is None else acc_y + py
    dc_ref[0, 0] = acc_x
    dc_ref[0, 1] = acc_y


def _live(v: jax.Array, hi: float) -> jax.Array:
    """Sampler boundary-gradient convention shared with the warp VJPs:
    interior coords pass, clamped coords die, exact-edge ties halve."""
    inside = ((v > 0.0) & (v < hi)).astype(jnp.float32)
    tie = ((v == 0.0) | (v == hi)).astype(jnp.float32)
    return inside + 0.5 * tie


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def warp_reproj_err(src2: jax.Array, coords: jax.Array, target: jax.Array,
                    interpret: bool = False, S: int = 4,
                    bf16_out: bool = False, group_rows: int = 2 * TILE_H):
    """Tall warp + per-pixel reprojection error with a single fused backward.

    src2: (2*B, H, W, C) deduplicated source frames (pallas_warp_tall
    layout); coords: (2*S*B, H, W, 2) warp-stack coords; target:
    (B, H, W, 3) shared target frames.  Returns `(err, warped)` — err
    (2*S*B, H, W) f32 error maps, warped (2*S*B, H, W, C) warp stack.

    Differentiable w.r.t. `coords` THROUGH `err` ONLY: the `warped`
    output is gradient-detached (its cotangent is ignored), which is
    exact when the loss consumes `reproj_maps` instead of the rgb
    outputs (losses/photometric.py:233).  Do not use it where warped
    images re-enter a differentiated expression."""
    out, _, _ = _pallas_warp_tall_impl(src2, coords, interpret, S, bf16_out,
                                       group_rows)
    err = _reproj_err_impl(out, target, interpret)
    return err, out


def _fwd(src2, coords, target, interpret, S, bf16_out, group_rows):
    out, dx, dy = _pallas_warp_tall_impl(src2, coords, interpret, S,
                                         bf16_out, group_rows)
    err = _reproj_err_impl(out, target, interpret)
    return (err, out), (out, dx, dy, coords, target, src2)


def _dc_from_err_bwd(out, target, g_err, dx, dy, interpret):
    """Run the fused backward kernel: recompute d(err)/d(pred) in VMEM and
    contract with the tap differentials, returning the raw (N, 2, H, W)
    coordinate cotangents (boundary masking is the caller's).  Pred,
    target and g ride halo windows (ops/pallas_loss.py::_window_specs);
    the tap differentials are plain row slabs — the contraction is
    elementwise in pred rows."""
    N, C, H, W = out.shape[0], out.shape[3], out.shape[1], out.shape[2]
    B = target.shape[0]
    BH = _pick_block_h(H, W)
    assert BH > 0, (H, W)
    spec = _window_specs(N, B, C, H, W, BH, with_g=True)
    slab = pl.BlockSpec((1, C, BH, W), lambda b, i, k: (k * B + b, 0, i, 0),
                        memory_space=pltpu.VMEM)
    spec["in_specs"].extend([slab, slab])
    return pl.pallas_call(
        partial(_err_bwd_coords_kernel, H=H, BH=BH),
        out_shape=jax.ShapeDtypeStruct((N, 2, H, W), jnp.float32),
        out_specs=pl.BlockSpec((1, 2, BH, W),
                               lambda b, i, k: (k * B + b, 0, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        **spec,
    )(
        out.transpose(0, 3, 1, 2),
        target.transpose(0, 3, 1, 2),
        g_err.astype(jnp.float32),
        dx.transpose(0, 3, 1, 2),
        dy.transpose(0, 3, 1, 2),
    )


def _bwd(interpret, S, bf16_out, group_rows, residuals, cotangents):
    g_err, _g_warped_ignored = cotangents  # warped output is detached
    out, dx, dy, coords, target, src2 = residuals
    H, W = out.shape[1], out.shape[2]
    dc = _dc_from_err_bwd(out, target, g_err, dx, dy, interpret)
    ddx = dc[:, 0] * _live(coords[..., 0], W - 1)
    ddy = dc[:, 1] * _live(coords[..., 1], H - 1)
    dcoords = jnp.stack([ddx, ddy], axis=-1)
    return jnp.zeros_like(src2), dcoords, jnp.zeros_like(target)


warp_reproj_err.defvjp(_fwd, _bwd)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def warp_reproj_err_proj(src2: jax.Array, depth: jax.Array, ab: jax.Array,
                         target: jax.Array, interpret: bool = False,
                         S: int = 4, bf16_out: bool = False,
                         group_rows: int = 2 * TILE_H):
    """`warp_reproj_err` with IN-KERNEL projection: the warp coordinates
    are computed inside the tall kernel from `depth` (S*B, H, W, 1) and the
    per-(direction, batch) affine camera maps `ab` (2*B, 12 — see
    geometry.camera.projection_affine), so neither the coordinate field
    nor the points stack ever exists in HBM.  Returns `(err, warped)` with
    the same detached-`warped` contract as `warp_reproj_err`; gradients
    flow to `depth` and `ab` through the fused backward kernel plus an
    XLA elementwise projection-VJP chain (pallas_warp.proj_vjp_chain)."""
    out, _, _ = _pallas_warp_tall_proj_impl(src2, depth, ab, interpret, S,
                                            bf16_out, group_rows)
    err = _reproj_err_impl(out, target, interpret)
    return err, out


def _proj_fwd(src2, depth, ab, target, interpret, S, bf16_out, group_rows):
    out, dx, dy = _pallas_warp_tall_proj_impl(src2, depth, ab, interpret, S,
                                              bf16_out, group_rows)
    err = _reproj_err_impl(out, target, interpret)
    return (err, out), (out, dx, dy, depth, ab, target, src2)


def _proj_bwd(interpret, S, bf16_out, group_rows, residuals, cotangents):
    g_err, _g_warped_ignored = cotangents  # warped output is detached
    out, dx, dy, depth, ab, target, src2 = residuals
    H, W = out.shape[1], out.shape[2]
    dc = _dc_from_err_bwd(out, target, g_err, dx, dy, interpret)
    ddepth, dab = proj_vjp_chain(depth, ab, dc[:, 0], dc[:, 1], S, H, W)
    return (jnp.zeros_like(src2), ddepth, dab, jnp.zeros_like(target))


warp_reproj_err_proj.defvjp(_proj_fwd, _proj_bwd)

"""Pallas TPU kernel for the photometric reprojection error (SSIM + L1).

Why: the reference's per-pair loss (0.85*SSIM + 0.15*L1,
/root/reference/depth_pose_prediction/depth_pose_prediction.py:1178-1192)
runs five 3x3 average pools per image pair (mu_x, mu_y, and the three
second moments).  Under XLA each reduce-window materialises its operand
and output in HBM, so the loss slice moves hundreds of MB per adaptation
iteration at 192x640 — the residual HBM traffic that bounds the native
roofline below the 100 fps north star (BASELINE.md round-3 calibration).
This kernel computes the whole per-pixel error map in one VMEM-resident
pass: one grid instance loads a (C, H, W) prediction + its target, does
every pool as in-register sublane/lane shifts, and writes the single
(H, W) error map — input images are read once, nothing intermediate
touches HBM.

Layout: full-image blocks, channel-major (B, C, H, W) inside the kernel;
the public API is NHWC.  The grid is (B, N//B) with the shared target
block keyed by the batch row only, so consecutive grid steps over the
2*S warp directions/scales of one batch row reuse the target DMA
(Mosaic skips re-issuing a DMA whose block index is unchanged).

Backward: a second kernel recomputes the forward math under `jax.vjp`
*inside* the kernel body (values are ordinary tracers), yielding a
gradient identical to autodiff of the XLA composition without storing
any pooled moments — it re-reads the same two images and writes only
d(err)/d(pred).

No dynamic addressing anywhere (static shifts/concats only), so this
compiles on Mosaic toolchains that reject dynamic `pl.ds` (the dev
relay).  Requires the images to fit VMEM comfortably (~6 copies with
double buffering) — `fits_vmem` gates the caller's fallback to the XLA
path.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SSIM_C1 = 0.01**2
_SSIM_C2 = 0.03**2

# VMEM working-set guard: pred + target + grad(out) + d(pred) blocks,
# double-buffered, must stay well under the ~16 MB/core VMEM budget.
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def fits_vmem(H: int, W: int, C: int) -> bool:
    block = C * H * W * 4
    return 6 * block + 2 * H * W * 4 < _VMEM_BUDGET_BYTES


def _shift_h(x: jax.Array, d: int) -> jax.Array:
    """Reflect-pad neighbour along the sublane (H) axis of (C, H, W)."""
    if d == -1:  # value at row i = x[i-1]; row 0 reflects to x[1]
        return jnp.concatenate([x[:, 1:2, :], x[:, :-1, :]], axis=1)
    # value at row i = x[i+1]; row H-1 reflects to x[H-2]
    return jnp.concatenate([x[:, 1:, :], x[:, -2:-1, :]], axis=1)


def _shift_w(x: jax.Array, d: int) -> jax.Array:
    """Reflect-pad neighbour along the lane (W) axis of (C, H, W)."""
    if d == -1:
        return jnp.concatenate([x[:, :, 1:2], x[:, :, :-1]], axis=2)
    return jnp.concatenate([x[:, :, 1:], x[:, :, -2:-1]], axis=2)


def _pool3(x: jax.Array) -> jax.Array:
    """3x3 mean pool with reflect padding — the reference SSIM's pooling
    (losses/photometric.py::_avg_pool3 on a reflect-padded image), as two
    separable in-register shift sums."""
    x = (_shift_h(x, -1) + x + _shift_h(x, 1)) / 3.0
    return (_shift_w(x, -1) + x + _shift_w(x, 1)) / 3.0


def _err_math(x: jax.Array, y: jax.Array) -> jax.Array:
    """Per-pixel reprojection error of pred x vs target y, both (C, H, W).

    Same formula chain as losses/photometric.py::reprojection_loss
    (reference _compute_reprojection_loss + SSIM module): channel-mean of
    0.85 * clip((1 - SSIM)/2, 0, 1) + 0.15 * |y - x|."""
    l1 = jnp.abs(y - x).mean(axis=0)
    mu_x = _pool3(x)
    mu_y = _pool3(y)
    sigma_x = _pool3(x * x) - mu_x * mu_x
    sigma_y = _pool3(y * y) - mu_y * mu_y
    sigma_xy = _pool3(x * y) - mu_x * mu_y
    n = (2 * mu_x * mu_y + _SSIM_C1) * (2 * sigma_xy + _SSIM_C2)
    d = (mu_x * mu_x + mu_y * mu_y + _SSIM_C1) * (sigma_x + sigma_y + _SSIM_C2)
    ssim = jnp.clip((1 - n / d) / 2, 0.0, 1.0).mean(axis=0)
    return 0.85 * ssim + 0.15 * l1


def _err_kernel(pred_ref, tgt_ref, out_ref):
    out_ref[0] = _err_math(pred_ref[0].astype(jnp.float32),
                           tgt_ref[0].astype(jnp.float32))


def _err_bwd_kernel(pred_ref, tgt_ref, g_ref, dpred_ref):
    """Recompute-backward: trace the forward math under jax.vjp on the
    VMEM-resident values — gradient identical to autodiff of the XLA
    composition, no pooled moments stored anywhere."""
    x = pred_ref[0].astype(jnp.float32)
    y = tgt_ref[0].astype(jnp.float32)
    _, vjp = jax.vjp(lambda p: _err_math(p, y), x)
    dpred_ref[0] = vjp(g_ref[0])[0]


def _specs(N, B, C, H, W, pred_dtype):
    assert N % B == 0, (N, B)
    return dict(
        grid=(B, N // B),
        in_specs=[
            pl.BlockSpec((1, C, H, W), lambda b, k: (k * B + b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            # keyed by the batch row alone: constant across the k grid dim,
            # so the target DMA is issued once per batch row
            pl.BlockSpec((1, C, H, W), lambda b, k: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )


def _reproj_err_impl(preds: jax.Array, target: jax.Array, interpret: bool):
    N, H, W, C = preds.shape
    B = target.shape[0]
    spec = _specs(N, B, C, H, W, preds.dtype)
    out = pl.pallas_call(
        _err_kernel,
        out_shape=jax.ShapeDtypeStruct((N, H, W), jnp.float32),
        out_specs=pl.BlockSpec((1, H, W), lambda b, k: (k * B + b, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        **spec,
    )(preds.transpose(0, 3, 1, 2), target.transpose(0, 3, 1, 2))
    return out


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def pallas_reproj_err(preds: jax.Array, target: jax.Array,
                      interpret: bool = False) -> jax.Array:
    """Per-pixel reprojection error maps, fused in VMEM.

    preds: (N, H, W, C) warped predictions, N = k * B laid out k-major /
    batch-minor (the warp stack order in train/steps.py); target:
    (B, H, W, 3) shared target frames.  Returns (N, H, W) f32 — the exact
    `reprojection_loss` maps (<= ~1e-6 FMA-contraction differences).
    Differentiable w.r.t. preds; the target is treated as constant data
    (input frames never carry gradients in this framework)."""
    return _reproj_err_impl(preds, target, interpret)


def _fwd(preds, target, interpret):
    return _reproj_err_impl(preds, target, interpret), (preds, target)


def _bwd(interpret, residuals, g):
    preds, target = residuals
    N, H, W, C = preds.shape
    B = target.shape[0]
    spec = _specs(N, B, C, H, W, preds.dtype)
    spec["in_specs"].append(
        pl.BlockSpec((1, H, W), lambda b, k: (k * B + b, 0, 0),
                     memory_space=pltpu.VMEM)
    )
    dpred = pl.pallas_call(
        _err_bwd_kernel,
        out_shape=jax.ShapeDtypeStruct((N, C, H, W), jnp.float32),
        out_specs=pl.BlockSpec((1, C, H, W), lambda b, k: (k * B + b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        **spec,
    )(
        preds.transpose(0, 3, 1, 2),
        target.transpose(0, 3, 1, 2),
        g.astype(jnp.float32),
    )
    return dpred.transpose(0, 2, 3, 1).astype(preds.dtype), jnp.zeros_like(target)


pallas_reproj_err.defvjp(_fwd, _bwd)

"""Pallas TPU kernel for the photometric reprojection error (SSIM + L1).

Why: the reference's per-pair loss (0.85*SSIM + 0.15*L1,
/root/reference/depth_pose_prediction/depth_pose_prediction.py:1178-1192)
runs five 3x3 average pools per image pair.  Under XLA each reduce-window
materialises its operand and output in HBM, so the loss slice moves
hundreds of MB per adaptation iteration at 192x640 — the residual HBM
traffic that bounds the native roofline below the 100 fps north star
(BASELINE.md round-3 calibration).  This kernel computes the whole
per-pixel error map in VMEM-resident passes and writes only the (H, W)
error map — input images are read O(1) times, nothing intermediate
touches HBM.

VMEM-stack discipline (round-4 relay lesson): Mosaic allocates every live
kernel temporary on a ~16 MB scoped-VMEM stack, and a full-image
channel-stacked evaluation of this math at 192x640 needs ~13 live
(C, H, W) f32 blocks — 18.8 MB, a compile-time OOM.  Two structural
fixes keep the stack small at any size:

* **Per-channel evaluation**: SSIM and L1 are channel-separable before
  the channel mean, so the kernel loops channels — temporaries are
  (win_h, W), 3x smaller, and the backward runs one `jax.vjp` PER
  CHANNEL so residual sets never stack across channels.
* **Row-block windowing**: each grid step computes a BLOCK_H-row slab
  from a (BLOCK_H + 2*HALO)-row input window (halo = 16 rows, aligned to
  the bf16 (16, 128) VMEM tile).  The 3x3 pools need 1 halo row; the
  backward needs 2 (gradient rows r pull error rows r+-1 which pull
  pred rows r+-2) — both far inside the halo, so slab results equal the
  full-image evaluation exactly, including the reflect padding (window
  edges that are not image edges are never emitted/seeded).
  `_pick_block_h` sizes the slab to the stack budget; `fits_vmem`
  gates the caller's XLA fallback.

Layout: channel-major (B, C, H, W) inside the kernel; the public API is
NHWC.  The grid is (B, H//BLOCK_H, N//B) with the shared target window
keyed by (batch row, slab) only, so consecutive grid steps over the 2*S
warp directions/scales of one batch row reuse the target DMA (Mosaic
skips re-issuing a DMA whose block index is unchanged).

Backward: a second kernel recomputes the forward math under `jax.vjp`
*inside* the kernel body (values are ordinary tracers), yielding a
gradient identical to autodiff of the XLA composition without storing
any pooled moments in HBM.

No dynamic addressing anywhere: windows ride `Element` BlockSpec dims
with TILE-ALIGNED offsets computed from grid indices, and the slab
selection is a 3-way static-slice `where` — this compiles on Mosaic
toolchains that reject dynamic `pl.ds` (the dev relay).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SSIM_C1 = 0.01**2
_SSIM_C2 = 0.03**2

HALO = 16  # window halo rows; multiple of the bf16 sublane tile (16)

# VMEM-stack budget for kernel temporaries: ~28 live (win_h, W) f32
# per-channel blocks in the vjp recompute (the measured full-image
# channel-stacked forward needed ~13 (C, H, W) blocks), kept well under
# the ~16 MB scoped limit to leave room for the double-buffered operands.
_STACK_BUDGET_BYTES = 8 * 1024 * 1024


def _pick_block_h(H: int, W: int) -> int:
    """Largest slab height whose windowed vjp recompute fits the stack
    budget; 0 if none does (caller falls back to the XLA loss)."""
    for bh in (H, 96, 64, 48, 32, 16):
        if bh > H or H % bh:
            continue
        win = bh if bh == H else bh + 2 * HALO
        if win > H:
            continue
        if 28 * win * W * 4 < _STACK_BUDGET_BYTES:
            return bh
    return 0


def fits_vmem(H: int, W: int, C: int) -> bool:
    return _pick_block_h(H, W) > 0


def _shift_h(x: jax.Array, d: int) -> jax.Array:
    """Reflect-pad neighbour along the sublane (H) axis of (H, W)."""
    if d == -1:  # value at row i = x[i-1]; row 0 reflects to x[1]
        return jnp.concatenate([x[1:2, :], x[:-1, :]], axis=0)
    # value at row i = x[i+1]; row H-1 reflects to x[H-2]
    return jnp.concatenate([x[1:, :], x[-2:-1, :]], axis=0)


def _shift_w(x: jax.Array, d: int) -> jax.Array:
    """Reflect-pad neighbour along the lane (W) axis of (H, W)."""
    if d == -1:
        return jnp.concatenate([x[:, 1:2], x[:, :-1]], axis=1)
    return jnp.concatenate([x[:, 1:], x[:, -2:-1]], axis=1)


def _pool3(x: jax.Array) -> jax.Array:
    """3x3 mean pool with reflect padding — the reference SSIM's pooling
    (losses/photometric.py::_avg_pool3 on a reflect-padded image), as two
    separable in-register shift sums."""
    x = (_shift_h(x, -1) + x + _shift_h(x, 1)) / 3.0
    return (_shift_w(x, -1) + x + _shift_w(x, 1)) / 3.0


def _err_math_c(x: jax.Array, y: jax.Array) -> jax.Array:
    """PER-CHANNEL reprojection error contribution, both (H, W).

    Same formula chain as losses/photometric.py::reprojection_loss
    (reference _compute_reprojection_loss + SSIM module) before the
    channel mean: 0.85 * clip((1 - SSIM)/2, 0, 1) + 0.15 * |y - x|.
    The full error map is the channel mean of these."""
    l1 = jnp.abs(y - x)
    mu_x = _pool3(x)
    mu_y = _pool3(y)
    sigma_x = _pool3(x * x) - mu_x * mu_x
    sigma_y = _pool3(y * y) - mu_y * mu_y
    sigma_xy = _pool3(x * y) - mu_x * mu_y
    n = (2 * mu_x * mu_y + _SSIM_C1) * (2 * sigma_xy + _SSIM_C2)
    d = (mu_x * mu_x + mu_y * mu_y + _SSIM_C1) * (sigma_x + sigma_y + _SSIM_C2)
    ssim = jnp.clip((1 - n / d) / 2, 0.0, 1.0)
    return 0.85 * ssim + 0.15 * l1


def _err_math(x: jax.Array, y: jax.Array) -> jax.Array:
    """Channel-stacked error map, both (C, H, W) — channel mean of
    `_err_math_c` (reference test oracle / small-shape path)."""
    C = x.shape[0]
    return sum(_err_math_c(x[c], y[c]) for c in range(C)) / C


def _slab_scalars(H: int, BH: int):
    """(window origin, emit offset) of this grid step's row slab."""
    i = pl.program_id(1)
    if BH == H:
        return 0, 0
    win_h = BH + 2 * HALO
    # computed in HALO(=16-row tile) units then scaled, so Mosaic can prove
    # the offset's 8/16-row tiling divisibility without reasoning through
    # clip (the pallas_warp _window_origin idiom — CLAUDE.md relay rule)
    ys = jnp.clip(i * (BH // HALO) - 1, 0, (H - win_h) // HALO) * HALO
    return ys, i * BH - ys  # off in {0, HALO, 2*HALO}


def _select_slab(x: jax.Array, off, BH: int):
    """Rows [off, off+BH) of a window array by 3-way static-slice select
    (off is a traced scalar in {0, HALO, 2*HALO}; no dynamic slicing)."""
    if x.shape[0] == BH:
        return x
    s0 = x[0:BH, :]
    s1 = x[HALO:HALO + BH, :]
    s2 = x[2 * HALO:2 * HALO + BH, :]
    return jnp.where(off == 0, s0, jnp.where(off == HALO, s1, s2))


def _err_kernel(pred_ref, tgt_ref, out_ref, *, H, BH):
    _, off = _slab_scalars(H, BH)
    C = pred_ref.shape[1]
    acc = None
    for c in range(C):
        e = _err_math_c(pred_ref[0, c].astype(jnp.float32),
                        tgt_ref[0, c].astype(jnp.float32))
        acc = e if acc is None else acc + e
    out_ref[0] = _select_slab(acc / C, off, BH)


def _err_bwd_kernel(pred_ref, tgt_ref, g_ref, dpred_ref, *, H, BH):
    """Recompute-backward, one `jax.vjp` per channel so residual sets
    never stack.  The incoming window of error cotangents is masked to
    the rows whose gradient touches this slab's pred rows (err rows
    slab+-1); slab results equal the full-image vjp exactly."""
    ys, off = _slab_scalars(H, BH)
    C = pred_ref.shape[1]
    g = g_ref[0]
    if BH != H:
        i = pl.program_id(1)
        row = ys + jax.lax.broadcasted_iota(jnp.int32, g.shape, 0)
        g = jnp.where((row >= i * BH - 1) & (row <= i * BH + BH), g, 0.0)
    for c in range(C):
        y = tgt_ref[0, c].astype(jnp.float32)
        _, vjp = jax.vjp(lambda p, y=y: _err_math_c(p, y),
                         pred_ref[0, c].astype(jnp.float32))
        dpred_ref[0, c] = _select_slab(vjp(g)[0], off, BH) / C


def _window_specs(N, B, C, H, W, BH, with_g=False):
    """Input specs: pred window, target window (keyed by batch row + slab
    only — reused across the N//B innermost grid dim), optional error-
    cotangent window.  All windows ride Element dims with 16-row-aligned
    offsets (bf16 tile safe)."""
    from jax.experimental.pallas import Element

    assert N % B == 0, (N, B)
    assert H % BH == 0, (H, BH)
    win_h = BH if BH == H else BH + 2 * HALO

    def ys(i):
        if BH == H:
            return 0
        # tile-unit clip then scale — provably 16-row aligned (see
        # _slab_scalars)
        return jnp.clip(i * (BH // HALO) - 1, 0, (H - win_h) // HALO) * HALO

    img_win = (Element(1), Element(C), Element(win_h), Element(W))
    in_specs = [
        pl.BlockSpec(img_win, lambda b, i, k: (k * B + b, 0, ys(i), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(img_win, lambda b, i, k: (b, 0, ys(i), 0),
                     memory_space=pltpu.VMEM),
    ]
    if with_g:
        in_specs.append(
            pl.BlockSpec((Element(1), Element(win_h), Element(W)),
                         lambda b, i, k: (k * B + b, ys(i), 0),
                         memory_space=pltpu.VMEM)
        )
    return dict(grid=(B, H // BH, N // B), in_specs=in_specs)


def _reproj_err_impl(preds: jax.Array, target: jax.Array, interpret: bool):
    N, H, W, C = preds.shape
    B = target.shape[0]
    BH = _pick_block_h(H, W)
    assert BH > 0, (H, W)
    spec = _window_specs(N, B, C, H, W, BH)
    out = pl.pallas_call(
        partial(_err_kernel, H=H, BH=BH),
        out_shape=jax.ShapeDtypeStruct((N, H, W), jnp.float32),
        out_specs=pl.BlockSpec((1, BH, W), lambda b, i, k: (k * B + b, i, 0),
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
    BH = _pick_block_h(H, W)
    spec = _window_specs(N, B, C, H, W, BH, with_g=True)
    dpred = pl.pallas_call(
        partial(_err_bwd_kernel, H=H, BH=BH),
        out_shape=jax.ShapeDtypeStruct((N, C, H, W), jnp.float32),
        out_specs=pl.BlockSpec((1, C, BH, W),
                               lambda b, i, k: (k * B + b, 0, i, 0),
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

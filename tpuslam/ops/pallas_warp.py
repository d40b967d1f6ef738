"""Pallas TPU kernel for the photometric inverse-warp (bilinear resampling).

Why: XLA lowers arbitrary 2-D gathers to tile-granular reads — every sampled
pixel costs a full (8, 128) VMEM tile of HBM traffic, and the warp stage
dominates the fused adapt step (~60% of its time; see BASELINE.md).  This
kernel exploits the *smoothness* of SLAM warps: the source coordinates of an
(8, 128) output tile span a small window, so the tile is served from a VMEM
window with in-register lane gathers (Mosaic supports per-lane dynamic
`take_along_axis` within 128 lanes) plus a masked row-select vertically.

The window is 2 x 128 lanes wide (x footprint budget 255 px per output tile)
and WINDOW_H rows tall (y footprint budget).  Footprints beyond the window
clamp to its edge (border-like degradation); frame-to-frame SLAM warps are a
few pixels, so the fast path is exact.  Use the XLA sampler for arbitrary
coordinate fields.

Differentiable w.r.t. `coords` via a custom-VJP backward kernel; `src` is
treated as constant (camera images are inputs, never parameters).

Opt-in: `tpuslam.train.steps` uses the XLA sampler by default; enable after
profiling on target silicon.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 8
TILE_W = 128
WINDOW_H = 16  # source rows held per output tile (vertical footprint budget)
WINDOW_W = 2 * TILE_W  # two lane segments -> 255 px horizontal budget


def _tile_geometry(src_ref, coords_ref):
    """Shared coordinate/window set-up for the fwd and bwd kernels."""
    H, W = src_ref.shape[1], src_ref.shape[2]
    x = jnp.clip(coords_ref[0, :, :, 0], 0.0, W - 1)
    y = jnp.clip(coords_ref[0, :, :, 1], 0.0, H - 1)
    x0 = jnp.minimum(jnp.floor(x), W - 2)
    y0 = jnp.minimum(jnp.floor(y), H - 2)
    wx = x - x0
    wy = y - y0
    xmin = jnp.clip(jnp.min(x0).astype(jnp.int32), 0, max(W - WINDOW_W, 0))
    ymin = jnp.clip(jnp.min(y0).astype(jnp.int32), 0, max(H - WINDOW_H, 0))
    window = src_ref[0, pl.ds(ymin, WINDOW_H), pl.ds(xmin, WINDOW_W), :]
    xr = jnp.clip(x0.astype(jnp.int32) - xmin, 0, WINDOW_W - 2)
    yr = jnp.clip(y0.astype(jnp.int32) - ymin, 0, WINDOW_H - 2)
    return window, xr, yr, wx, wy


def _row_gather(window_row, xr):
    """Per-lane gather of a WINDOW_W-wide source row at in-window indices.

    Mosaic's dynamic lane gather is 128-lane local, so the row is split into
    two segments and the result lane-selected."""
    lo = jnp.broadcast_to(window_row[:TILE_W][None, :], xr.shape)
    hi = jnp.broadcast_to(window_row[TILE_W:][None, :], xr.shape)
    xr_lo = jnp.minimum(xr, TILE_W - 1)
    xr_hi = jnp.clip(xr - TILE_W, 0, TILE_W - 1)
    v_lo = jnp.take_along_axis(lo, xr_lo, axis=1)
    v_hi = jnp.take_along_axis(hi, xr_hi, axis=1)
    return jnp.where(xr < TILE_W, v_lo, v_hi)


def _gather_neighbors(window, xr, w, c):
    """(va0, va1, vb0, vb1): 2x2 neighbourhood values for window row pair w."""
    row_a = window[w, :, c]
    row_b = window[w + 1, :, c]
    va0 = _row_gather(row_a, xr)
    va1 = _row_gather(row_a, jnp.minimum(xr + 1, WINDOW_W - 1))
    vb0 = _row_gather(row_b, xr)
    vb1 = _row_gather(row_b, jnp.minimum(xr + 1, WINDOW_W - 1))
    return va0, va1, vb0, vb1


def _warp_kernel(src_ref, coords_ref, out_ref):
    window, xr, yr, wx, wy = _tile_geometry(src_ref, coords_ref)
    C = src_ref.shape[3]
    acc = jnp.zeros((TILE_H, TILE_W, C), jnp.float32)
    for w in range(WINDOW_H - 1):
        hit = (yr == w)[..., None]
        val = jnp.zeros_like(acc)
        for c in range(C):
            va0, va1, vb0, vb1 = _gather_neighbors(window, xr, w, c)
            top = va0 * (1 - wx) + va1 * wx
            bot = vb0 * (1 - wx) + vb1 * wx
            val = val.at[..., c].set(top * (1 - wy) + bot * wy)
        acc = jnp.where(hit, val, acc)
    out_ref[0, :, :, :] = acc


def _grad_kernel(src_ref, coords_ref, g_ref, dcoords_ref):
    H, W = src_ref.shape[1], src_ref.shape[2]
    C = src_ref.shape[3]
    window, xr, yr, wx, wy = _tile_geometry(src_ref, coords_ref)
    # zero gradient where the clip saturates (matches autodiff of jnp.clip)
    x = coords_ref[0, :, :, 0]
    y = coords_ref[0, :, :, 1]
    # jnp.clip autodiff: gradient 1 inside, 0 outside, and 0.5 at exact
    # boundary ties (maximum/minimum split subgradients at equal args)
    def live(v, hi):
        inside = ((v > 0.0) & (v < hi)).astype(jnp.float32)
        tie = ((v == 0.0) | (v == hi)).astype(jnp.float32)
        return inside + 0.5 * tie

    live_x = live(x, W - 1)
    live_y = live(y, H - 1)

    dx = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    dy = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    for w in range(WINDOW_H - 1):
        hit = yr == w
        ddx = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        ddy = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        for c in range(C):
            va0, va1, vb0, vb1 = _gather_neighbors(window, xr, w, c)
            gc = g_ref[0, :, :, c]
            ddx += gc * ((va1 - va0) * (1 - wy) + (vb1 - vb0) * wy)
            ddy += gc * ((vb0 - va0) * (1 - wx) + (vb1 - va1) * wx)
        dx = jnp.where(hit, ddx, dx)
        dy = jnp.where(hit, ddy, dy)
    dcoords_ref[0, :, :, 0] = dx * live_x
    dcoords_ref[0, :, :, 1] = dy * live_y


def _specs(B, H, W, C, out_channels):
    return dict(
        grid=(B, H // TILE_H, W // TILE_W),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda b, i, j: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_H, TILE_W, 2), lambda b, i, j: (b, i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TILE_H, TILE_W, out_channels), lambda b, i, j: (b, i, j, 0),
            memory_space=pltpu.VMEM,
        ),
    )


def _pallas_warp_fwd_impl(src: jax.Array, coords: jax.Array, interpret: bool) -> jax.Array:
    B, H, W, C = src.shape
    assert H % TILE_H == 0 and W % TILE_W == 0, (H, W)
    spec = _specs(B, H, W, C, C)
    return pl.pallas_call(
        _warp_kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), jnp.float32),
        interpret=interpret,
        **spec,
    )(src, coords)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def pallas_warp(src: jax.Array, coords: jax.Array, interpret: bool = False):
    """Bilinear warp via the Pallas window kernel.

    src: (B, H, W, C); coords: (B, H, W, 2) pixel-unit (x, y).
    """
    return _pallas_warp_fwd_impl(src, coords, interpret)


def _fwd(src, coords, interpret):
    return _pallas_warp_fwd_impl(src, coords, interpret), (src, coords)


def _bwd(interpret, residuals, g):
    src, coords = residuals
    B, H, W, C = src.shape
    spec = _specs(B, H, W, C, 2)
    spec["in_specs"].append(
        pl.BlockSpec((1, TILE_H, TILE_W, C), lambda b, i, j: (b, i, j, 0),
                     memory_space=pltpu.VMEM)
    )
    dcoords = pl.pallas_call(
        _grad_kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, W, 2), jnp.float32),
        interpret=interpret,
        **spec,
    )(src, coords, g)
    return jnp.zeros_like(src), dcoords


pallas_warp.defvjp(_fwd, _bwd)

"""Pallas TPU kernel for the photometric inverse-warp (bilinear resampling).

Why: XLA lowers arbitrary 2-D gathers to tile-granular reads — every sampled
pixel costs a full (8, 128) VMEM tile of HBM traffic, and the warp stage
dominates the fused adapt step (~60% of its time; see BASELINE.md).  This
kernel exploits the *smoothness* of SLAM warps: the source coordinates of an
(8, 128) output tile span a small window, so the tile is served from a VMEM
window with in-register lane gathers (Mosaic supports per-lane dynamic
`take_along_axis` within 128 lanes) plus a masked row-select vertically.

Layout: channel-major (B, C, H, W) inside the kernel so image rows are lane
vectors; the public API converts from/to NHWC at the call boundary.  The
window is 2 x 128 lanes wide (x footprint budget 255 px per output tile) and
WINDOW_H rows tall.  Footprints beyond the window clamp to its edge
(border-like degradation); frame-to-frame SLAM warps span a few pixels, so
the fast path is exact.  Use the XLA sampler for arbitrary coordinate fields.

Differentiable w.r.t. `coords` via a custom-VJP backward kernel; `src` is
treated as constant (camera images are inputs, never parameters).

Two variants:

* `pallas_warp` — dynamic window: the VMEM window is positioned by the
  actual coordinate minimum of each tile (dynamic `pl.ds`).  Exact for any
  tile whose coordinate footprint fits the window.  The dev relay's
  remote-compile Mosaic stack rejects ALL in-kernel dynamic addressing, so
  this variant is interpret-validated here and needs a standard libtpu
  toolchain to compile.
* `pallas_warp_static` — static window: each output tile reads the 3x3
  block of (8, 128) tiles centred on it, addressed purely by grid position
  through `Element` BlockSpec dims (tile-aligned offsets).  COMPILES AND
  RUNS on the relay Mosaic stack: forward bit-exact vs the XLA sampler,
  VJP to 1e-11, and ~6x faster than the XLA gather at adapt-step shapes
  (BASELINE.md).  Exact for displacements within one tile (>=8 rows /
  >=128 cols of margin); beyond that the source clamps to the window edge.
  Enabled via `LossConfig.use_pallas_warp` / `DepthPoseConfig.pallas_warp`.

Tuning notes for other silicon (measured on the dev attachment):
* the row sweep is VPU-bound, not DMA-bound — taller output blocks (which
  cut the window read amplification 9x -> 4x) measured SLOWER (out_h 8/16/24
  = 13.5/15/18 ms fwd+bwd at 24x192x640), so out_h stays 8;
* window-DMA dedup (operand deduplicated to the distinct source images,
  batch-innermost grid so consecutive steps share the window block index
  and the pipeline skips re-issuing the DMA) was measured: bit-identical,
  6.9 vs 7.0 ms forward — NO gain on this attachment, confirming the VPU
  sweep, not DMA, is the bound.  Re-measure before reviving it elsewhere.
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


def _tile_coords(src_ref, coords_ref):
    """Shared coordinate set-up.  Returns in-window indices + weights +
    window origin scalars."""
    H, W = src_ref.shape[2], src_ref.shape[3]
    x = jnp.clip(coords_ref[0, 0], 0.0, W - 1)
    y = jnp.clip(coords_ref[0, 1], 0.0, H - 1)
    x0 = jnp.minimum(jnp.floor(x), W - 2)
    y0 = jnp.minimum(jnp.floor(y), H - 2)
    wx = x - x0
    wy = y - y0
    xmin = jnp.clip(jnp.min(x0).astype(jnp.int32), 0, max(W - WINDOW_W, 0))
    ymin = jnp.clip(jnp.min(y0).astype(jnp.int32), 0, max(H - WINDOW_H, 0))
    xr = jnp.clip(x0.astype(jnp.int32) - xmin, 0, WINDOW_W - 2)
    yr = jnp.clip(y0.astype(jnp.int32) - ymin, 0, WINDOW_H - 2)
    return xr, yr, wx, wy, xmin, ymin


def _row_gather(window_row, xr):
    """Per-lane gather of a (WINDOW_W,) source row at in-window indices.

    Mosaic's dynamic lane gather is 128-lane local, so the row splits into
    two segments whose results are lane-selected."""
    lo = jnp.broadcast_to(window_row[:TILE_W][None, :], xr.shape)
    hi = jnp.broadcast_to(window_row[TILE_W:][None, :], xr.shape)
    xr_lo = jnp.minimum(xr, TILE_W - 1)
    xr_hi = jnp.clip(xr - TILE_W, 0, TILE_W - 1)
    v_lo = jnp.take_along_axis(lo, xr_lo, axis=1)
    v_hi = jnp.take_along_axis(hi, xr_hi, axis=1)
    return jnp.where(xr < TILE_W, v_lo, v_hi)


def _gather_neighbors(window_c, xr, w):
    """(va0, va1, vb0, vb1) 2x2 neighbourhood values for window row pair w.

    window_c: (WINDOW_H, WINDOW_W) single-channel window."""
    xr1 = jnp.minimum(xr + 1, WINDOW_W - 1)
    va0 = _row_gather(window_c[w], xr)
    va1 = _row_gather(window_c[w], xr1)
    vb0 = _row_gather(window_c[w + 1], xr)
    vb1 = _row_gather(window_c[w + 1], xr1)
    return va0, va1, vb0, vb1


def _warp_kernel(src_ref, coords_ref, out_ref):
    C = src_ref.shape[1]
    xr, yr, wx, wy, xmin, ymin = _tile_coords(src_ref, coords_ref)
    for c in range(C):
        window_c = src_ref[0, c, pl.ds(ymin, WINDOW_H), pl.ds(xmin, WINDOW_W)]
        acc = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        for w in range(WINDOW_H - 1):
            va0, va1, vb0, vb1 = _gather_neighbors(window_c, xr, w)
            top = va0 * (1 - wx) + va1 * wx
            bot = vb0 * (1 - wx) + vb1 * wx
            acc = jnp.where(yr == w, top * (1 - wy) + bot * wy, acc)
        out_ref[0, c] = acc


def _grad_kernel(src_ref, coords_ref, g_ref, dcoords_ref):
    H, W = src_ref.shape[2], src_ref.shape[3]
    C = src_ref.shape[1]
    xr, yr, wx, wy, xmin, ymin = _tile_coords(src_ref, coords_ref)
    x = coords_ref[0, 0]
    y = coords_ref[0, 1]

    # jnp.clip autodiff: gradient 1 inside, 0 outside, 0.5 at exact boundary
    # ties (maximum/minimum split subgradients at equal args)
    def live(v, hi):
        inside = ((v > 0.0) & (v < hi)).astype(jnp.float32)
        tie = ((v == 0.0) | (v == hi)).astype(jnp.float32)
        return inside + 0.5 * tie

    dx = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    dy = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    for c in range(C):
        window_c = src_ref[0, c, pl.ds(ymin, WINDOW_H), pl.ds(xmin, WINDOW_W)]
        gc = g_ref[0, c]
        ddx = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        ddy = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        for w in range(WINDOW_H - 1):
            va0, va1, vb0, vb1 = _gather_neighbors(window_c, xr, w)
            hit = yr == w
            ddx = jnp.where(
                hit, gc * ((va1 - va0) * (1 - wy) + (vb1 - vb0) * wy), ddx
            )
            ddy = jnp.where(
                hit, gc * ((vb0 - va0) * (1 - wx) + (vb1 - va1) * wx), ddy
            )
        dx = dx + ddx
        dy = dy + ddy
    dcoords_ref[0, 0] = dx * live(x, W - 1)
    dcoords_ref[0, 1] = dy * live(y, H - 1)


def _specs(B, H, W, C, out_channels):
    return dict(
        grid=(B, H // TILE_H, W // TILE_W),
        in_specs=[
            pl.BlockSpec((1, C, H, W), lambda b, i, j: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, TILE_H, TILE_W), lambda b, i, j: (b, 0, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, out_channels, TILE_H, TILE_W), lambda b, i, j: (b, 0, i, j),
            memory_space=pltpu.VMEM,
        ),
    )


def _pallas_warp_chw(src_chw, coords_chw, interpret):
    B, C, H, W = src_chw.shape
    spec = _specs(B, H, W, C, C)
    return pl.pallas_call(
        _warp_kernel,
        out_shape=jax.ShapeDtypeStruct((B, C, H, W), jnp.float32),
        interpret=interpret,
        **spec,
    )(src_chw, coords_chw)


def _pallas_warp_fwd_impl(src: jax.Array, coords: jax.Array, interpret: bool) -> jax.Array:
    B, H, W, C = src.shape
    assert H % TILE_H == 0 and W % TILE_W == 0, (H, W)
    out = _pallas_warp_chw(
        src.transpose(0, 3, 1, 2), coords.transpose(0, 3, 1, 2), interpret
    )
    return out.transpose(0, 2, 3, 1)


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
        pl.BlockSpec((1, C, TILE_H, TILE_W), lambda b, i, j: (b, 0, i, j),
                     memory_space=pltpu.VMEM)
    )
    dcoords = pl.pallas_call(
        _grad_kernel,
        out_shape=jax.ShapeDtypeStruct((B, 2, H, W), jnp.float32),
        interpret=interpret,
        **spec,
    )(
        src.transpose(0, 3, 1, 2),
        coords.transpose(0, 3, 1, 2),
        g.transpose(0, 3, 1, 2),
    )
    return jnp.zeros_like(src), dcoords.transpose(0, 2, 3, 1)


pallas_warp.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Static-window variant: no dynamic addressing inside the kernel.
#
# The window served to each output tile is fixed by the GRID position alone
# (the 3x3 block of (8, 128) tiles centred on the output tile, clipped),
# delivered through the BlockSpec pipeline with `Element` (element-offset)
# dims — tile-aligned offsets, so Mosaic can prove the (8, 128) tiling
# divides them, and toolchains that reject in-kernel dynamic `pl.ds` (the
# dev relay's remote Mosaic) can still compile it.  Exactness domain: warp
# displacements within one tile of the output pixel (>= 8 rows / 128 cols
# of margin); larger displacements clamp to the window edge (border-like
# degradation).  SLAM frame-to-frame warps are a few px.
# ---------------------------------------------------------------------------
SWIN_W = 3 * TILE_W  # 384 cols (one lane-segment of margin either side)
# Window height = out_h + 2 * EXTRA_TILES * TILE_H.  extra_tiles=1 gives the
# round-2 window (~8 px vertical margin); extra_tiles=2 widens it to ~16-24 px
# — enough for near-field road rows at 192x640 (fy~369), where early-
# adaptation depth error routinely exceeds 8 px of vertical flow (ADVICE r2).


def _pick_out_h(H: int) -> int:
    """Tallest supported output block: cuts the window read amplification
    ((out_h+16)*384 / (out_h*128) — 9x at out_h=8, 3.5x at out_h=96) and the
    row-sweep work per output pixel."""
    # measured on the dev attachment: out_h=8 13.5ms, 16 ~15ms, 24 ~18ms
    # (fwd+bwd, 24x192x640) and out_h>=48 hits Mosaic scoped-vmem stack
    # limits -- the sweep is VPU-bound, so the smallest block wins; the
    # parametric machinery stays for re-tuning on other silicon
    for oh in (8,):
        if H % oh == 0 and H >= oh + 2 * TILE_H:
            return oh
    return TILE_H


def _window_origin(i, j, H, W, out_h, extra_tiles=1):
    # computed in TILE units then scaled so the offsets are provably aligned
    oh_t = out_h // TILE_H
    ys = jnp.clip(
        i * oh_t - extra_tiles, 0, H // TILE_H - (oh_t + 2 * extra_tiles)
    ) * TILE_H
    xs = jnp.clip(j - 1, 0, W // TILE_W - 3) * TILE_W
    return ys, xs


def _static_tile_coords(coords_ref, H, W, out_h, extra_tiles=1):
    """In-window indices + weights for the static grid-derived window."""
    i = pl.program_id(1)
    j = pl.program_id(2)
    win_h = out_h + 2 * extra_tiles * TILE_H
    ys, xs = _window_origin(i, j, H, W, out_h, extra_tiles)
    x = jnp.clip(coords_ref[0, 0], 0.0, W - 1)
    y = jnp.clip(coords_ref[0, 1], 0.0, H - 1)
    x0 = jnp.minimum(jnp.floor(x), W - 2)
    y0 = jnp.minimum(jnp.floor(y), H - 2)
    wx = x - x0
    wy = y - y0
    xr = jnp.clip(x0.astype(jnp.int32) - xs, 0, SWIN_W - 2)
    yr = jnp.clip(y0.astype(jnp.int32) - ys, 0, win_h - 2)
    return xr, yr, wx, wy


def _row_gather_all_channels(src_win_ref, w, xr, C):
    """Gather ALL channels of window row `w` at in-window indices xr.

    One take_along_axis per 128-lane segment serves every (channel, output
    sublane) pair at once: the C channel rows are replicated across the
    output-block sublanes into a (C*out_h, 128) block, so the gather count
    per row drops from C*segments to segments.  Returns (C, out_h, TILE_W)."""
    out_h = xr.shape[0]
    rows = src_win_ref[0, :, w, :]  # (C, SWIN_W)
    idx = jnp.tile(xr, (C, 1))  # (C*out_h, TILE_W)
    out = None
    for s in range(0, SWIN_W, TILE_W):
        seg = jnp.repeat(rows[:, s : s + TILE_W], out_h, axis=0)  # (C*out_h, 128)
        v = jnp.take_along_axis(seg, jnp.clip(idx - s, 0, TILE_W - 1), axis=1)
        out = v if out is None else jnp.where(idx >= s, v, out)
    return out.reshape(C, out_h, TILE_W)


def _scan_window_rows(src_win_ref, coords_ref, H, W, out_h, emit,
                      extra_tiles=1, sparse=False):
    """Shared row sweep for the static kernels.

    Dense mode walks every window row once, reusing each row's gathers as
    both the 'bottom' of row pair w-1 and the 'top' of row pair w (halves
    the gather count), with all channels served per gather.

    Sparse mode predicates each row pair on `any(yr == w)` via `pl.when`
    (scalar scf.if — still no dynamic addressing): rows no output pixel maps
    to are skipped at runtime.  A smooth warp's out_h-row block touches only
    ~out_h+|flow| source rows, so taller windows (extra_tiles=2 -> 16-24 px
    vertical margin) cost almost nothing.  Each executed pair re-gathers its
    two rows (4 gathers, no cross-pair reuse) — worth it when most pairs
    skip.  In sparse mode `emit` runs inside the cond, so it MUST write refs
    (Python-carried accumulators don't escape a pl.when body).

    Calls `emit(w, hit, va0, va1, vb0, vb1, wx, wy)` per (executed) row
    pair, v* of shape (C, out_h, TILE_W)."""
    C = src_win_ref.shape[1]
    win_h = out_h + 2 * extra_tiles * TILE_H
    xr, yr, wx, wy = _static_tile_coords(coords_ref, H, W, out_h, extra_tiles)
    xr1 = jnp.minimum(xr + 1, SWIN_W - 1)
    if sparse:
        for w in range(win_h - 1):
            hit = yr == w

            @pl.when(jnp.any(hit))
            def _(w=w, hit=hit):
                a0 = _row_gather_all_channels(src_win_ref, w, xr, C)
                a1 = _row_gather_all_channels(src_win_ref, w, xr1, C)
                b0 = _row_gather_all_channels(src_win_ref, w + 1, xr, C)
                b1 = _row_gather_all_channels(src_win_ref, w + 1, xr1, C)
                emit(w, hit, a0, a1, b0, b1, wx, wy)
        return wx, wy
    b0 = _row_gather_all_channels(src_win_ref, 0, xr, C)
    b1 = _row_gather_all_channels(src_win_ref, 0, xr1, C)
    for w in range(win_h - 1):
        a0, a1 = b0, b1
        b0 = _row_gather_all_channels(src_win_ref, w + 1, xr, C)
        b1 = _row_gather_all_channels(src_win_ref, w + 1, xr1, C)
        emit(w, yr == w, a0, a1, b0, b1, wx, wy)
    return wx, wy


def _row_gather_all_channels_packed(src_win_ref, w, xr, C):
    """One per-lane gather serving BOTH horizontal bilinear taps.

    Packs row[x] and row[x+1] as the two bfloat16 halves of one uint32 lane
    (truncation, not round-to-nearest), gathers the packed word at xr, and
    unpacks — HALF the gather indices of the two-tap path.  Gathers are the
    warp kernel's dominant cost (relay: per-index; the round-3 raw-tap
    select showed arithmetic is free next to them), so this is the only
    remaining 2x on the sweep.  Tap precision drops to bf16 (~3 decimal
    digits on [0,1] images) — opt-in via `packed=True`; the f32 path stays
    default/bit-exact.  Returns (v0, v1), each (C, out_h, TILE_W) f32."""
    out_h = xr.shape[0]
    packed = _pack_row_bf16(src_win_ref, w)
    idx = jnp.tile(xr, (C, 1))
    out = None
    for s in range(0, SWIN_W, TILE_W):
        seg = jnp.repeat(packed[:, s : s + TILE_W], out_h, axis=0)
        v = jnp.take_along_axis(seg, jnp.clip(idx - s, 0, TILE_W - 1), axis=1)
        out = v if out is None else jnp.where(idx >= s, v, out)
    return _unpack_taps(out.reshape(C, out_h, TILE_W))


def _pack_row_bf16(src_win_ref, w):
    """(C, SWIN_W) u32 lanes holding (row[x] | row[x+1]) as bf16 halves.

    Truncation, not round-to-nearest.  The roll wraps at SWIN_W-1, but xr
    is clipped to SWIN_W-2 so the wrapped lane is never selected."""
    rows = src_win_ref[0, :, w, :]  # (C, SWIN_W) f32
    bits = jax.lax.bitcast_convert_type(rows, jnp.uint32)
    nxt = jnp.roll(bits, -1, axis=1)
    return (bits & jnp.uint32(0xFFFF0000)) | (nxt >> 16)


def _unpack_taps(words):
    """u32 packed words -> (left tap, right tap) f32 blocks."""
    v0 = jax.lax.bitcast_convert_type(
        words & jnp.uint32(0xFFFF0000), jnp.float32
    )
    v1 = jax.lax.bitcast_convert_type(words << 16, jnp.float32)
    return v0, v1


def _gather_packed_segment(packed, idx, s, out_h, C):
    """Gather ONE 128-lane segment of pre-packed rows — no cross-segment
    merge.  Lanes whose idx falls outside [s, s+128) return clamped garbage;
    the caller masks them with its segment-hit predicate."""
    seg = jnp.repeat(packed[:, s : s + TILE_W], out_h, axis=0)
    v = jnp.take_along_axis(seg, jnp.clip(idx - s, 0, TILE_W - 1), axis=1)
    return _unpack_taps(v.reshape(C, out_h, TILE_W))


def _segskip_sweep(src_win_ref, coords_ref, H, W, out_h, extra_tiles, emit):
    """Segment-predicated sweep: ONE pl.when per 128-lane window segment
    (3 total), each guarding the whole packed row sweep restricted to that
    segment.  A typical SLAM tile's horizontal footprint lives in a single
    segment, so 2 of the 3 sweeps skip — 1/3 the gathers of the dense
    packed path, 1/6 of the dense f32 path.  This amortises predication far
    better than the per-row pl.when (24 predicates; measured net NEGATIVE
    on the relay, BASELINE.md) — 3 predicates each saving ~win_h gathers.
    Taps are bf16 like the packed path.  Calls
    `emit(in_seg, A0, A1, B0, B1, wx, wy)` once per EXECUTED segment with
    that segment's selected raw taps; emit must write refs (values cannot
    escape a pl.when body) and mask with in_seg."""
    C = src_win_ref.shape[1]
    win_h = out_h + 2 * extra_tiles * TILE_H
    xr, yr, wx, wy = _static_tile_coords(coords_ref, H, W, out_h, extra_tiles)
    idx = jnp.tile(xr, (C, 1))
    for s in range(0, SWIN_W, TILE_W):
        in_seg = (xr >= s) & (xr < s + TILE_W)

        @pl.when(jnp.any(in_seg))
        def _(s=s, in_seg=in_seg):
            b0, b1 = _gather_packed_segment(
                _pack_row_bf16(src_win_ref, 0), idx, s, out_h, C
            )
            A0 = A1 = B0 = B1 = jnp.zeros((C, out_h, TILE_W), jnp.float32)
            for w in range(win_h - 1):
                a0, a1 = b0, b1
                b0, b1 = _gather_packed_segment(
                    _pack_row_bf16(src_win_ref, w + 1), idx, s, out_h, C
                )
                hit = yr == w
                A0 = jnp.where(hit, a0, A0)
                A1 = jnp.where(hit, a1, A1)
                B0 = jnp.where(hit, b0, B0)
                B1 = jnp.where(hit, b1, B1)
            emit(in_seg, A0, A1, B0, B1, wx, wy)


def _groupskip_sweep(src_win_ref, coords_ref, H, W, out_h, extra_tiles, emit):
    """Vertical group-predicated sweep: ONE pl.when per TILE_H-row GROUP of
    window row pairs (win_h/8 predicates: 3 at extra_tiles=1, 5 at 2), each
    guarding a dense f32 raw-tap select sweep restricted to that group.

    Why vertical, and why f32: the 2026-08-18 relay measurements
    (BASELINE.md) showed the packed/seg-skip variants LOSE despite cutting
    gathers 2-6x — the per-row full-width pack arithmetic costs more than
    the gathers it saves.  This sweep adds NO per-row arithmetic: it simply
    skips entire sublane-tile row groups that no output pixel maps to
    (gathers + merge `where`s + tap selects all drop together).  An output
    block's vertical footprint is out_h rows + |flow_y|, so 1-2 of the 3
    groups execute for frame-to-frame SLAM flows; the extra window rows
    bought by `extra_tiles=2` (the ADVICE-r2 near-field margin) live in
    groups that are skipped unless the flow actually reaches them, making
    the taller exactness window nearly free.

    Within-group the pair-select walks rows with the same cross-pair gather
    reuse as the dense sweep (the per-ROW pl.when lost exactly this reuse
    and measured net negative).  Tap-identical vs the dense path (equal
    up to FMA contraction, observed <= 1 ulp): each lane's yr lives in
    exactly one group, and the executed group selects the same four taps
    and runs the same f32 formula.

    Calls `emit(group_hit, A0, A1, B0, B1, wx, wy)` once per EXECUTED
    group; emit must write refs (values cannot escape a pl.when body) and
    mask with group_hit."""
    C = src_win_ref.shape[1]
    win_h = out_h + 2 * extra_tiles * TILE_H
    xr, yr, wx, wy = _static_tile_coords(coords_ref, H, W, out_h, extra_tiles)
    xr1 = jnp.minimum(xr + 1, SWIN_W - 1)
    for g0 in range(0, win_h - 1, TILE_H):
        g1 = min(g0 + TILE_H, win_h - 1)
        group_hit = (yr >= g0) & (yr < g1)

        @pl.when(jnp.any(group_hit))
        def _(g0=g0, g1=g1, group_hit=group_hit):
            b0 = _row_gather_all_channels(src_win_ref, g0, xr, C)
            b1 = _row_gather_all_channels(src_win_ref, g0, xr1, C)
            A0 = A1 = B0 = B1 = jnp.zeros((C, out_h, TILE_W), jnp.float32)
            for w in range(g0, g1):
                a0, a1 = b0, b1
                b0 = _row_gather_all_channels(src_win_ref, w + 1, xr, C)
                b1 = _row_gather_all_channels(src_win_ref, w + 1, xr1, C)
                hit = yr == w
                A0 = jnp.where(hit, a0, A0)
                A1 = jnp.where(hit, a1, A1)
                B0 = jnp.where(hit, b0, B0)
                B1 = jnp.where(hit, b1, B1)
            emit(group_hit, A0, A1, B0, B1, wx, wy)


def _warp_kernel_static_groupskip(src_win_ref, coords_ref, out_ref, *, H, W,
                                  out_h, extra_tiles):
    C = src_win_ref.shape[1]
    out_ref[0] = jnp.zeros((C, out_h, TILE_W), jnp.float32)

    def emit(group_hit, a0, a1, b0, b1, wx, wy):
        top = a0 * (1 - wx) + a1 * wx
        bot = b0 * (1 - wx) + b1 * wx
        out_ref[0] = jnp.where(
            group_hit, top * (1 - wy) + bot * wy, out_ref[0]
        )

    _groupskip_sweep(src_win_ref, coords_ref, H, W, out_h, extra_tiles, emit)


def _grad_kernel_static_groupskip(src_win_ref, coords_ref, g_ref, dcoords_ref,
                                  *, H, W, out_h, extra_tiles):
    x = coords_ref[0, 0]
    y = coords_ref[0, 1]
    g = g_ref[0]
    dcoords_ref[0, 0] = jnp.zeros_like(x)
    dcoords_ref[0, 1] = jnp.zeros_like(y)

    def emit(group_hit, a0, a1, b0, b1, wx, wy):
        ddx = (g * ((a1 - a0) * (1 - wy) + (b1 - b0) * wy)).sum(axis=0)
        ddy = (g * ((b0 - a0) * (1 - wx) + (b1 - a1) * wx)).sum(axis=0)
        dcoords_ref[0, 0] = jnp.where(group_hit, ddx, dcoords_ref[0, 0])
        dcoords_ref[0, 1] = jnp.where(group_hit, ddy, dcoords_ref[0, 1])

    _groupskip_sweep(src_win_ref, coords_ref, H, W, out_h, extra_tiles, emit)

    def live(v, hi):
        inside = ((v > 0.0) & (v < hi)).astype(jnp.float32)
        tie = ((v == 0.0) | (v == hi)).astype(jnp.float32)
        return inside + 0.5 * tie

    dcoords_ref[0, 0] = dcoords_ref[0, 0] * live(x, W - 1)
    dcoords_ref[0, 1] = dcoords_ref[0, 1] * live(y, H - 1)


def _select_neighbors(src_win_ref, coords_ref, H, W, out_h, extra_tiles,
                      packed=False):
    """Dense sweep that SELECTS the four raw bilinear taps, deferring all
    interpolation arithmetic to the (single) caller.

    The per-pair emit of `_scan_window_rows` interpolates before selecting
    (~10 VPU block-ops per window row); selecting the raw taps needs only 4
    `where`s per row, and the bilinear/gradient math then runs ONCE on the
    selected values — identical results (the hit masks are exclusive across
    rows), ~40% fewer sweep ops.  Returns (A0, A1, B0, B1, wx, wy), each
    value block (C, out_h, TILE_W)."""
    C = src_win_ref.shape[1]
    win_h = out_h + 2 * extra_tiles * TILE_H
    xr, yr, wx, wy = _static_tile_coords(coords_ref, H, W, out_h, extra_tiles)

    if packed:
        def taps(w):
            return _row_gather_all_channels_packed(src_win_ref, w, xr, C)
    else:
        xr1 = jnp.minimum(xr + 1, SWIN_W - 1)

        def taps(w):
            return (_row_gather_all_channels(src_win_ref, w, xr, C),
                    _row_gather_all_channels(src_win_ref, w, xr1, C))

    b0, b1 = taps(0)
    A0 = A1 = B0 = B1 = jnp.zeros((C, out_h, TILE_W), jnp.float32)
    for w in range(win_h - 1):
        a0, a1 = b0, b1
        b0, b1 = taps(w + 1)
        hit = yr == w
        A0 = jnp.where(hit, a0, A0)
        A1 = jnp.where(hit, a1, A1)
        B0 = jnp.where(hit, b0, B0)
        B1 = jnp.where(hit, b1, B1)
    return A0, A1, B0, B1, wx, wy


def _warp_kernel_static_segskip(src_win_ref, coords_ref, out_ref, *, H, W,
                                out_h, extra_tiles):
    C = src_win_ref.shape[1]
    out_ref[0] = jnp.zeros((C, out_h, TILE_W), jnp.float32)

    def emit(in_seg, a0, a1, b0, b1, wx, wy):
        top = a0 * (1 - wx) + a1 * wx
        bot = b0 * (1 - wx) + b1 * wx
        out_ref[0] = jnp.where(in_seg, top * (1 - wy) + bot * wy, out_ref[0])

    _segskip_sweep(src_win_ref, coords_ref, H, W, out_h, extra_tiles, emit)


def _grad_kernel_static_segskip(src_win_ref, coords_ref, g_ref, dcoords_ref,
                                *, H, W, out_h, extra_tiles):
    x = coords_ref[0, 0]
    y = coords_ref[0, 1]
    g = g_ref[0]
    dcoords_ref[0, 0] = jnp.zeros_like(x)
    dcoords_ref[0, 1] = jnp.zeros_like(y)

    def emit(in_seg, a0, a1, b0, b1, wx, wy):
        ddx = (g * ((a1 - a0) * (1 - wy) + (b1 - b0) * wy)).sum(axis=0)
        ddy = (g * ((b0 - a0) * (1 - wx) + (b1 - a1) * wx)).sum(axis=0)
        dcoords_ref[0, 0] = jnp.where(in_seg, ddx, dcoords_ref[0, 0])
        dcoords_ref[0, 1] = jnp.where(in_seg, ddy, dcoords_ref[0, 1])

    _segskip_sweep(src_win_ref, coords_ref, H, W, out_h, extra_tiles, emit)

    def live(v, hi):
        inside = ((v > 0.0) & (v < hi)).astype(jnp.float32)
        tie = ((v == 0.0) | (v == hi)).astype(jnp.float32)
        return inside + 0.5 * tie

    dcoords_ref[0, 0] = dcoords_ref[0, 0] * live(x, W - 1)
    dcoords_ref[0, 1] = dcoords_ref[0, 1] * live(y, H - 1)


def _warp_kernel_static(src_win_ref, coords_ref, out_ref, *, H, W, out_h,
                        extra_tiles, sparse, packed=False):
    C = src_win_ref.shape[1]
    if sparse:
        out_ref[0] = jnp.zeros((C, out_h, TILE_W), jnp.float32)

        def emit(w, hit, a0, a1, b0, b1, wx, wy):
            top = a0 * (1 - wx) + a1 * wx
            bot = b0 * (1 - wx) + b1 * wx
            out_ref[0] = jnp.where(hit, top * (1 - wy) + bot * wy, out_ref[0])

        _scan_window_rows(src_win_ref, coords_ref, H, W, out_h, emit,
                          extra_tiles, sparse)
        return
    a0, a1, b0, b1, wx, wy = _select_neighbors(
        src_win_ref, coords_ref, H, W, out_h, extra_tiles, packed
    )
    top = a0 * (1 - wx) + a1 * wx
    bot = b0 * (1 - wx) + b1 * wx
    out_ref[0] = top * (1 - wy) + bot * wy


def _grad_kernel_static(src_win_ref, coords_ref, g_ref, dcoords_ref, *, H, W,
                        out_h, extra_tiles, sparse, packed=False):
    x = coords_ref[0, 0]
    y = coords_ref[0, 1]

    def live(v, hi):
        inside = ((v > 0.0) & (v < hi)).astype(jnp.float32)
        tie = ((v == 0.0) | (v == hi)).astype(jnp.float32)
        return inside + 0.5 * tie

    g = g_ref[0]  # (C, out_h, TILE_W)
    if sparse:
        dcoords_ref[0, 0] = jnp.zeros((out_h, TILE_W), jnp.float32)
        dcoords_ref[0, 1] = jnp.zeros((out_h, TILE_W), jnp.float32)

        def emit(w, hit, a0, a1, b0, b1, wx, wy):
            ddx = (g * ((a1 - a0) * (1 - wy) + (b1 - b0) * wy)).sum(axis=0)
            ddy = (g * ((b0 - a0) * (1 - wx) + (b1 - a1) * wx)).sum(axis=0)
            dcoords_ref[0, 0] = jnp.where(hit, ddx, dcoords_ref[0, 0])
            dcoords_ref[0, 1] = jnp.where(hit, ddy, dcoords_ref[0, 1])

        _scan_window_rows(src_win_ref, coords_ref, H, W, out_h, emit,
                          extra_tiles, sparse)
        dcoords_ref[0, 0] = dcoords_ref[0, 0] * live(x, W - 1)
        dcoords_ref[0, 1] = dcoords_ref[0, 1] * live(y, H - 1)
        return

    a0, a1, b0, b1, wx, wy = _select_neighbors(
        src_win_ref, coords_ref, H, W, out_h, extra_tiles, packed
    )
    ddx = (g * ((a1 - a0) * (1 - wy) + (b1 - b0) * wy)).sum(axis=0)
    ddy = (g * ((b0 - a0) * (1 - wx) + (b1 - a1) * wx)).sum(axis=0)
    dcoords_ref[0, 0] = ddx * live(x, W - 1)
    dcoords_ref[0, 1] = ddy * live(y, H - 1)


def _warp_kernel_static_fused(src_win_ref, coords_ref, out_ref, dx_ref,
                              dy_ref, *, H, W, out_h, extra_tiles,
                              group_skip):
    """Forward sweep that ALSO emits the per-channel coordinate
    differentials d(out)/dx and d(out)/dy.

    The backward kernels re-run the entire gather sweep to rebuild the four
    bilinear taps the forward already selected — and gathers are the warp's
    dominant cost on this attachment (BASELINE.md round 3).  Storing the two
    tap-differential images at forward time trades ~2x the output HBM
    traffic (cheap) for the whole backward sweep: the VJP collapses to an
    elementwise channel contraction `sum_c g_c * d_c` that XLA fuses into
    the surrounding gradient graph.  Same raw taps, same f32 formulas as
    the non-fused kernels."""
    C = src_win_ref.shape[1]
    # all sweep math is f32; a bf16 out_shape only changes the final store
    odt = out_ref.dtype
    if group_skip:
        zero = jnp.zeros((C, out_h, TILE_W), odt)
        out_ref[0] = zero
        dx_ref[0] = zero
        dy_ref[0] = zero

        def emit(group_hit, a0, a1, b0, b1, wx, wy):
            top = a0 * (1 - wx) + a1 * wx
            bot = b0 * (1 - wx) + b1 * wx
            out_ref[0] = jnp.where(
                group_hit, top * (1 - wy) + bot * wy, out_ref[0]
            ).astype(odt)
            dx_ref[0] = jnp.where(
                group_hit, (a1 - a0) * (1 - wy) + (b1 - b0) * wy, dx_ref[0]
            ).astype(odt)
            dy_ref[0] = jnp.where(
                group_hit, (b0 - a0) * (1 - wx) + (b1 - a1) * wx, dy_ref[0]
            ).astype(odt)

        _groupskip_sweep(src_win_ref, coords_ref, H, W, out_h, extra_tiles,
                         emit)
        return
    a0, a1, b0, b1, wx, wy = _select_neighbors(
        src_win_ref, coords_ref, H, W, out_h, extra_tiles
    )
    top = a0 * (1 - wx) + a1 * wx
    bot = b0 * (1 - wx) + b1 * wx
    out_ref[0] = (top * (1 - wy) + bot * wy).astype(odt)
    dx_ref[0] = ((a1 - a0) * (1 - wy) + (b1 - b0) * wy).astype(odt)
    dy_ref[0] = ((b0 - a0) * (1 - wx) + (b1 - a1) * wx).astype(odt)


def _static_specs(B, H, W, C, out_channels, out_h, extra_tiles=1):
    from jax.experimental.pallas import Element

    win_h = out_h + 2 * extra_tiles * TILE_H

    def win_index(b, i, j):
        ys, xs = _window_origin(i, j, H, W, out_h, extra_tiles)
        return (b, 0, ys, xs)

    return dict(
        grid=(B, H // out_h, W // TILE_W),
        in_specs=[
            # Mosaic requires all-or-none Element dims in a BlockSpec
            pl.BlockSpec(
                (Element(1), Element(C), Element(win_h), Element(SWIN_W)),
                win_index,
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 2, out_h, TILE_W), lambda b, i, j: (b, 0, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, out_channels, out_h, TILE_W), lambda b, i, j: (b, 0, i, j),
            memory_space=pltpu.VMEM,
        ),
    )


def _pallas_warp_static_impl(src, coords, interpret, extra_tiles, sparse,
                             packed=False, seg_skip=False, group_skip=False):
    B, H, W, C = src.shape
    assert H % TILE_H == 0 and W % TILE_W == 0, (H, W)
    out_h = _pick_out_h(H)
    assert H >= out_h + 2 * extra_tiles * TILE_H and W >= SWIN_W, (H, W)
    spec = _static_specs(B, H, W, C, C, out_h, extra_tiles)
    if seg_skip:
        kernel = partial(_warp_kernel_static_segskip, H=H, W=W, out_h=out_h,
                         extra_tiles=extra_tiles)
    elif group_skip:
        kernel = partial(_warp_kernel_static_groupskip, H=H, W=W, out_h=out_h,
                         extra_tiles=extra_tiles)
    else:
        kernel = partial(_warp_kernel_static, H=H, W=W, out_h=out_h,
                         extra_tiles=extra_tiles, sparse=sparse, packed=packed)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, C, H, W), jnp.float32),
        interpret=interpret,
        **spec,
    )(src.transpose(0, 3, 1, 2), coords.transpose(0, 3, 1, 2))
    return out.transpose(0, 2, 3, 1)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def pallas_warp_static(src: jax.Array, coords: jax.Array,
                       interpret: bool = False, extra_tiles: int = 1,
                       sparse: bool = False, packed: bool = False,
                       seg_skip: bool = False, group_skip: bool = False):
    """Bilinear warp via the STATIC-window Pallas kernel (no in-kernel
    dynamic addressing — compiles on toolchains whose Mosaic rejects dynamic
    `pl.ds`).  Exact for displacements within `extra_tiles` (8, 128) tiles of
    the output block (vertical margin ~8*extra_tiles px, horizontal 128 px);
    beyond that the source clamps to the block's window.  `sparse=True`
    skips window rows no output pixel maps to via pl.when (see
    _scan_window_rows).  `packed=True` halves the gather count by packing
    both horizontal taps as bf16 halves of one u32 lane (bf16 tap
    precision — see _row_gather_all_channels_packed).  `seg_skip=True`
    additionally predicates the sweep per 128-lane window segment (3
    pl.whens), skipping segments the tile's horizontal footprint misses —
    typically 2 of 3 (see _segskip_sweep); implies packed taps, overrides
    sparse.  `group_skip=True` instead predicates per TILE_H-row vertical
    group of the dense f32 sweep — tap-identical to the default path (equal
    up to FMA contraction), no added per-row arithmetic, skips whole row
    groups the block's vertical footprint misses (see _groupskip_sweep);
    overrides sparse/packed."""
    return _pallas_warp_static_impl(src, coords, interpret, extra_tiles,
                                    sparse, packed, seg_skip, group_skip)


def _static_fwd(src, coords, interpret, extra_tiles, sparse, packed,
                seg_skip, group_skip):
    return (
        _pallas_warp_static_impl(src, coords, interpret, extra_tiles, sparse,
                                 packed, seg_skip, group_skip),
        (src, coords),
    )


def _static_bwd(interpret, extra_tiles, sparse, packed, seg_skip, group_skip,
                residuals, g):
    src, coords = residuals
    B, H, W, C = src.shape
    out_h = _pick_out_h(H)
    spec = _static_specs(B, H, W, C, 2, out_h, extra_tiles)
    spec["in_specs"].append(
        pl.BlockSpec((1, C, out_h, TILE_W), lambda b, i, j: (b, 0, i, j),
                     memory_space=pltpu.VMEM)
    )
    if seg_skip:
        grad_kernel = partial(_grad_kernel_static_segskip, H=H, W=W,
                              out_h=out_h, extra_tiles=extra_tiles)
    elif group_skip:
        grad_kernel = partial(_grad_kernel_static_groupskip, H=H, W=W,
                              out_h=out_h, extra_tiles=extra_tiles)
    else:
        grad_kernel = partial(_grad_kernel_static, H=H, W=W, out_h=out_h,
                              extra_tiles=extra_tiles, sparse=sparse,
                              packed=packed)
    dcoords = pl.pallas_call(
        grad_kernel,
        out_shape=jax.ShapeDtypeStruct((B, 2, H, W), jnp.float32),
        interpret=interpret,
        **spec,
    )(
        src.transpose(0, 3, 1, 2),
        coords.transpose(0, 3, 1, 2),
        g.transpose(0, 3, 1, 2),
    )
    return jnp.zeros_like(src), dcoords.transpose(0, 2, 3, 1)


pallas_warp_static.defvjp(_static_fwd, _static_bwd)


# ---------------------------------------------------------------------------
# Full-height column-stripe variant ("tall"): the src window is the WHOLE
# image height x 384 cols, keyed only by (source image, column stripe) — so
# with the scale grid dimension innermost the window DMA is issued once per
# (image, stripe) instead of once per output tile.  At 192x640/batch 3 this
# cuts the kernel's HBM src traffic ~20x vs the windowed kernel (whose
# (40, 384) window per (8, 128) tile re-reads every byte ~15x), which the
# analytic roofline says is THE residual blocking ~100 fps native
# (utils/calibration.py).  Vertical exactness becomes UNLIMITED (any flow);
# horizontal stays the same 128 px margin.  The sweep walks all H rows in
# `group_rows`-row pl.when groups — only groups the block's vertical
# footprint hits execute, so runtime work matches the windowed group-skip
# sweep; the unrolled program is ~5x larger (compile-time cost only).
# Fused-gradient only (stores dx/dy like pallas_warp_static_fused).
#
# Also deduplicates the SOURCE IMAGES themselves: callers pass the 2*B
# distinct frames, not the 2*S*B scale-tiled stack — the S scales of one
# (direction, batch) pair ride consecutive grid steps against the same
# VMEM-resident window.
# ---------------------------------------------------------------------------


def _tall_specs(B2, S, B, H, W, C, out_h, n_out):
    from jax.experimental.pallas import Element

    def src_index(g0, j, i, s):
        xs = jnp.clip(j - 1, 0, W // TILE_W - 3) * TILE_W
        return (g0, 0, 0, xs)

    def bp_index(g0, j, i, s):
        fi = g0 // B
        b = g0 % B
        return ((fi * S + s) * B + b, 0, i, j)

    out_spec = pl.BlockSpec((1, C, out_h, TILE_W), bp_index,
                            memory_space=pltpu.VMEM)
    return dict(
        # s innermost, then i: every (i, s) step of one (image, stripe)
        # reuses the src window DMA (Mosaic skips re-issuing a DMA whose
        # block index is unchanged between consecutive grid steps)
        grid=(B2, W // TILE_W, H // out_h, S),
        in_specs=[
            pl.BlockSpec(
                (Element(1), Element(C), Element(H), Element(SWIN_W)),
                src_index,
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 2, out_h, TILE_W), bp_index,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec,) * n_out if n_out > 1 else out_spec,
    )


def _warp_kernel_tall(src_ref, coords_ref, out_ref, dx_ref, dy_ref, *, H, W,
                      out_h, group_rows):
    j = pl.program_id(1)
    xs = jnp.clip(j - 1, 0, W // TILE_W - 3) * TILE_W
    _tall_sweep_from_xy(src_ref, coords_ref[0, 0], coords_ref[0, 1], xs,
                        out_ref, dx_ref, dy_ref, H=H, W=W, out_h=out_h,
                        group_rows=group_rows)


def _tall_sweep_from_xy(src_ref, x, y, xs, out_ref, dx_ref, dy_ref, *, H, W,
                        out_h, group_rows):
    """Shared tall-kernel body: clip/floor the (out_h, TILE_W) coordinate
    blocks, then run the group-predicated full-height gather sweep, storing
    the warped block plus the two tap differentials."""
    C = src_ref.shape[1]
    x = jnp.clip(x, 0.0, W - 1)
    y = jnp.clip(y, 0.0, H - 1)
    x0 = jnp.minimum(jnp.floor(x), W - 2)
    y0 = jnp.minimum(jnp.floor(y), H - 2)
    wx = x - x0
    wy = y - y0
    xr = jnp.clip(x0.astype(jnp.int32) - xs, 0, SWIN_W - 2)
    yr = y0.astype(jnp.int32)  # full-height window: window row == source row
    xr1 = jnp.minimum(xr + 1, SWIN_W - 1)
    odt = out_ref.dtype
    zero = jnp.zeros((C, out_h, TILE_W), odt)
    out_ref[0] = zero
    dx_ref[0] = zero
    dy_ref[0] = zero
    for g0 in range(0, H - 1, group_rows):
        g1 = min(g0 + group_rows, H - 1)
        group_hit = (yr >= g0) & (yr < g1)

        @pl.when(jnp.any(group_hit))
        def _(g0=g0, g1=g1, group_hit=group_hit):
            b0 = _row_gather_all_channels(src_ref, g0, xr, C)
            b1 = _row_gather_all_channels(src_ref, g0, xr1, C)
            A0 = A1 = B0 = B1 = jnp.zeros((C, out_h, TILE_W), jnp.float32)
            for w in range(g0, g1):
                a0, a1 = b0, b1
                b0 = _row_gather_all_channels(src_ref, w + 1, xr, C)
                b1 = _row_gather_all_channels(src_ref, w + 1, xr1, C)
                hit = yr == w
                A0 = jnp.where(hit, a0, A0)
                A1 = jnp.where(hit, a1, A1)
                B0 = jnp.where(hit, b0, B0)
                B1 = jnp.where(hit, b1, B1)
            top = A0 * (1 - wx) + A1 * wx
            bot = B0 * (1 - wx) + B1 * wx
            out_ref[0] = jnp.where(
                group_hit, top * (1 - wy) + bot * wy, out_ref[0]
            ).astype(odt)
            dx_ref[0] = jnp.where(
                group_hit, (A1 - A0) * (1 - wy) + (B1 - B0) * wy, dx_ref[0]
            ).astype(odt)
            dy_ref[0] = jnp.where(
                group_hit, (B0 - A0) * (1 - wx) + (B1 - A1) * wx, dy_ref[0]
            ).astype(odt)


def _pallas_warp_tall_impl(src, coords, interpret, S, bf16_out, group_rows):
    B2, H, W, C = src.shape
    N = coords.shape[0]
    assert N == S * B2, (N, S, B2)
    B = B2 // 2
    assert H % TILE_H == 0 and W % TILE_W == 0 and W >= SWIN_W, (H, W)
    out_h = _pick_out_h(H)
    spec = _tall_specs(B2, S, B, H, W, C, out_h, 3)
    dtype = jnp.bfloat16 if bf16_out else jnp.float32
    shape = jax.ShapeDtypeStruct((N, C, H, W), dtype)
    kernel = partial(_warp_kernel_tall, H=H, W=W, out_h=out_h,
                     group_rows=group_rows)
    out, dx, dy = pl.pallas_call(
        kernel,
        out_shape=(shape, shape, shape),
        interpret=interpret,
        **spec,
    )(src.transpose(0, 3, 1, 2), coords.transpose(0, 3, 1, 2))
    return (out.transpose(0, 2, 3, 1), dx.transpose(0, 2, 3, 1),
            dy.transpose(0, 2, 3, 1))


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def pallas_warp_tall(src: jax.Array, coords: jax.Array,
                     interpret: bool = False, S: int = 4,
                     bf16_out: bool = False, group_rows: int = 2 * TILE_H):
    """Full-height column-stripe warp with deduplicated sources.

    src: (2*B, H, W, C) — the DISTINCT source frames [frame -1 of each
    batch row; frame +1 of each batch row], NOT scale-tiled.  coords:
    (2*S*B, H, W, 2) in the train/steps.py warp-stack order
    [direction-major, scale, batch-minor].  Returns the (2*S*B, H, W, C)
    warped stack of that order.  Exact for ANY vertical displacement and
    horizontal displacements within 128 px of the output tile (the
    windowed kernels clamp vertically at ~8*extra_tiles px).  Gradient is
    fused (tap differentials stored at forward time, elementwise VJP).
    `bf16_out` stores the three outputs as bfloat16 (math stays f32)."""
    out, _, _ = _pallas_warp_tall_impl(src, coords, interpret, S, bf16_out,
                                       group_rows)
    return out


def _tall_fwd(src, coords, interpret, S, bf16_out, group_rows):
    out, dx, dy = _pallas_warp_tall_impl(src, coords, interpret, S, bf16_out,
                                         group_rows)
    return out, (src, coords, dx, dy)


def _tall_bwd(interpret, S, bf16_out, group_rows, residuals, g):
    src, coords, dx, dy = residuals
    H, W = src.shape[1], src.shape[2]

    def live(v, hi):
        inside = ((v > 0.0) & (v < hi)).astype(jnp.float32)
        tie = ((v == 0.0) | (v == hi)).astype(jnp.float32)
        return inside + 0.5 * tie

    gf = g.astype(jnp.float32)
    ddx = (gf * dx).sum(axis=-1) * live(coords[..., 0], W - 1)
    ddy = (gf * dy).sum(axis=-1) * live(coords[..., 1], H - 1)
    return jnp.zeros_like(src), jnp.stack([ddx, ddy], axis=-1)


pallas_warp_tall.defvjp(_tall_fwd, _tall_bwd)


# ---------------------------------------------------------------------------
# In-kernel projection variant ("proj"): the tall kernel computes the warp
# coordinates ITSELF from the per-pixel depth and a per-(direction, batch)
# affine camera map, instead of being fed a precomputed (2*S*B, H, W, 2)
# coordinate field.  Algebra: with P = (K @ T)[:3, :] and r = inv_K33 @
# [u, v, 1], the XLA chain backproject_depth -> project_3d computes
# cam = P @ [d*r; 1] = d * (P33 @ inv_K33) @ [u, v, 1] + P[:, 3] — an
# affine map A (3x3) + b (3) of the homogeneous pixel, scaled by depth.
# A/b are 12 floats per (direction, batch row) delivered through SMEM;
# u, v are iota; d is a (1, 1, out_h, TILE_W) depth block.  What this
# removes from HBM per iteration (192x640, batch 3, S=4): the points
# stack write+reads (~53 MB), the coords write + kernel read (~47 MB),
# and the backward's dcoords/points round trip — the projection VJP
# re-reads only the (S*B, H, W) depth (5.9 MB) and writes d(depth)
# (utils/calibration.py::analytic_bytes).  The VJP chain to depth and to
# A/b runs in XLA (elementwise recompute of the same `_proj_xy` formula,
# fused into the tap-differential contraction); gradients then flow to
# the pose decoder through the (tiny) A/b construction.
# Reference behaviour covered: BackprojectDepth + Project3D
# (/root/reference/depth_pose_prediction/networks/layers.py:51-104),
# redesigned as a fused in-kernel map.
# ---------------------------------------------------------------------------
_PROJ_EPS = 1e-3  # z clamp — must match geometry.camera.project_3d


def _proj_xy(d, u, v, a, b3):
    """Shared projection formula: pixel coords from depth + affine map.

    a: 9 scalars (A row-major), b3: 3 scalars; d/u/v broadcastable arrays.
    Used VERBATIM by both the Pallas kernel and the XLA recompute in the
    VJP so the two paths agree to FMA contraction."""
    rx = a[0] * u + a[1] * v + a[2]
    ry = a[3] * u + a[4] * v + a[5]
    rz = a[6] * u + a[7] * v + a[8]
    cx = d * rx + b3[0]
    cy = d * ry + b3[1]
    cz = d * rz + b3[2]
    z = jnp.maximum(cz, _PROJ_EPS)
    return cx / z, cy / z


def _smem_row_select(ab_ref, g0, B2, k):
    """Scalar ab_ref[g0, k] via statically-unrolled loads + a g0 select.

    The relay's Mosaic stack rejects BOTH partial SMEM blocks (a (1, 12)
    block over the (B2, 12) array — "block shape (1, 12), array shape
    (6, 12) … in memory space smem") AND, defensively, any dynamic
    addressing — so the whole array rides one full-shape SMEM block and
    the per-grid-step row is picked by B2 static loads + scalar selects
    (scalar-core work, free next to the window DMA)."""
    val = ab_ref[0, k]
    for r in range(1, B2):
        val = jnp.where(g0 == r, ab_ref[r, k], val)
    return val


def _warp_kernel_tall_proj(ab_ref, src_ref, depth_ref, out_ref, dx_ref,
                           dy_ref, *, H, W, out_h, group_rows, B2):
    g0 = pl.program_id(0)
    j = pl.program_id(1)
    i = pl.program_id(2)
    xs = jnp.clip(j - 1, 0, W // TILE_W - 3) * TILE_W
    # int32 iota + cast: Mosaic's tpu.iota only produces integer vectors
    # (a float broadcasted_iota fails verification on the relay toolchain)
    u = (jax.lax.broadcasted_iota(jnp.int32, (out_h, TILE_W), 1)
         .astype(jnp.float32) + (j * TILE_W).astype(jnp.float32))
    v = (jax.lax.broadcasted_iota(jnp.int32, (out_h, TILE_W), 0)
         .astype(jnp.float32) + (i * out_h).astype(jnp.float32))
    d = depth_ref[0, 0]
    a = [_smem_row_select(ab_ref, g0, B2, k) for k in range(9)]
    b3 = [_smem_row_select(ab_ref, g0, B2, 9 + k) for k in range(3)]
    x, y = _proj_xy(d, u, v, a, b3)
    _tall_sweep_from_xy(src_ref, x, y, xs, out_ref, dx_ref, dy_ref, H=H,
                        W=W, out_h=out_h, group_rows=group_rows)


def _tall_proj_specs(B2, S, B, H, W, C, out_h, n_out):
    from jax.experimental.pallas import Element

    def src_index(g0, j, i, s):
        xs = jnp.clip(j - 1, 0, W // TILE_W - 3) * TILE_W
        return (g0, 0, 0, xs)

    def bp_index(g0, j, i, s):
        fi = g0 // B
        b = g0 % B
        return ((fi * S + s) * B + b, 0, i, j)

    def depth_index(g0, j, i, s):
        return (s * B + g0 % B, 0, i, j)

    out_spec = pl.BlockSpec((1, C, out_h, TILE_W), bp_index,
                            memory_space=pltpu.VMEM)
    return dict(
        grid=(B2, W // TILE_W, H // out_h, S),
        in_specs=[
            # per-(direction, batch) affine maps — 12 scalars per g0 row.
            # One FULL-SHAPE SMEM block (Mosaic rejects partial SMEM
            # blocks); the kernel selects its g0 row with static loads
            # (_smem_row_select).
            pl.BlockSpec((B2, 12), lambda g0, j, i, s: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (Element(1), Element(C), Element(H), Element(SWIN_W)),
                src_index,
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 1, out_h, TILE_W), depth_index,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec,) * n_out,
    )


def _pallas_warp_tall_proj_impl(src, depth, ab, interpret, S, bf16_out,
                                group_rows):
    B2, H, W, C = src.shape
    B = B2 // 2
    assert depth.shape[0] == S * B, (depth.shape, S, B)
    assert ab.shape == (B2, 12), ab.shape
    N = 2 * S * B
    assert H % TILE_H == 0 and W % TILE_W == 0 and W >= SWIN_W, (H, W)
    out_h = _pick_out_h(H)
    spec = _tall_proj_specs(B2, S, B, H, W, C, out_h, 3)
    dtype = jnp.bfloat16 if bf16_out else jnp.float32
    shape = jax.ShapeDtypeStruct((N, C, H, W), dtype)
    kernel = partial(_warp_kernel_tall_proj, H=H, W=W, out_h=out_h,
                     group_rows=group_rows, B2=B2)
    out, dx, dy = pl.pallas_call(
        kernel,
        out_shape=(shape, shape, shape),
        interpret=interpret,
        **spec,
    )(ab, src.transpose(0, 3, 1, 2), depth.transpose(0, 3, 1, 2))
    return (out.transpose(0, 2, 3, 1), dx.transpose(0, 2, 3, 1),
            dy.transpose(0, 2, 3, 1))


def proj_coords_xla(depth: jax.Array, ab: jax.Array, S: int) -> jax.Array:
    """XLA recompute of the in-kernel projection — same `_proj_xy` formula.

    depth: (S*B, H, W, 1); ab: (2*B, 12).  Returns (2*S*B, H, W, 2) pixel
    coords in the warp-stack order.  Differentiable (the proj VJPs chain
    through `jax.vjp` of this); also the reference path for tests."""
    SB, H, W = depth.shape[0], depth.shape[1], depth.shape[2]
    B = ab.shape[0] // 2
    d = jnp.tile(depth[..., 0], (2, 1, 1))  # (2SB, H, W)
    n = jnp.arange(2 * SB)
    abn = ab[(n // (S * B)) * B + n % B]  # (2SB, 12)
    a = [abn[:, k, None, None] for k in range(9)]
    b3 = [abn[:, 9 + k, None, None] for k in range(3)]
    u = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    v = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    x, y = _proj_xy(d, u, v, a, b3)
    return jnp.stack([x, y], axis=-1)


def _live_grad(v, hi):
    inside = ((v > 0.0) & (v < hi)).astype(jnp.float32)
    tie = ((v == 0.0) | (v == hi)).astype(jnp.float32)
    return inside + 0.5 * tie


def proj_vjp_chain(depth, ab, dcx, dcy, S, H, W):
    """Chain raw coordinate cotangents back to (d(depth), d(ab)).

    dcx/dcy: (2*S*B, H, W) contractions of the upstream gradient with the
    stored tap differentials (NOT yet boundary-masked — the sampler's
    `live` convention is applied here on the recomputed raw coords).
    Everything is elementwise recompute + two small reductions; XLA fuses
    it into the contraction, so HBM sees only the depth re-read and the
    d(depth) write."""
    def coords_fn(depth_, ab_):
        c = proj_coords_xla(depth_, ab_, S)
        return c[..., 0], c[..., 1]

    (x, y), vjp = jax.vjp(coords_fn, depth, ab)
    ddx = dcx * _live_grad(x, W - 1)
    ddy = dcy * _live_grad(y, H - 1)
    return vjp((ddx, ddy))


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def pallas_warp_tall_proj(src: jax.Array, depth: jax.Array, ab: jax.Array,
                          interpret: bool = False, S: int = 4,
                          bf16_out: bool = False,
                          group_rows: int = 2 * TILE_H):
    """Tall warp with IN-KERNEL projection: coordinates are computed inside
    the kernel from depth + a per-(direction, batch) affine camera map, so
    the (2*S*B, H, W, 2) coordinate field (and the points stack feeding it)
    never exists in HBM.

    src: (2*B, H, W, C) deduplicated source frames; depth: (S*B, H, W, 1)
    full-resolution depth per (scale, batch row) — the scale-major stack of
    train/steps.py; ab: (2*B, 12) affine maps from
    `geometry.camera.projection_affine` ([direction -1 rows; direction +1
    rows]).  Returns the (2*S*B, H, W, C) warped stack.  Values match
    `pallas_warp_tall(src, proj_coords_xla(depth, ab, S))` to FMA
    contraction; gradients flow to `depth` and `ab`."""
    out, _, _ = _pallas_warp_tall_proj_impl(src, depth, ab, interpret, S,
                                            bf16_out, group_rows)
    return out


def _tall_proj_fwd(src, depth, ab, interpret, S, bf16_out, group_rows):
    out, dx, dy = _pallas_warp_tall_proj_impl(src, depth, ab, interpret, S,
                                              bf16_out, group_rows)
    return out, (src, depth, ab, dx, dy)


def _tall_proj_bwd(interpret, S, bf16_out, group_rows, residuals, g):
    src, depth, ab, dx, dy = residuals
    H, W = src.shape[1], src.shape[2]
    gf = g.astype(jnp.float32)
    dcx = (gf * dx.astype(jnp.float32)).sum(axis=-1)
    dcy = (gf * dy.astype(jnp.float32)).sum(axis=-1)
    ddepth, dab = proj_vjp_chain(depth, ab, dcx, dcy, S, H, W)
    return jnp.zeros_like(src), ddepth, dab


pallas_warp_tall_proj.defvjp(_tall_proj_fwd, _tall_proj_bwd)


def _pallas_warp_static_fused_impl(src, coords, interpret, extra_tiles,
                                   group_skip, bf16_out=False):
    B, H, W, C = src.shape
    assert H % TILE_H == 0 and W % TILE_W == 0, (H, W)
    out_h = _pick_out_h(H)
    assert H >= out_h + 2 * extra_tiles * TILE_H and W >= SWIN_W, (H, W)
    spec = _static_specs(B, H, W, C, C, out_h, extra_tiles)
    out_spec = spec.pop("out_specs")
    kernel = partial(_warp_kernel_static_fused, H=H, W=W, out_h=out_h,
                     extra_tiles=extra_tiles, group_skip=group_skip)
    dtype = jnp.bfloat16 if bf16_out else jnp.float32
    shape = jax.ShapeDtypeStruct((B, C, H, W), dtype)
    out, dx, dy = pl.pallas_call(
        kernel,
        out_shape=(shape, shape, shape),
        out_specs=(out_spec, out_spec, out_spec),
        interpret=interpret,
        **spec,
    )(src.transpose(0, 3, 1, 2), coords.transpose(0, 3, 1, 2))
    return (out.transpose(0, 2, 3, 1), dx.transpose(0, 2, 3, 1),
            dy.transpose(0, 2, 3, 1))


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def pallas_warp_static_fused(src: jax.Array, coords: jax.Array,
                             interpret: bool = False, extra_tiles: int = 1,
                             group_skip: bool = True, bf16_out: bool = False):
    """Static-window warp with a FUSED gradient: under `jax.grad` the
    forward kernel additionally stores the per-channel tap differentials
    d(out)/dx, d(out)/dy, so the VJP is a plain elementwise contraction
    (no backward Pallas kernel, no second gather sweep — see
    `_warp_kernel_static_fused`).  Outside autodiff it runs the ordinary
    single-output kernel.  Value- and gradient-identical to
    `pallas_warp_static(..., group_skip=group_skip)` up to FMA contraction;
    same exactness window.  f32-tap paths only (dense raw-tap select or
    group_skip); use `pallas_warp_static` for packed/seg_skip/sparse.

    `bf16_out=True` STORES the warped image and the two tap differentials
    as bfloat16 (all in-kernel math stays f32): halves the kernel's HBM
    write traffic and every downstream read of them — the warped stack is
    pure loss input, and the loss math upcasts.  Value error is bf16
    rounding of [0, 1] image data (<= ~4e-3 relative); opt-in pending a
    quality A/B on the target silicon."""
    out = _pallas_warp_static_impl(src, coords, interpret, extra_tiles,
                                   False, False, False, group_skip)
    return out.astype(jnp.bfloat16) if bf16_out else out


def _fused_fwd(src, coords, interpret, extra_tiles, group_skip, bf16_out):
    out, dx, dy = _pallas_warp_static_fused_impl(
        src, coords, interpret, extra_tiles, group_skip, bf16_out
    )
    return out, (src, coords, dx, dy)


def _fused_bwd(interpret, extra_tiles, group_skip, bf16_out, residuals, g):
    src, coords, dx, dy = residuals
    H, W = src.shape[1], src.shape[2]

    # same clip subgradient convention as the kernel backward paths
    def live(v, hi):
        inside = ((v > 0.0) & (v < hi)).astype(jnp.float32)
        tie = ((v == 0.0) | (v == hi)).astype(jnp.float32)
        return inside + 0.5 * tie

    gf = g.astype(jnp.float32)
    ddx = (gf * dx).sum(axis=-1) * live(coords[..., 0], W - 1)
    ddy = (gf * dy).sum(axis=-1) * live(coords[..., 1], H - 1)
    return jnp.zeros_like(src), jnp.stack([ddx, ddy], axis=-1)


pallas_warp_static_fused.defvjp(_fused_fwd, _fused_bwd)

"""Pallas warp kernel vs the XLA sampler (interpret mode on CPU).

Smooth warps (the SLAM case) must match exactly; gradients w.r.t. coords must
match the autodiff of the XLA sampler.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuslam.geometry.camera import bilinear_sampler
from tpuslam.ops.pallas_warp import TILE_W, WINDOW_H, pallas_warp

B, H, W, C = 2, 16, 256, 3


def _smooth_coords(rng, max_shift=3.0):
    """Smooth displacement field well inside the window budget."""
    gx, gy = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32), indexing="xy")
    dx = max_shift * np.sin(gy / H * 3.0)[None] * np.ones((B, 1, 1), np.float32)
    dy = max_shift * np.cos(gx / W * 2.0)[None] * np.ones((B, 1, 1), np.float32)
    coords = np.stack([gx[None] + dx, gy[None] + dy], axis=-1).astype(np.float32)
    return jnp.asarray(coords)


@pytest.fixture
def data(rng):
    src = jnp.asarray(rng.uniform(size=(B, H, W, C)).astype(np.float32))
    return src, _smooth_coords(rng)


def test_pallas_warp_matches_xla_sampler(data):
    src, coords = data
    ours = np.asarray(pallas_warp(src, coords, True))
    ref = np.asarray(bilinear_sampler(src, coords))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_pallas_warp_border_coords(data, rng):
    """Coordinates clamped at the image border still match (same border rule)
    as long as they stay within the tile's window footprint."""
    src, coords = data
    coords = coords.at[:, :, :4, 0].set(-2.0)  # off the left edge
    ours = np.asarray(pallas_warp(src, coords, True))
    ref = np.asarray(bilinear_sampler(src, coords))
    # left-edge columns: window xmin is 0 there, so exact match
    np.testing.assert_allclose(ours[:, :, :TILE_W], ref[:, :, :TILE_W], atol=1e-5)


def test_pallas_warp_gradients_match(data):
    src, coords = data

    def loss_pallas(c):
        return (pallas_warp(src, c, True) ** 2).sum()

    def loss_xla(c):
        return (bilinear_sampler(src, c) ** 2).sum()

    g_pallas = np.asarray(jax.grad(loss_pallas)(coords))
    g_xla = np.asarray(jax.grad(loss_xla)(coords))
    np.testing.assert_allclose(g_pallas, g_xla, atol=1e-3, rtol=1e-3)


def test_pallas_warp_identity(data, rng):
    src, _ = data
    gx, gy = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32), indexing="xy")
    coords = jnp.asarray(
        np.broadcast_to(np.stack([gx, gy], -1), (B, H, W, 2)).astype(np.float32)
    )
    out = np.asarray(pallas_warp(src, coords, True))
    np.testing.assert_allclose(out, np.asarray(src), atol=1e-6)


# ---------------------------------------------------------------------------
# Static-window variant (compiles on Mosaic stacks without dynamic
# addressing; interpret-mode here, compiled-mode validated on the dev TPU
# attachment — BASELINE.md round 2)
# ---------------------------------------------------------------------------
HS, WS = 48, 384  # static window needs >= 24 x 384


def _static_data(rng, max_shift=3.0):
    src = jnp.asarray(rng.uniform(size=(B, HS, WS, C)).astype(np.float32))
    gx, gy = np.meshgrid(np.arange(WS, dtype=np.float32),
                         np.arange(HS, dtype=np.float32), indexing="xy")
    dx = max_shift * np.sin(gy / HS * 3.0)[None] * np.ones((B, 1, 1), np.float32)
    dy = max_shift * np.cos(gx / WS * 2.0)[None] * np.ones((B, 1, 1), np.float32)
    coords = np.stack([gx[None] + dx, gy[None] + dy], axis=-1).astype(np.float32)
    return src, jnp.asarray(coords)


def test_pallas_warp_static_matches_xla_sampler(rng):
    from tpuslam.ops.pallas_warp import pallas_warp_static

    src, coords = _static_data(rng)
    ours = np.asarray(pallas_warp_static(src, coords, True))
    ref = np.asarray(bilinear_sampler(src, coords))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_pallas_warp_static_gradients_match(rng):
    from tpuslam.ops.pallas_warp import pallas_warp_static

    src, coords = _static_data(rng)

    def loss_pallas(c):
        return (pallas_warp_static(src, c, True) ** 2).sum()

    def loss_xla(c):
        return (bilinear_sampler(src, c) ** 2).sum()

    g_pallas = np.asarray(jax.grad(loss_pallas)(coords))
    g_xla = np.asarray(jax.grad(loss_xla)(coords))
    np.testing.assert_allclose(g_pallas, g_xla, atol=1e-3, rtol=1e-3)


def test_pallas_warp_static_out_of_window_clamps(rng):
    """Displacements beyond one tile clamp to the window edge (documented
    degradation), and stay finite."""
    from tpuslam.ops.pallas_warp import pallas_warp_static

    src, coords = _static_data(rng)
    coords = coords.at[..., 1].add(30.0)  # vertical shift way past the margin
    out = np.asarray(pallas_warp_static(src, coords, True))
    assert np.isfinite(out).all()


def test_warp_and_loss_pallas_path_matches_xla(rng):
    """The fused loss with use_pallas_warp=True must match the XLA path for
    in-domain warps (shapes compatible: 48 x 384)."""
    from tpuslam.train import LossConfig, make_frame_batch
    from tpuslam.train.steps import warp_and_loss

    rgb = rng.uniform(size=(1, 3, HS, WS, 3)).astype(np.float32)
    K = np.array([[0.58 * WS, 0, 0.5 * WS, 0], [0, 1.92 * HS, 0.5 * HS, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
    batch = make_frame_batch(rgb, K, rng.uniform(0.5, 1.0, (1, 2)).astype(np.float32),
                             quantize=False)
    disps = {("disp", s): jnp.asarray(
        rng.uniform(0.3, 0.6, (1, HS // 2**s, WS // 2**s, 1)).astype(np.float32))
        for s in (0, 1)}
    aa = jnp.asarray(rng.normal(scale=1e-3, size=(2, 3)).astype(np.float32))
    tr = jnp.asarray(rng.normal(scale=1e-2, size=(2, 3)).astype(np.float32))
    losses_p, _ = warp_and_loss(
        disps, aa, tr, batch, LossConfig(scales=(0, 1), use_pallas_warp=True))
    losses_x, _ = warp_and_loss(
        disps, aa, tr, batch, LossConfig(scales=(0, 1), use_pallas_warp=False))
    np.testing.assert_allclose(
        float(losses_p["loss"]), float(losses_x["loss"]), atol=1e-5)


@pytest.mark.parametrize("extra_tiles,sparse", [(1, True), (2, True), (2, False)])
def test_pallas_warp_static_variants_match_xla(rng, extra_tiles, sparse):
    """Sparse row-skip (pl.when) and taller-window variants are bit-compatible
    with the XLA sampler inside their displacement domain, fwd and bwd."""
    from tpuslam.ops.pallas_warp import pallas_warp_static

    src, coords = _static_data(rng)
    ours = np.asarray(pallas_warp_static(src, coords, True, extra_tiles, sparse))
    ref = np.asarray(bilinear_sampler(src, coords))
    np.testing.assert_allclose(ours, ref, atol=1e-5)

    def loss_pallas(c):
        return (pallas_warp_static(src, c, True, extra_tiles, sparse) ** 2).sum()

    def loss_xla(c):
        return (bilinear_sampler(src, c) ** 2).sum()

    g_pallas = np.asarray(jax.grad(loss_pallas)(coords))
    g_xla = np.asarray(jax.grad(loss_xla)(coords))
    np.testing.assert_allclose(g_pallas, g_xla, atol=1e-3, rtol=1e-3)


def test_pallas_warp_static_taller_window_extends_domain(rng):
    """A 12px vertical flow clamps at extra_tiles=1 (margin ~8px) but is
    exact at extra_tiles=2 (margin ~16-24px) — the ADVICE r2 fix."""
    from tpuslam.ops.pallas_warp import pallas_warp_static

    src, coords = _static_data(rng, max_shift=0.5)
    coords = coords.at[..., 1].add(12.0)
    ref = np.asarray(bilinear_sampler(src, coords))
    narrow = np.asarray(pallas_warp_static(src, coords, True, 1, True))
    tall = np.asarray(pallas_warp_static(src, coords, True, 2, True))
    assert np.abs(narrow - ref).max() > 1e-3  # clamped somewhere
    np.testing.assert_allclose(tall, ref, atol=1e-5)


def test_pallas_warp_static_packed_exact_on_bf16_sources(rng):
    """Packed dual-tap mode is BIT-EXACT when the source values are
    bf16-representable (the packing truncates to bf16): quantize to 7
    mantissa bits and compare against the dense f32 path."""
    from tpuslam.ops.pallas_warp import pallas_warp_static

    src, coords = _static_data(rng)
    src = jnp.round(src * 128.0) / 128.0  # bf16-exact values in [0, 1]
    dense = np.asarray(pallas_warp_static(src, coords, True))
    packed = np.asarray(pallas_warp_static(src, coords, True, packed=True))
    # identical tap values; a few-ulp tolerance keeps the test robust to
    # FMA-contraction differences between the two kernels' HLO graphs
    np.testing.assert_allclose(packed, dense, atol=3e-7)


def test_pallas_warp_static_packed_close_on_general_sources(rng):
    """On arbitrary f32 sources the packed taps truncate to bf16: the warp
    must stay within the bf16 quantisation bound (2^-8 absolute on [0,1]
    values) of the dense path, forward and backward."""
    from tpuslam.ops.pallas_warp import pallas_warp_static

    src, coords = _static_data(rng)
    dense = np.asarray(pallas_warp_static(src, coords, True))
    packed = np.asarray(pallas_warp_static(src, coords, True, packed=True))
    np.testing.assert_allclose(packed, dense, atol=2 ** -8)

    def loss(c, p):
        return (pallas_warp_static(src, c, True, 1, False, p) ** 2).sum()

    g_dense = np.asarray(jax.grad(loss)(coords, False))
    g_packed = np.asarray(jax.grad(loss)(coords, True))
    # grads involve tap DIFFERENCES of adjacent pixels — absolute error
    # stays at the quantisation scale times the incoming cotangent
    np.testing.assert_allclose(g_packed, g_dense, atol=0.05, rtol=0.05)


def test_pallas_warp_static_segskip_exact_on_bf16_sources(rng):
    """seg_skip (packed taps + per-segment pl.when sweep) matches the dense
    f32 path to FLOAT ROUNDING when sources are bf16-representable: the tap
    values are identical, but the two kernels' HLO graphs may contract
    different FMAs, so isolated 1-ulp differences are legitimate (verified:
    on the differing pixels the straight bilinear formula agrees with the
    seg_skip value)."""
    from tpuslam.ops.pallas_warp import pallas_warp_static

    src, coords = _static_data(rng)
    src = jnp.round(src * 128.0) / 128.0
    dense = np.asarray(pallas_warp_static(src, coords, True))
    seg = np.asarray(pallas_warp_static(src, coords, True, seg_skip=True))
    np.testing.assert_allclose(seg, dense, atol=3e-7)


def test_pallas_warp_static_segskip_close_fwd_bwd(rng):
    """General f32 sources: seg_skip stays within the bf16 tap quantisation
    bound of the dense path, forward and backward."""
    from tpuslam.ops.pallas_warp import pallas_warp_static

    src, coords = _static_data(rng)
    dense = np.asarray(pallas_warp_static(src, coords, True))
    seg = np.asarray(pallas_warp_static(src, coords, True, seg_skip=True))
    np.testing.assert_allclose(seg, dense, atol=2 ** -8)

    def loss(c, sk):
        return (pallas_warp_static(src, c, True, 1, False, False, sk) ** 2).sum()

    g_dense = np.asarray(jax.grad(loss)(coords, False))
    g_seg = np.asarray(jax.grad(loss)(coords, True))
    np.testing.assert_allclose(g_seg, g_dense, atol=0.05, rtol=0.05)


def test_pallas_warp_static_groupskip_tap_identical_fwd_bwd(rng):
    """group_skip (vertical per-group pl.when over the dense f32 sweep)
    selects the same taps and runs the same f32 formula as the dense path,
    forward and backward: each lane's window row lives in exactly one group.
    Equal up to FMA contraction (the pl.when regions change XLA's fusion
    choices; observed max 1 ulp), like the segskip comparison."""
    from tpuslam.ops.pallas_warp import pallas_warp_static

    src, coords = _static_data(rng)
    dense = np.asarray(pallas_warp_static(src, coords, True))
    grp = np.asarray(pallas_warp_static(src, coords, True, group_skip=True))
    np.testing.assert_allclose(grp, dense, atol=3e-7)

    def loss(c, gs):
        return (pallas_warp_static(src, c, True, 1, False, False, False,
                                   gs) ** 2).sum()

    g_dense = np.asarray(jax.grad(loss)(coords, False))
    g_grp = np.asarray(jax.grad(loss)(coords, True))
    np.testing.assert_allclose(g_grp, g_dense, atol=1e-5, rtol=1e-6)


@pytest.mark.parametrize("extra_tiles", [1, 2])
def test_pallas_warp_static_groupskip_cross_group_footprints(rng, extra_tiles):
    """Vertical flows that cross group boundaries (per-lane mixed-sign,
    up to +-12 px) must still match: every hit group executes and the
    per-group masks partition the output rows.  At extra_tiles=2 the taller
    window's extra groups extend the exact domain like the dense path."""
    from tpuslam.ops.pallas_warp import pallas_warp_static

    src, _ = _static_data(rng)
    gx, gy = np.meshgrid(np.arange(WS, dtype=np.float32),
                         np.arange(HS, dtype=np.float32), indexing="xy")
    amp = 4.0 + 8.0 * (extra_tiles - 1)
    dy = amp * np.sin(gx / WS * 7.0)[None] * np.ones((B, 1, 1), np.float32)
    coords = jnp.asarray(
        np.stack([gx[None] + 0 * dy, gy[None] + dy], axis=-1).astype(np.float32)
    )
    dense = np.asarray(pallas_warp_static(src, coords, True, extra_tiles))
    grp = np.asarray(
        pallas_warp_static(src, coords, True, extra_tiles, group_skip=True)
    )
    np.testing.assert_allclose(grp, dense, atol=3e-7)


def test_pallas_warp_static_segskip_cross_segment_footprints(rng):
    """Tiles whose horizontal footprint spans MULTIPLE window segments
    (large +-100 px horizontal flow) must still match the dense path: every
    hit segment executes and the per-segment masks partition the output."""
    from tpuslam.ops.pallas_warp import pallas_warp_static

    src, _ = _static_data(rng)
    src = jnp.round(src * 128.0) / 128.0
    gx, gy = np.meshgrid(np.arange(WS, dtype=np.float32),
                         np.arange(HS, dtype=np.float32), indexing="xy")
    dx = 100.0 * np.sin(gy / HS * 5.0)[None] * np.ones((B, 1, 1), np.float32)
    coords = jnp.asarray(
        np.stack([gx[None] + dx, gy[None] + 0 * dx], axis=-1).astype(np.float32)
    )
    dense = np.asarray(pallas_warp_static(src, coords, True))
    seg = np.asarray(pallas_warp_static(src, coords, True, seg_skip=True))
    np.testing.assert_allclose(seg, dense, atol=3e-7)


@pytest.mark.parametrize("group_skip", [False, True])
def test_pallas_warp_static_fused_grad_matches(rng, group_skip):
    """pallas_warp_static_fused stores the tap differentials at forward
    time and contracts them elementwise in the VJP — forward AND gradient
    must match the two-kernel path (same taps, same f32 formulas; the
    moved channel contraction is order-identical at C=3)."""
    from tpuslam.ops.pallas_warp import (pallas_warp_static,
                                         pallas_warp_static_fused)

    src, coords = _static_data(rng)
    fused = np.asarray(
        pallas_warp_static_fused(src, coords, True, 1, group_skip)
    )
    ref = np.asarray(
        pallas_warp_static(src, coords, True, 1, group_skip=group_skip)
    )
    np.testing.assert_allclose(fused, ref, atol=3e-7)

    def loss_fused(c):
        return (pallas_warp_static_fused(src, c, True, 1, group_skip) ** 2).sum()

    def loss_ref(c):
        return (pallas_warp_static(src, c, True, 1, False, False, False,
                                   group_skip) ** 2).sum()

    g_fused = np.asarray(jax.grad(loss_fused)(coords))
    g_ref = np.asarray(jax.grad(loss_ref)(coords))
    np.testing.assert_allclose(g_fused, g_ref, atol=1e-5, rtol=1e-6)


def test_pallas_warp_static_fused_grad_border_subgradients(rng):
    """The fused VJP applies the same clip-subgradient convention (1 inside,
    0 outside, 0.5 at exact boundary) as the backward kernels."""
    from tpuslam.ops.pallas_warp import (pallas_warp_static,
                                         pallas_warp_static_fused)

    src, coords = _static_data(rng)
    coords = coords.at[:, :, :3, 0].set(-2.0)  # outside: zero gradient
    coords = coords.at[:, :, 3, 0].set(0.0)    # exact boundary: 0.5x
    coords = coords.at[:, 5, :, 1].set(float(HS - 1))  # bottom boundary

    def loss(fn, c):
        return (fn(src, c, True, 1, True) ** 2).sum()

    g_fused = np.asarray(jax.grad(lambda c: loss(pallas_warp_static_fused, c))(coords))
    g_ref = np.asarray(jax.grad(
        lambda c: (pallas_warp_static(src, c, True, 1, group_skip=True) ** 2).sum()
    )(coords))
    np.testing.assert_allclose(g_fused, g_ref, atol=1e-5, rtol=1e-6)
    assert np.all(g_fused[:, :, :3, 0] == 0.0)


def test_warp_and_loss_fused_grad_matches_two_kernel(rng):
    """End-to-end through warp_and_loss: the fused-grad default must give
    the same loss gradients as the two-kernel path (pallas_fused_grad is a
    pure performance knob)."""
    from tpuslam.train import LossConfig, make_frame_batch
    from tpuslam.train.steps import warp_and_loss

    rgb = rng.uniform(size=(1, 3, HS, WS, 3)).astype(np.float32)
    K = np.array([[0.58 * WS, 0, 0.5 * WS, 0], [0, 1.92 * HS, 0.5 * HS, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
    batch = make_frame_batch(
        rgb, K, rng.uniform(0.5, 1.0, (1, 2)).astype(np.float32),
        quantize=False,
    )
    cfg = LossConfig(scales=(0, 1), use_pallas_warp=True,
                     pallas_fused_grad=True)
    cfg_ref = LossConfig(scales=(0, 1), use_pallas_warp=True,
                         pallas_fused_grad=False)
    disps = {("disp", s): jnp.asarray(
        rng.uniform(0.2, 0.6, (1, HS // 2**s, WS // 2**s, 1)).astype(np.float32))
        for s in (0, 1)}
    aa = jnp.asarray(rng.normal(0, 0.005, (2, 3)).astype(np.float32))
    tr = jnp.asarray(rng.normal(0, 0.01, (2, 3)).astype(np.float32))

    def loss_with(c, d, a, t):
        losses, _ = warp_and_loss(d, a, t, batch, c)
        return losses["loss"]

    g_fused = jax.grad(lambda a: loss_with(cfg, disps, a, tr))(aa)
    g_ref = jax.grad(lambda a: loss_with(cfg_ref, disps, a, tr))(aa)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               atol=1e-6, rtol=1e-5)


def test_pallas_warp_static_fused_bf16_out(rng):
    """bf16_out stores the fused kernel's outputs as bfloat16 with f32
    in-kernel math: values/gradients match the f32 path within bf16
    rounding of [0, 1] image data, and the stored dtype is bfloat16."""
    from tpuslam.ops.pallas_warp import pallas_warp_static_fused

    src, coords = _static_data(rng)
    out16 = pallas_warp_static_fused(src, coords, True, 1, True, True)
    out32 = pallas_warp_static_fused(src, coords, True, 1, True, False)
    assert out16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out16, np.float32), np.asarray(out32), atol=5e-3
    )

    def loss(bf16):
        def f(c):
            o = pallas_warp_static_fused(src, c, True, 1, True, bf16)
            return (o.astype(jnp.float32) ** 2).sum()

        return jax.grad(f)(coords)

    g16 = np.asarray(loss(True))
    g32 = np.asarray(loss(False))
    # dcoords stays f32 either way; difference is bf16 rounding of taps
    assert g16.dtype == np.float32
    np.testing.assert_allclose(g16, g32, atol=0.15, rtol=0.05)


def _tall_data(rng, S=2, max_vshift=20.0):
    """2*B distinct sources + per-(direction, scale, batch) smooth coords
    with LARGE vertical flow (outside the windowed kernels' exactness
    domain, inside the tall kernel's unlimited one)."""
    B2 = 2 * B
    src = jnp.asarray(rng.uniform(size=(B2, HS, WS, C)).astype(np.float32))
    gx, gy = np.meshgrid(np.arange(WS, dtype=np.float32),
                         np.arange(HS, dtype=np.float32), indexing="xy")
    coords = []
    for k in range(S * B2):
        dx = 3.0 * np.sin(gy / HS * (2 + k))
        dy = max_vshift * np.cos(gx / WS * (1 + 0.3 * k))
        coords.append(np.stack([gx + dx, gy + dy], axis=-1))
    return src, jnp.asarray(np.stack(coords).astype(np.float32))


def _tall_tiled_src(src, S):
    """Scale-tile the deduped sources into the warp-stack layout
    [direction-major, scale, batch-minor] the tall kernel's coords use."""
    B2 = src.shape[0]
    b = B2 // 2
    prev, nxt = src[:b], src[b:]
    return jnp.concatenate(
        [jnp.tile(prev, (S, 1, 1, 1)), jnp.tile(nxt, (S, 1, 1, 1))], axis=0
    )


def test_pallas_warp_tall_matches_xla_sampler(rng):
    """Full-height kernel: exact vs the XLA sampler at vertical flows far
    beyond the windowed kernels' domain, with deduped-source layout."""
    from tpuslam.ops.pallas_warp import pallas_warp_tall

    S = 2
    src, coords = _tall_data(rng, S)
    ours = np.asarray(pallas_warp_tall(src, coords, True, S))
    ref = np.asarray(bilinear_sampler(_tall_tiled_src(src, S), coords))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_pallas_warp_tall_gradients_match(rng):
    from tpuslam.ops.pallas_warp import pallas_warp_tall

    S = 2
    src, coords = _tall_data(rng, S)
    tiled = _tall_tiled_src(src, S)

    g_tall = np.asarray(jax.grad(
        lambda c: (pallas_warp_tall(src, c, True, S) ** 2).sum()
    )(coords))
    g_xla = np.asarray(jax.grad(
        lambda c: (bilinear_sampler(tiled, c) ** 2).sum()
    )(coords))
    np.testing.assert_allclose(g_tall, g_xla, atol=1e-4, rtol=1e-5)


def test_pallas_warp_tall_bf16_out(rng):
    from tpuslam.ops.pallas_warp import pallas_warp_tall

    S = 2
    src, coords = _tall_data(rng, S)
    out16 = pallas_warp_tall(src, coords, True, S, True)
    out32 = pallas_warp_tall(src, coords, True, S, False)
    assert out16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out16, np.float32), np.asarray(out32), atol=5e-3
    )


def test_warp_and_loss_tall_matches_default(rng):
    """pallas_tall through the production warp_and_loss: same losses and
    gradients as the EXACT XLA sampler path (the windowed default clamps
    vertical flows beyond its window; the tall kernel, like the XLA
    sampler, does not — so the exact path is the right oracle)."""
    from tpuslam.train import LossConfig, make_frame_batch
    from tpuslam.train.steps import warp_and_loss

    h, w, b = 48, 384, 2
    scales = (0, 1)
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = 0.58 * w; K[1, 1] = 1.92 * h; K[0, 2] = 0.5 * w; K[1, 2] = 0.5 * h
    batch = make_frame_batch(
        rng.uniform(size=(b, 3, h, w, 3)).astype(np.float32),
        K,
        rng.uniform(0.5, 2.0, size=(b, 2)).astype(np.float32),
    )
    disps = {
        ("disp", s): jnp.asarray(
            rng.uniform(0.2, 0.6, size=(b, h >> s, w >> s, 1)).astype(np.float32)
        )
        for s in scales
    }
    aa = jnp.asarray(0.01 * rng.normal(size=(2 * b, 3)).astype(np.float32))
    tr = jnp.asarray(0.05 * rng.normal(size=(2 * b, 3)).astype(np.float32))

    def loss(tall, d0):
        cfg = LossConfig(scales=scales, pallas_extra_tiles=1,
                         pallas_tall=tall, use_pallas_warp=tall)
        losses, _ = warp_and_loss({**disps, ("disp", 0): d0}, aa, tr, batch,
                                  cfg)
        return losses["loss"]

    l_def = float(loss(False, disps[("disp", 0)]))
    l_tall = float(loss(True, disps[("disp", 0)]))
    np.testing.assert_allclose(l_tall, l_def, rtol=1e-5)

    g_def = np.asarray(jax.grad(lambda d: loss(False, d))(disps[("disp", 0)]))
    g_tall = np.asarray(jax.grad(lambda d: loss(True, d))(disps[("disp", 0)]))
    np.testing.assert_allclose(g_tall, g_def, atol=1e-6, rtol=1e-4)


# ---------------------------------------------------------------------------
# In-kernel projection (pallas_warp_tall_proj)
# ---------------------------------------------------------------------------


def _proj_data(rng, S=2):
    """Realistic camera geometry for the in-kernel projection: intrinsics,
    small SE(3) motions per (direction, batch), smooth positive depth."""
    from tpuslam.geometry.se3 import transformation_from_parameters

    b = B
    src = jnp.asarray(rng.uniform(size=(2 * b, HS, WS, C)).astype(np.float32))
    gx, gy = np.meshgrid(np.arange(WS, dtype=np.float32),
                         np.arange(HS, dtype=np.float32), indexing="xy")
    depth = np.stack([
        4.0 + 1.5 * np.sin(gx / WS * (2 + k)) * np.cos(gy / HS * (1 + k))
        for k in range(S * b)
    ])[..., None].astype(np.float32)
    K = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
    K[:, 0, 0] = 0.58 * WS
    K[:, 1, 1] = 1.92 * HS
    K[:, 0, 2] = 0.5 * WS
    K[:, 1, 2] = 0.5 * HS
    inv_K = np.linalg.inv(K).astype(np.float32)
    aa = jnp.asarray(0.01 * rng.normal(size=(2 * b, 3)).astype(np.float32))
    tr = jnp.asarray(0.05 * rng.normal(size=(2 * b, 3)).astype(np.float32))
    T2 = transformation_from_parameters(aa, tr)
    return src, jnp.asarray(depth), jnp.asarray(K), jnp.asarray(inv_K), T2


def _chain_coords(depth, K, inv_K, T2, S):
    """The original two-stage XLA projection at the warp-stack layout."""
    from tpuslam.geometry.camera import backproject_depth, pixel_grid, project_3d

    SB, h, w = depth.shape[0], depth.shape[1], depth.shape[2]
    b = K.shape[0]
    points = backproject_depth(depth, jnp.tile(inv_K, (S, 1, 1)),
                               pixel_grid(h, w))
    T_stack = jnp.concatenate(
        [jnp.tile(T2[:b], (S, 1, 1)), jnp.tile(T2[b:], (S, 1, 1))], axis=0
    )
    return project_3d(jnp.tile(points, (2, 1, 1)),
                      jnp.tile(K, (2 * S, 1, 1)), T_stack, h, w)


def test_pallas_warp_tall_proj_matches_chain(rng):
    """In-kernel projection == XLA backproject/project + sampler (up to f32
    association of the collapsed affine map)."""
    from tpuslam.geometry.camera import projection_affine
    from tpuslam.ops.pallas_warp import pallas_warp_tall_proj

    S = 2
    src, depth, K, inv_K, T2 = _proj_data(rng, S)
    ab = projection_affine(jnp.tile(K, (2, 1, 1)),
                           jnp.tile(inv_K, (2, 1, 1)), T2)
    ours = np.asarray(pallas_warp_tall_proj(src, depth, ab, True, S))
    coords = _chain_coords(depth, K, inv_K, T2, S)
    ref = np.asarray(bilinear_sampler(_tall_tiled_src(src, S), coords))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_proj_coords_xla_matches_chain(rng):
    """The VJP-side XLA recompute agrees with the two-stage chain."""
    from tpuslam.geometry.camera import projection_affine
    from tpuslam.ops.pallas_warp import proj_coords_xla

    S = 2
    _, depth, K, inv_K, T2 = _proj_data(rng, S)
    ab = projection_affine(jnp.tile(K, (2, 1, 1)),
                           jnp.tile(inv_K, (2, 1, 1)), T2)
    ours = np.asarray(proj_coords_xla(depth, ab, S))
    ref = np.asarray(_chain_coords(depth, K, inv_K, T2, S))
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_pallas_warp_tall_proj_gradients(rng):
    """Gradients w.r.t. depth AND pose flow through the in-kernel projection
    and match autodiff of the XLA chain."""
    from tpuslam.geometry.camera import projection_affine
    from tpuslam.ops.pallas_warp import pallas_warp_tall_proj

    S = 2
    src, depth, K, inv_K, T2 = _proj_data(rng, S)
    tiled = _tall_tiled_src(src, S)

    def f_proj(depth_, T2_):
        ab = projection_affine(jnp.tile(K, (2, 1, 1)),
                               jnp.tile(inv_K, (2, 1, 1)), T2_)
        out = pallas_warp_tall_proj(src, depth_, ab, True, S)
        return (out ** 2).sum()

    def f_chain(depth_, T2_):
        coords = _chain_coords(depth_, K, inv_K, T2_, S)
        return (bilinear_sampler(tiled, coords) ** 2).sum()

    gd_p, gt_p = jax.grad(f_proj, argnums=(0, 1))(depth, T2)
    gd_c, gt_c = jax.grad(f_chain, argnums=(0, 1))(depth, T2)
    # the collapsed affine map differs from the two-stage chain by f32
    # association (~3e-5 px): pixels whose coordinate floor() flips give a
    # legitimately different (still valid) tap subgradient — allow a tiny
    # fraction of such boundary crossings, exact agreement elsewhere
    bad = ~np.isclose(np.asarray(gd_p), np.asarray(gd_c),
                      atol=5e-2, rtol=1e-3)
    assert bad.mean() < 1e-3, f"{bad.sum()} / {bad.size} gradient outliers"
    # the pose gradient reduces over all pixels, so the handful of flipped
    # taps bleed ~1% into the totals — rtol sized to that, not to f32
    np.testing.assert_allclose(np.asarray(gt_p), np.asarray(gt_c),
                               atol=5e-2, rtol=5e-2)


def test_warp_and_loss_proj_matches_default(rng):
    """pallas_proj through the production warp_and_loss: same losses and
    gradients as the exact XLA sampler path."""
    from tpuslam.train import LossConfig, make_frame_batch
    from tpuslam.train.steps import warp_and_loss

    h, w, b = 48, 384, 2
    scales = (0, 1)
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = 0.58 * w; K[1, 1] = 1.92 * h; K[0, 2] = 0.5 * w; K[1, 2] = 0.5 * h
    batch = make_frame_batch(
        rng.uniform(size=(b, 3, h, w, 3)).astype(np.float32),
        K,
        rng.uniform(0.5, 2.0, size=(b, 2)).astype(np.float32),
    )
    disps = {
        ("disp", s): jnp.asarray(
            rng.uniform(0.2, 0.6, size=(b, h >> s, w >> s, 1)).astype(np.float32)
        )
        for s in scales
    }
    aa = jnp.asarray(0.01 * rng.normal(size=(2 * b, 3)).astype(np.float32))
    tr = jnp.asarray(0.05 * rng.normal(size=(2 * b, 3)).astype(np.float32))

    def loss(proj, d0):
        cfg = LossConfig(scales=scales, pallas_extra_tiles=1,
                         pallas_tall=proj, pallas_proj=proj,
                         use_pallas_warp=proj)
        losses, _ = warp_and_loss({**disps, ("disp", 0): d0}, aa, tr, batch,
                                  cfg)
        return losses["loss"]

    l_def = float(loss(False, disps[("disp", 0)]))
    l_proj = float(loss(True, disps[("disp", 0)]))
    np.testing.assert_allclose(l_proj, l_def, rtol=1e-5)

    g_def = np.asarray(jax.grad(lambda d: loss(False, d))(disps[("disp", 0)]))
    g_proj = np.asarray(jax.grad(lambda d: loss(True, d))(disps[("disp", 0)]))
    # allow isolated tap-boundary crossings from the f32 association
    # difference of the collapsed affine map (see the proj gradient test)
    bad = ~np.isclose(g_proj, g_def, atol=1e-5, rtol=1e-3)
    assert bad.mean() < 1e-3, f"{bad.sum()} / {bad.size} gradient outliers"

"""Composite warp->loss op with fused backward (ops/pallas_fused.py):
value- and gradient-parity vs the two-op composition, plus the production
warp_and_loss integration."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuslam.ops.pallas_fused import fits_vmem_fused_bwd, warp_reproj_err
from tpuslam.ops.pallas_loss import pallas_reproj_err
from tpuslam.ops.pallas_warp import pallas_warp_tall

B, S = 2, 2
H, W, C = 32, 384, 3


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _data(rng):
    src2 = jnp.asarray(rng.uniform(size=(2 * B, H, W, C)).astype(np.float32))
    target = jnp.asarray(rng.uniform(size=(B, H, W, C)).astype(np.float32))
    gx, gy = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32), indexing="xy")
    coords = []
    for k in range(S * 2 * B):
        dx = 2.5 * np.sin(gy / H * (2 + k))
        dy = 6.0 * np.cos(gx / W * (1 + 0.3 * k))
        coords.append(np.stack([gx + dx, gy + dy], axis=-1))
    return src2, jnp.asarray(np.stack(coords).astype(np.float32)), target


def test_composite_matches_two_op_forward(rng):
    src2, coords, target = _data(rng)
    err, warped = warp_reproj_err(src2, coords, target, True, S)
    warped_ref = pallas_warp_tall(src2, coords, True, S)
    err_ref = pallas_reproj_err(warped_ref, target, True)
    np.testing.assert_allclose(np.asarray(warped), np.asarray(warped_ref),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(err), np.asarray(err_ref),
                               atol=1e-6)


def test_composite_gradient_matches_two_op(rng):
    """The fused backward (in-VMEM dpred contraction) must equal the
    two-op autodiff chain: loss bwd kernel -> XLA contraction."""
    src2, coords, target = _data(rng)
    w = jnp.asarray(rng.uniform(size=(S * 2 * B, H, W)).astype(np.float32))

    def loss_fused(c):
        err, _ = warp_reproj_err(src2, c, target, True, S)
        return (err * w).sum()

    def loss_two_op(c):
        warped = pallas_warp_tall(src2, c, True, S)
        return (pallas_reproj_err(warped, target, True) * w).sum()

    g_fused = np.asarray(jax.grad(loss_fused)(coords))
    g_ref = np.asarray(jax.grad(loss_two_op)(coords))
    np.testing.assert_allclose(g_fused, g_ref, atol=1e-5, rtol=1e-5)


def test_composite_bf16_taps_gradient(rng):
    """bf16 stored taps: gradient within bf16 rounding of the f32 path."""
    src2, coords, target = _data(rng)

    def loss(bf16):
        def f(c):
            err, _ = warp_reproj_err(src2, c, target, True, S, bf16)
            return (err ** 2).sum()

        return np.asarray(jax.grad(f)(coords))

    # same tolerance as the bf16 warp-gradient test (test_pallas_warp.py):
    # bf16 tap rounding amplifies through the SSIM rational on a handful
    # of near-zero-denominator pixels
    np.testing.assert_allclose(loss(True), loss(False), atol=0.15, rtol=0.05)


def test_warped_output_is_detached(rng):
    """The composite's warped by-product carries no gradient: a loss on
    warped alone yields zero dcoords (documented semantics — exact when
    total_loss consumes reproj_maps)."""
    src2, coords, target = _data(rng)

    def loss(c):
        _, warped = warp_reproj_err(src2, c, target, True, S)
        return (warped.astype(jnp.float32) ** 2).sum()

    g = np.asarray(jax.grad(loss)(coords))
    assert (g == 0).all()


def test_fits_vmem_fused_bwd_gate():
    # with row-slab windowing the production shape fits regardless of tap
    # dtype (the slab, not the image, sizes the VMEM stack)
    assert fits_vmem_fused_bwd(192, 640, 3, bf16_taps=False)
    assert fits_vmem_fused_bwd(192, 640, 3, bf16_taps=True)
    assert fits_vmem_fused_bwd(96, 320, 3, bf16_taps=False)
    assert not fits_vmem_fused_bwd(1024, 2048, 3, bf16_taps=True)


def test_warp_and_loss_fused_bwd_matches_unfused(rng):
    """Production integration: pallas_fused_bwd ON vs OFF through
    warp_and_loss — identical losses, identical disp gradients."""
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

    def loss(fused_bwd, d0):
        cfg = LossConfig(scales=scales, use_pallas_warp=True,
                         pallas_tall=True, pallas_fused_loss=True,
                         pallas_fused_bwd=fused_bwd)
        losses, _ = warp_and_loss({**disps, ("disp", 0): d0}, aa, tr, batch,
                                  cfg)
        return losses["loss"]

    l_off = float(loss(False, disps[("disp", 0)]))
    l_on = float(loss(True, disps[("disp", 0)]))
    np.testing.assert_allclose(l_on, l_off, rtol=1e-6)

    g_off = np.asarray(jax.grad(lambda d: loss(False, d))(disps[("disp", 0)]))
    g_on = np.asarray(jax.grad(lambda d: loss(True, d))(disps[("disp", 0)]))
    np.testing.assert_allclose(g_on, g_off, atol=1e-6, rtol=1e-4)


# ---------------------------------------------------------------------------
# Composite with in-kernel projection (warp_reproj_err_proj)
# ---------------------------------------------------------------------------


def _proj_inputs(rng):
    """depth + affine camera maps + matching coordinate field."""
    from tpuslam.geometry.camera import projection_affine
    from tpuslam.geometry.se3 import transformation_from_parameters
    from tpuslam.ops.pallas_warp import proj_coords_xla

    gx, gy = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32), indexing="xy")
    depth = jnp.asarray(np.stack([
        4.0 + 1.5 * np.sin(gx / W * (2 + k)) * np.cos(gy / H * (1 + k))
        for k in range(S * B)
    ])[..., None].astype(np.float32))
    K = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    K[:, 0, 0] = 0.58 * W
    K[:, 1, 1] = 1.92 * H
    K[:, 0, 2] = 0.5 * W
    K[:, 1, 2] = 0.5 * H
    inv_K = jnp.asarray(np.linalg.inv(K).astype(np.float32))
    K = jnp.asarray(K)
    aa = jnp.asarray(0.01 * rng.normal(size=(2 * B, 3)).astype(np.float32))
    tr = jnp.asarray(0.05 * rng.normal(size=(2 * B, 3)).astype(np.float32))
    T2 = transformation_from_parameters(aa, tr)
    ab = projection_affine(jnp.tile(K, (2, 1, 1)),
                           jnp.tile(inv_K, (2, 1, 1)), T2)
    return depth, ab, proj_coords_xla(depth, ab, S)


def test_composite_proj_matches_coords_composite(rng):
    """In-kernel projection composite == coordinate-fed composite at the
    SAME coordinates (values and error maps)."""
    from tpuslam.ops.pallas_fused import warp_reproj_err_proj

    src2, _, target = _data(rng)
    depth, ab, coords = _proj_inputs(rng)
    err_p, warped_p = warp_reproj_err_proj(src2, depth, ab, target, True, S)
    err_c, warped_c = warp_reproj_err(src2, coords, target, True, S)
    # in-kernel vs full-array projection differ by FMA contraction
    # (~1e-4 px coordinate wobble -> ~1e-4 value wobble through the taps)
    np.testing.assert_allclose(np.asarray(warped_p), np.asarray(warped_c),
                               atol=3e-4)
    np.testing.assert_allclose(np.asarray(err_p), np.asarray(err_c),
                               atol=3e-4)


def test_composite_proj_gradients_match_chain(rng):
    """d(loss)/d(depth) and d(loss)/d(ab) through the fused backward +
    projection VJP chain == autodiff of the coordinate-fed composite
    composed with the XLA projection recompute."""
    from tpuslam.ops.pallas_fused import warp_reproj_err_proj
    from tpuslam.ops.pallas_warp import proj_coords_xla

    src2, _, target = _data(rng)
    depth, ab, _ = _proj_inputs(rng)
    w = jnp.asarray(rng.uniform(size=(S * 2 * B, H, W)).astype(np.float32))

    def loss_proj(depth_, ab_):
        err, _ = warp_reproj_err_proj(src2, depth_, ab_, target, True, S)
        return (err * w).sum()

    def loss_chain(depth_, ab_):
        coords = proj_coords_xla(depth_, ab_, S)
        err, _ = warp_reproj_err(src2, coords, target, True, S)
        return (err * w).sum()

    gd_p, ga_p = jax.grad(loss_proj, argnums=(0, 1))(depth, ab)
    gd_c, ga_c = jax.grad(loss_chain, argnums=(0, 1))(depth, ab)
    # in-kernel vs full-array projection coords differ by FMA contraction:
    # allow isolated tap-boundary flips, near-exact agreement elsewhere
    bad = ~np.isclose(np.asarray(gd_p), np.asarray(gd_c),
                      atol=1e-3, rtol=1e-3)
    assert bad.mean() < 1e-3, f"{bad.sum()} / {bad.size} gradient outliers"
    # ab gradients reduce over all pixels — boundary flips bleed ~1%
    np.testing.assert_allclose(np.asarray(ga_p), np.asarray(ga_c),
                               atol=1e-3, rtol=5e-2)


def test_warp_and_loss_proj_fused_matches_unfused(rng):
    """Production integration: the full round-4 stack (tall + fused loss +
    fused bwd + in-kernel projection) vs the same stack without proj —
    identical losses and disp gradients."""
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
        cfg = LossConfig(scales=scales, use_pallas_warp=True,
                         pallas_tall=True, pallas_fused_loss=True,
                         pallas_fused_bwd=True, pallas_proj=proj)
        losses, _ = warp_and_loss({**disps, ("disp", 0): d0}, aa, tr, batch,
                                  cfg)
        return losses["loss"]

    l_off = float(loss(False, disps[("disp", 0)]))
    l_on = float(loss(True, disps[("disp", 0)]))
    np.testing.assert_allclose(l_on, l_off, rtol=1e-5)

    g_off = np.asarray(jax.grad(lambda d: loss(False, d))(disps[("disp", 0)]))
    g_on = np.asarray(jax.grad(lambda d: loss(True, d))(disps[("disp", 0)]))
    np.testing.assert_allclose(g_on, g_off, atol=1e-5, rtol=1e-3)


def test_composite_windowed_slabs_gradient(monkeypatch):
    """Row-slab windowed fused backward (BH < H): dcoords must equal the
    two-op autodiff chain — exercises the dc kernel's halo windows, per-
    channel vjp slabs, and tap-differential slab contraction."""
    import tpuslam.ops.pallas_loss as loss_mod

    monkeypatch.setattr(loss_mod, "_STACK_BUDGET_BYTES", 3 * 1024 * 1024)
    h, w, b, s = 96, 384, 1, 2  # >= SWIN_W for the tall warp kernel
    assert loss_mod._pick_block_h(h, w) not in (0, h)
    rng2 = np.random.default_rng(11)
    src2 = jnp.asarray(rng2.uniform(size=(2 * b, h, w, C)).astype(np.float32))
    target = jnp.asarray(rng2.uniform(size=(b, h, w, C)).astype(np.float32))
    gx, gy = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32), indexing="xy")
    coords = jnp.asarray(np.stack([
        np.stack([gx + 2.5 * np.sin(gy / h * (2 + k)),
                  gy + 6.0 * np.cos(gx / w * (1 + 0.3 * k))], axis=-1)
        for k in range(s * 2 * b)
    ]).astype(np.float32))
    wgt = jnp.asarray(rng2.uniform(size=(s * 2 * b, h, w)).astype(np.float32))

    def loss_fused(c):
        err, _ = warp_reproj_err(src2, c, target, True, s)
        return (err * wgt).sum()

    def loss_two_op(c):
        warped = pallas_warp_tall(src2, c, True, s)
        return (pallas_reproj_err(warped, target, True) * wgt).sum()

    g_fused = np.asarray(jax.grad(loss_fused)(coords))
    g_ref = np.asarray(jax.grad(loss_two_op)(coords))
    np.testing.assert_allclose(g_fused, g_ref, atol=1e-5, rtol=1e-5)

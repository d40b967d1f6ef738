"""Interpret-mode parity tests for the fused reprojection-error kernel
(ops/pallas_loss.py) against the XLA composition it replaces."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuslam.losses.photometric import reprojection_loss
from tpuslam.ops.pallas_loss import fits_vmem, pallas_reproj_err

B, K, H, W, C = 3, 4, 32, 256, 3
N = K * B


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(0)
    preds = rng.uniform(size=(N, H, W, C)).astype(np.float32)
    target = rng.uniform(size=(B, H, W, C)).astype(np.float32)
    return jnp.asarray(preds), jnp.asarray(target)


def _xla_maps(preds, target):
    """reprojection_loss per (k, b) pair with the k-major/batch-minor
    layout of the kernel API."""
    tiled = jnp.tile(target, (K, 1, 1, 1))
    return reprojection_loss(preds, tiled)


def test_forward_matches_xla(images):
    preds, target = images
    got = pallas_reproj_err(preds, target, True)
    want = _xla_maps(preds, target)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-6)


def test_gradient_matches_xla(images):
    preds, target = images
    # weighted sum with a non-uniform mask so the cotangent varies per pixel
    # (the min-reprojection mask does exactly this in total_loss)
    gmask = jnp.asarray(
        np.random.default_rng(1).uniform(size=(N, H, W)).astype(np.float32)
    )

    g_pallas = jax.grad(
        lambda p: (pallas_reproj_err(p, target, True) * gmask).sum()
    )(preds)
    g_xla = jax.grad(lambda p: (_xla_maps(p, target) * gmask).sum())(preds)
    np.testing.assert_allclose(
        np.asarray(g_pallas), np.asarray(g_xla), atol=5e-6
    )


def test_target_gradient_is_zero(images):
    preds, target = images
    g_t = jax.grad(
        lambda t: pallas_reproj_err(preds, t, True).sum()
    )(target)
    np.testing.assert_array_equal(np.asarray(g_t), 0.0)


def test_fits_vmem_guard():
    assert fits_vmem(192, 640, 3)
    assert not fits_vmem(1024, 2048, 3)


def test_warp_and_loss_integration():
    """warp_and_loss with pallas_fused_loss on vs off: same losses and
    gradients through the production composition (pallas warp + min-
    reprojection masking + smoothness + velocity)."""
    from tpuslam.train.batch import make_frame_batch
    from tpuslam.train.steps import LossConfig, warp_and_loss

    rng = np.random.default_rng(2)
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

    def run(fused):
        cfg = LossConfig(scales=scales, pallas_extra_tiles=1,
                         pallas_fused_loss=fused)
        losses, _ = warp_and_loss(disps, aa, tr, batch, cfg)
        return losses

    l_off = run(False)
    l_on = run(True)
    np.testing.assert_allclose(
        float(l_on["loss"]), float(l_off["loss"]), rtol=1e-5
    )

    def grad_fn(fused):
        def f(d0):
            cfg = LossConfig(scales=scales, pallas_extra_tiles=1,
                             pallas_fused_loss=fused)
            losses, _ = warp_and_loss({**disps, ("disp", 0): d0}, aa, tr,
                                      batch, cfg)
            return losses["loss"]

        return jax.grad(f)(disps[("disp", 0)])

    g_off = grad_fn(False)
    g_on = grad_fn(True)
    np.testing.assert_allclose(
        np.asarray(g_on), np.asarray(g_off), atol=1e-6, rtol=1e-4
    )


def test_windowed_slabs_match_xla(monkeypatch):
    """Row-slab windowing (BH < H): forward and backward must equal the
    full-image XLA composition exactly — exercises the halo windows, the
    3-way slab select, and the backward's cotangent row masking."""
    import tpuslam.ops.pallas_loss as mod

    h, w, b, k = 96, 256, 1, 4
    n = k * b
    monkeypatch.setattr(mod, "_STACK_BUDGET_BYTES", 2 * 1024 * 1024)
    assert mod._pick_block_h(h, w) not in (0, h)  # forced windowed path
    rng = np.random.default_rng(3)
    preds = jnp.asarray(rng.uniform(size=(n, h, w, C)).astype(np.float32))
    target = jnp.asarray(rng.uniform(size=(b, h, w, C)).astype(np.float32))
    tiled = jnp.tile(target, (k, 1, 1, 1))

    got = pallas_reproj_err(preds, target, True)
    want = reprojection_loss(preds, tiled)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-6)

    gmask = jnp.asarray(rng.uniform(size=(n, h, w)).astype(np.float32))
    g_pallas = jax.grad(
        lambda p: (pallas_reproj_err(p, target, True) * gmask).sum()
    )(preds)
    g_xla = jax.grad(
        lambda p: (reprojection_loss(p, tiled) * gmask).sum()
    )(preds)
    np.testing.assert_allclose(
        np.asarray(g_pallas), np.asarray(g_xla), atol=5e-6
    )

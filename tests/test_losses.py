"""Loss parity tests vs a torch re-statement of the reference formulas."""
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from tpuslam.losses import (
    normalize_disp,
    reprojection_loss,
    smooth_loss,
    ssim,
    total_loss,
    velocity_loss,
)

B, H, W = 2, 16, 24


def _imgs(rng, n=2):
    return [rng.uniform(size=(B, H, W, 3)).astype(np.float32) for _ in range(n)]


def _torch_ssim(x, y):
    """SSIM distance exactly as the reference SSIM module computes it
    (reflection pad + 3x3 avg pools, C1=0.01^2, C2=0.03^2)."""
    x = F.pad(x, (1, 1, 1, 1), mode="reflect")
    y = F.pad(y, (1, 1, 1, 1), mode="reflect")
    mu_x = F.avg_pool2d(x, 3, 1)
    mu_y = F.avg_pool2d(y, 3, 1)
    sigma_x = F.avg_pool2d(x**2, 3, 1) - mu_x**2
    sigma_y = F.avg_pool2d(y**2, 3, 1) - mu_y**2
    sigma_xy = F.avg_pool2d(x * y, 3, 1) - mu_x * mu_y
    C1, C2 = 0.01**2, 0.03**2
    n = (2 * mu_x * mu_y + C1) * (2 * sigma_xy + C2)
    d = (mu_x**2 + mu_y**2 + C1) * (sigma_x + sigma_y + C2)
    return torch.clamp((1 - n / d) / 2, 0, 1)


def test_ssim_matches_reference_formula(rng):
    x, y = _imgs(rng)
    ours = np.asarray(ssim(jnp.asarray(x), jnp.asarray(y)))
    ref = _torch_ssim(
        torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(y).permute(0, 3, 1, 2)
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_ssim_identical_images_is_zero(rng):
    (x,) = _imgs(rng, 1)
    out = np.asarray(ssim(jnp.asarray(x), jnp.asarray(x)))
    np.testing.assert_allclose(out, np.zeros_like(out), atol=1e-6)


def test_reprojection_loss_weighting(rng):
    x, y = _imgs(rng)
    out = np.asarray(reprojection_loss(jnp.asarray(x), jnp.asarray(y)))
    l1 = np.abs(x - y).mean(-1)
    s = np.asarray(ssim(jnp.asarray(x), jnp.asarray(y))).mean(-1)
    np.testing.assert_allclose(out, 0.85 * s + 0.15 * l1, atol=1e-6)


def test_smooth_loss_formula(rng):
    disp = rng.uniform(0.1, 1.0, size=(B, H, W, 1)).astype(np.float32)
    img = rng.uniform(size=(B, H, W, 3)).astype(np.float32)
    ours = np.asarray(smooth_loss(jnp.asarray(disp), jnp.asarray(img)))

    d = torch.from_numpy(disp).permute(0, 3, 1, 2)
    im = torch.from_numpy(img).permute(0, 3, 1, 2)
    gdx = (d[:, :, :, :-1] - d[:, :, :, 1:]).abs()
    gdy = (d[:, :, :-1, :] - d[:, :, 1:, :]).abs()
    gix = (im[:, :, :, :-1] - im[:, :, :, 1:]).abs().mean(1, keepdim=True)
    giy = (im[:, :, :-1, :] - im[:, :, 1:, :]).abs().mean(1, keepdim=True)
    ref = ((gdx * torch.exp(-gix)).flatten(1).mean(1)
           + (gdy * torch.exp(-giy)).flatten(1).mean(1)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_smooth_loss_flat_disparity_zero(rng):
    disp = np.full((B, H, W, 1), 0.3, np.float32)
    img = rng.uniform(size=(B, H, W, 3)).astype(np.float32)
    out = np.asarray(smooth_loss(jnp.asarray(disp), jnp.asarray(img)))
    np.testing.assert_allclose(out, 0.0, atol=1e-7)


def test_velocity_loss_pairing():
    trans = {-1: jnp.asarray([[0.0, 0.0, 2.0]]), 1: jnp.asarray([[0.0, 0.0, 3.0]])}
    dists = {0: jnp.asarray([2.5]), 1: jnp.asarray([-3.5])}  # sign dropped by abs
    out = float(velocity_loss(trans, dists)[0])
    # (|2 - 2.5| + |3 - 3.5|) / 2 = 0.5
    np.testing.assert_allclose(out, 0.5, atol=1e-6)


def test_total_loss_min_reprojection_automask(rng):
    """If the 'warped' frame equals the target, reprojection term must be ~0
    even when identity frames are far (min picks the best hypothesis)."""
    target = jnp.asarray(rng.uniform(size=(B, H, W, 3)).astype(np.float32))
    far = jnp.asarray(rng.uniform(size=(B, H, W, 3)).astype(np.float32))
    inputs = {
        ("rgb", 0, 0): target,
        ("rgb", -1, 0): far,
        ("rgb", 1, 0): far,
        ("rgb", 0, 1): target[:, ::2, ::2],
        ("relative_distance", 0): jnp.ones(B),
        ("relative_distance", 1): jnp.ones(B),
    }
    outputs = {
        ("rgb", -1, 0): target,
        ("rgb", 1, 0): target,
        ("rgb", -1, 1): target,
        ("rgb", 1, 1): target,
        ("disp", 0): jnp.full((B, H, W, 1), 0.5),
        ("disp", 1): jnp.full((B, H // 2, W // 2, 1), 0.5),
        ("translation", 0, -1): jnp.ones((B, 3)) / np.sqrt(3),
        ("translation", 0, 1): jnp.ones((B, 3)) / np.sqrt(3),
    }
    losses = total_loss(inputs, outputs, scales=(0, 1))
    assert float(losses["reprojection_loss/scale_0"]) < 1e-6
    assert float(losses["smooth_loss/scale_0"]) < 1e-6
    np.testing.assert_allclose(float(losses["velocity_loss"]), 0.0, atol=1e-6)
    # conversely: when the warp is bad, the identity frames cap the loss
    outputs_bad = dict(outputs)
    outputs_bad[("rgb", -1, 0)] = far * 0  # black warp
    outputs_bad[("rgb", 1, 0)] = far * 0
    losses_bad = total_loss(inputs, outputs_bad, scales=(0,))
    id_loss = float(np.asarray(reprojection_loss(far, target)).mean())
    assert float(losses_bad["reprojection_loss/scale_0"]) <= id_loss + 1e-5


def test_total_loss_sample_weights(rng):
    """Zero-weighting a sample must remove its contribution entirely —
    the padding mechanism for partially-filled replay batches."""
    target = jnp.asarray(rng.uniform(size=(B, H, W, 3)).astype(np.float32))
    src = jnp.asarray(rng.uniform(size=(B, H, W, 3)).astype(np.float32))
    inputs = {
        ("rgb", 0, 0): target,
        ("rgb", -1, 0): src,
        ("rgb", 1, 0): src,
        ("rgb", 0, 1): target[:, ::2, ::2],
        ("relative_distance", 0): jnp.ones(B),
        ("relative_distance", 1): jnp.ones(B),
    }
    outputs = {
        ("rgb", -1, 0): src,
        ("rgb", 1, 0): src,
        ("rgb", -1, 1): src,
        ("rgb", 1, 1): src,
        ("disp", 0): jnp.asarray(rng.uniform(0.1, 0.9, (B, H, W, 1)).astype(np.float32)),
        ("disp", 1): jnp.full((B, H // 2, W // 2, 1), 0.5),
        ("translation", 0, -1): jnp.zeros((B, 3)),
        ("translation", 0, 1): jnp.zeros((B, 3)),
    }
    w_first = jnp.asarray([1.0, 0.0])
    l_first = total_loss(inputs, outputs, scales=(0, 1), sample_weights=w_first)

    inputs_0 = {
        k: (v[:1] if hasattr(v, "shape") and v.shape[:1] == (B,) else v)
        for k, v in inputs.items()
    }
    outputs_0 = {k: v[:1] for k, v in outputs.items()}
    l_only = total_loss(
        inputs_0, outputs_0, scales=(0, 1), sample_weights=jnp.asarray([1.0])
    )
    np.testing.assert_allclose(
        float(l_first["loss"]), float(l_only["loss"]), rtol=1e-5
    )


def test_total_loss_dynamic_mask(rng):
    """Masked path: dynamic pixels must not contribute to the loss."""
    target = jnp.asarray(rng.uniform(size=(B, H, W, 3)).astype(np.float32))
    src = jnp.asarray(rng.uniform(size=(B, H, W, 3)).astype(np.float32))
    # warped output equals target on the left half, garbage on the right
    bad = target.at[:, :, W // 2 :].set(0.0)
    inputs = {
        ("rgb", 0, 0): target,
        ("rgb", -1, 0): src,
        ("rgb", 1, 0): src,
        ("relative_distance", 0): jnp.ones(B),
        ("relative_distance", 1): jnp.ones(B),
    }
    outputs = {
        ("rgb", -1, 0): bad,
        ("rgb", 1, 0): bad,
        ("disp", 0): jnp.full((B, H, W, 1), 0.5),
        ("translation", 0, -1): jnp.ones((B, 3)) / np.sqrt(3),
        ("translation", 0, 1): jnp.ones((B, 3)) / np.sqrt(3),
    }
    # mask the right half as dynamic -> loss should be ~0 there
    mask = np.zeros((B, H, W), np.float32)
    mask[:, :, W // 2 :] = 1.0
    masked = total_loss(
        inputs, outputs, scales=(0,), dynamic_masks={0: jnp.asarray(mask)}
    )
    unmasked = total_loss(inputs, outputs, scales=(0,))
    assert float(masked["reprojection_loss/scale_0"]) < 0.02
    assert float(unmasked["reprojection_loss/scale_0"]) > 5 * float(
        masked["reprojection_loss/scale_0"]
    )


def test_scale_prior_anti_collapse(rng):
    """The log-mean-disparity prior fires only when enabled, is ~0 at the
    target, and grows as disparity collapses toward the far plane — the
    gradient that keeps low-parallax pretraining off the degenerate optimum
    (BASELINE.md depth-collapse finding)."""
    import jax

    target = jnp.asarray(rng.uniform(size=(B, H, W, 3)).astype(np.float32))
    inputs = {
        ("rgb", 0, 0): target,
        ("rgb", -1, 0): target,
        ("rgb", 1, 0): target,
        ("relative_distance", 0): jnp.ones(B),
        ("relative_distance", 1): jnp.ones(B),
    }

    def outputs_with(disp_val):
        return {
            ("rgb", -1, 0): target,
            ("rgb", 1, 0): target,
            ("disp", 0): jnp.full((B, H, W, 1), disp_val),
            ("translation", 0, -1): jnp.ones((B, 3)) / np.sqrt(3),
            ("translation", 0, 1): jnp.ones((B, 3)) / np.sqrt(3),
        }

    # off by default: no scale_prior_loss key
    base = total_loss(inputs, outputs_with(0.15), scales=(0,))
    assert "scale_prior_loss" not in base

    kw = dict(scales=(0,), scale_prior_weight=0.1, scale_prior_disp=0.15)
    at_target = total_loss(inputs, outputs_with(0.15), **kw)
    collapsing = total_loss(inputs, outputs_with(0.001), **kw)
    assert float(at_target["scale_prior_loss"]) < 1e-10
    assert float(collapsing["scale_prior_loss"]) > 1.0
    assert float(collapsing["loss"]) > float(at_target["loss"])

    # the gradient pushes a collapsing disparity back UP
    def prior_only(disp):
        l = total_loss(inputs, {**outputs_with(0.001), ("disp", 0): disp}, **kw)
        return l["loss"]

    g = jax.grad(prior_only)(jnp.full((B, H, W, 1), 0.001))
    assert float(np.asarray(g).mean()) < 0  # decrease loss by increasing disp


def test_depth_to_disp_round_trip():
    from tpuslam.geometry.depth import depth_to_disp, disp_to_depth

    for lo, hi in ((None, None), (0.1, None), (0.1, 80.0)):
        d = depth_to_disp(15.0, lo, hi)
        back = float(disp_to_depth(jnp.asarray(d), lo, hi))
        np.testing.assert_allclose(back, 15.0, rtol=1e-6)

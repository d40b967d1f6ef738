"""BACKWARD golden parity: jax gradients + one full adapt iteration vs torch.

VERDICT r4 #4: the forward golden tests (test_torch_golden.py,
test_torch_golden_nets.py) close the forward chain, but the "within 1% of
the PyTorch reference" clause hinges on the BACKWARD semantics SURVEY §7
flags as the hard part — gradients through frozen-BN encoders and
grid_sample, and the masked-Adam update itself
(/root/reference/depth_pose_prediction/depth_pose_prediction.py:291-319,
807-827, 1013-1017).  Two levels here:

1. d(total_loss)/d(disp pyramid, axisangle, translation) of the production
   `warp_and_loss` vs torch autograd through the independent reference
   pipeline (grid_sample backward, SSIM/min-reprojection/smoothness
   backward, velocity-loss backward).
2. ONE FULL ADAPT ITERATION — frozen eval-mode encoders (features hoisted
   + gradient-severed, the tpuslam design) vs torch requires_grad_(False)
   encoders, decoder forward, loss backward, and a masked Adam(1e-4) step —
   asserting the UPDATED DECODER PARAMETERS match.  This pins the exact
   semantics difference documented in train/steps.py: the reference leaves
   encoders in the graph with requires_grad=False; tpuslam severs them with
   stop_gradient.  Both yield identical DECODER updates (encoder grads are
   zero either way), which is what this test proves.

Identity tie-break noise is off on both sides (rng=None; SURVEY §7 'RNG
parity').  The jax side runs the pure XLA warp (W < 384 disables pallas) —
the pallas kernels' gradient parity vs the XLA path is covered separately
in tests/test_pallas_warp.py / test_pallas_fused.py.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax

import test_torch_golden as tg
from test_torch_golden_nets import (TDepthDecoder, TPoseDecoder, TResNet18,
                                    _randomize)

from tpuslam.train import LossConfig, make_frame_batch
from tpuslam.train.steps import warp_and_loss


def _to_t(x, grad=False):
    t = torch.from_numpy(np.asarray(x).copy())
    return t.requires_grad_() if grad else t


def _rel_err(got, want):
    got, want = np.asarray(got, np.float64), np.asarray(want, np.float64)
    denom = np.linalg.norm(want) + 1e-12
    return np.linalg.norm(got - want) / denom


def _near_tie_masks(data, ref_warped, scales, tol=2e-4, dilate=6):
    """Per-scale pixel masks where the min-reprojection's two smallest
    channels are within `tol` of each other, dilated by `dilate` px.

    Min-reprojection routes the gradient through the argmin channel, so
    at a NEAR-tie pixel a ~1e-6 float difference between torch's and
    jax's error maps (FMA/reduction order) selects DIFFERENT branches —
    an inherent property of the reference loss, not a semantic
    divergence (two differently-ordered CUDA builds of the reference
    diverge the same way).  The parity assertion excludes those pixels
    (plus a halo covering the SSIM pools / sampler / resize-transpose
    gradient spread) and separately bounds their total frequency."""
    from scipy.ndimage import binary_dilation

    target = torch.from_numpy(data["rgb_0"]).permute(0, 3, 1, 2)
    ident = torch.cat([
        tg.reprojection_t(
            torch.from_numpy(data[f"rgb_{f}"]).permute(0, 3, 1, 2), target)
        for f in (-1, 1)], 1)
    masks = {}
    for s in scales:
        reproj = torch.cat([
            tg.reprojection_t(ref_warped[(f, s)].detach(), target)
            for f in (-1, 1)], 1)
        c = torch.cat([ident, reproj], 1).detach().numpy()
        srt = np.sort(c, axis=1)
        tie = (srt[:, 1] - srt[:, 0]) < tol  # (B, H, W)
        masks[s] = np.stack([
            binary_dilation(t, iterations=dilate) for t in tie])
    return masks


def _downsample_any(mask, s):
    B, H, W = mask.shape
    f = 2 ** s
    return mask.reshape(B, H // f, f, W // f, f).any(axis=(2, 4))


def test_loss_gradients_match_torch_reference(rng):
    """d(loss)/d(disp_s, aa, tr) of warp_and_loss == torch autograd through
    the reference pipeline (reference backward semantics incl. grid_sample
    padding_mode='border' grid gradients and the min-reprojection mask).

    Documented tolerances: 2e-4 relative L2 AWAY from min-reprojection
    near-ties (see _near_tie_masks); 1e-2 globally and for the pose
    gradients, which integrate the tie-routing noise and cannot be
    masked (observed ~1.6e-3/3.8e-3)."""
    B, H, W, SCALES = tg.B, tg.H, tg.W, tg.SCALES
    cfg = LossConfig(scales=SCALES, min_depth=0.1, max_depth=100.0)
    data = tg._make_data(rng)

    # ---- torch side: autograd through the reference pipeline -------------
    leaves = {f"disp_{s}": _to_t(data[f"disp_{s}"], grad=True) for s in SCALES}
    leaves["aa"] = _to_t(data["aa"], grad=True)
    leaves["tr"] = _to_t(data["tr"], grad=True)
    ref_losses, ref_warped, _ = tg.reference_pipeline(data, cfg, leaves)
    ref_losses["loss"].backward()
    want = {k: v.grad.numpy() for k, v in leaves.items()}

    # ---- jax side: grad of the production warp_and_loss ------------------
    batch = make_frame_batch(
        np.stack([data["rgb_-1"], data["rgb_0"], data["rgb_1"]], axis=1),
        data["K"], data["rel_dist"], quantize=False,
    )
    pyramid = {s: jnp.asarray(data[f"pyr_{s}"]) for s in SCALES}

    def loss_fn(disps, aa, tr):
        losses, _ = warp_and_loss(
            {("disp", s): disps[s] for s in SCALES}, aa, tr, batch, cfg,
            rng=None, pyramid=pyramid,
        )
        return losses["loss"]

    g_disps, g_aa, g_tr = jax.grad(loss_fn, argnums=(0, 1, 2))(
        {s: jnp.asarray(data[f"disp_{s}"]) for s in SCALES},
        jnp.asarray(data["aa"]), jnp.asarray(data["tr"]),
    )

    masks = _near_tie_masks(data, ref_warped, SCALES)
    for s in SCALES:
        got, w = np.asarray(g_disps[s])[..., 0], want[f"disp_{s}"][..., 0]
        keep = ~_downsample_any(masks[s], s)
        # the 6-px halo is large relative to the 32x64 test image and a
        # coarse scale's cells aggregate whole halo regions, so the tight
        # tie-free assertion applies only where coverage survives; scale 0
        # (full resolution, the dominant gradient) must always qualify
        if s == 0:
            assert keep.mean() > 0.5, "tie mask ate the full-res image"
        if keep.mean() > 0.5:
            err = _rel_err(got[keep], w[keep])
            assert err < 2e-4, (f"disp_{s} tie-free grad rel err {err}")
        assert _rel_err(got, w) < 1e-2, f"disp_{s} global grad rel err"
    assert _rel_err(g_aa, want["aa"]) < 1e-2
    assert _rel_err(g_tr, want["tr"]) < 1e-2


# --------------------------------------------------------------------------
# full adapt iteration (frozen encoders + masked Adam)
# --------------------------------------------------------------------------
NH, NW = 64, 128  # network-shaped (divisible by 32); W<384 => XLA warp path


@pytest.fixture
def nets():
    return (_randomize(TResNet18(), seed=11),
            _randomize(TDepthDecoder(), seed=12),
            _randomize(TResNet18(num_input_images=2), seed=13),
            _randomize(TPoseDecoder(), seed=14))


def _import_all(tenc, tdec, tpenc, tpdec):
    from tpuslam.checkpoint.torch_import import (_import_depth_decoder,
                                                 _import_pose_decoder,
                                                 _import_resnet)

    params, stats = {}, {}
    params["depth_encoder"], stats["depth_encoder"] = _import_resnet(
        tenc.state_dict(), prefix="")
    params["pose_encoder"], stats["pose_encoder"] = _import_resnet(
        tpenc.state_dict(), prefix="")
    params["depth_decoder"] = _import_depth_decoder(tdec.state_dict())
    params["pose_decoder"] = _import_pose_decoder(tpdec.state_dict())
    return params, stats


@pytest.mark.slow
def test_full_adapt_iteration_matches_torch(rng, nets):
    """One adaptation iteration end-to-end: frozen-BN encoder features ->
    decoders -> warp+loss -> backward -> masked Adam(1e-4) step.  The
    updated depth- and pose-decoder parameters must match torch's to float
    precision (encoders by construction unchanged on both sides)."""
    from tpuslam.checkpoint.torch_import import (_import_depth_decoder,
                                                 _import_pose_decoder)
    from tpuslam.losses.photometric import identity_reprojection
    from tpuslam.models.depth_pose import DepthPoseNet
    from tpuslam.train import make_adapt_optimizer, make_train_state
    from tpuslam.train.steps import (_decode_and_loss, _frozen_features,
                                     _image_pyramid)

    tenc, tdec, tpenc, tpdec = nets
    B = 2
    cfg = LossConfig(scales=(0, 1, 2, 3), min_depth=0.1, max_depth=100.0)
    frames = rng.uniform(0.05, 0.95, (B, 3, NH, NW, 3)).astype(np.float32)
    for _ in range(2):  # band-limit like _make_data
        frames = (frames + np.roll(frames, 1, 2) + np.roll(frames, 1, 3)
                  + np.roll(frames, 2, 3)) / 4
    frames = frames.astype(np.float32)
    K = np.array([[0.58 * NW, 0, 0.5 * NW, 0], [0, 1.92 * NH, 0.5 * NH, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
    K = np.broadcast_to(K, (B, 4, 4)).copy()
    rel_dist = rng.uniform(0.5, 2.0, (B, 2)).astype(np.float32)

    # ---- jax: one scan-iteration body (rng=None => no tie-break noise) ----
    params, stats = _import_all(tenc, tdec, tpenc, tpdec)
    model = DepthPoseNet()
    batch = make_frame_batch(frames, K, rel_dist, quantize=False)
    tx = make_adapt_optimizer(params, 1e-4)
    state = make_train_state(params, stats, tx)
    depth_feats, pose_feat = _frozen_features(model, params, stats, batch)
    identity_base = identity_reprojection({
        ("rgb", 0, 0): batch.frame(0),
        ("rgb", -1, 0): batch.frame(-1),
        ("rgb", 1, 0): batch.frame(1),
    })
    pyramid = _image_pyramid(batch.frame(0), len(cfg.scales))

    def loss_fn(p):
        losses, _ = _decode_and_loss(
            model, p, stats, batch, cfg, depth_feats, pose_feat,
            rng=None, identity_base=identity_base, pyramid=pyramid,
        )
        return losses["loss"]

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, _ = tx.update(grads, state.opt_state, params)
    new_params = optax.apply_updates(params, updates)
    # frozen encoders: gradient never built, params bit-identical
    chex_all_zero = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool((a == b).all()),
        new_params["depth_encoder"], params["depth_encoder"]))
    assert chex_all_zero

    # ---- torch: the reference's loop body --------------------------------
    for m in (tenc, tpenc):
        for p in m.parameters():
            p.requires_grad_(False)
    x0 = torch.from_numpy(frames[:, 1]).permute(0, 3, 1, 2)
    pair_prev = torch.from_numpy(
        np.concatenate([frames[:, 0], frames[:, 1]], axis=-1)
    ).permute(0, 3, 1, 2)
    pair_next = torch.from_numpy(
        np.concatenate([frames[:, 1], frames[:, 2]], axis=-1)
    ).permute(0, 3, 1, 2)
    feats = tenc(x0)
    pfeat = tpenc(torch.cat([pair_prev, pair_next], dim=0))[-1]
    disps_t = tdec(feats)
    aa_t, tr_t = tpdec(pfeat)
    aa_t, tr_t = aa_t[:, 0, 0], tr_t[:, 0, 0]  # production pose_decode [:, 0]

    # loss through the reference pipeline, with the on-device mean-pool
    # pyramid (steps.py builds it in-graph; smoothness inputs must match)
    data = {f"rgb_{f}": frames[:, i] for i, f in ((0, -1), (1, 0), (2, 1))}
    data["K"] = K
    data["rel_dist"] = rel_dist
    pyr_t = {0: torch.from_numpy(frames[:, 1]).permute(0, 3, 1, 2)}
    for s in (1, 2, 3):
        pyr_t[s] = torch.nn.functional.avg_pool2d(pyr_t[s - 1], 2)
    leaves = {"aa": aa_t, "tr": tr_t}
    for s in (0, 1, 2, 3):
        # reference_pipeline permutes NHWC->NCHW; hand it NHWC views of the
        # decoder's NCHW outputs so the graph is preserved
        leaves[f"disp_{s}"] = disps_t[("disp", s)].permute(0, 2, 3, 1)
        leaves[f"pyr_{s}"] = pyr_t[s].permute(0, 2, 3, 1)
    tg_B, tg_H, tg_W = tg.B, tg.H, tg.W
    try:
        tg.B, tg.H, tg.W = B, NH, NW
        ref_losses, _, _ = tg.reference_pipeline(data, cfg, leaves)
    finally:
        tg.B, tg.H, tg.W = tg_B, tg_H, tg_W
    assert abs(float(loss) - float(ref_losses["loss"].detach())) < 2e-5

    opt = torch.optim.Adam(
        list(tdec.parameters()) + list(tpdec.parameters()), lr=1e-4)
    opt.zero_grad()
    ref_losses["loss"].backward()
    # grab the torch GRADIENTS in flax layout (the importers map a
    # state_dict-shaped dict; feed them p.grad instead of p)
    want_g_depth = _import_depth_decoder(
        {k: p.grad for k, p in tdec.named_parameters()})
    want_g_pose = _import_pose_decoder(
        {k: p.grad for k, p in tpdec.named_parameters()})
    opt.step()
    want_depth = _import_depth_decoder(tdec.state_dict())
    want_pose = _import_pose_decoder(tpdec.state_dict())

    # Two-level comparison (documented tolerances):
    # - GRADIENTS per leaf: rel L2 < 5e-3 (min-reprojection near-tie
    #   routing contributes a few 1e-3 — see _near_tie_masks; away from
    #   ties the agreement is float-level).
    # - ADAM UPDATES per leaf, restricted to components whose torch
    #   gradient is confidently nonzero (|g| > 1e-3 * rms(g)): Adam
    #   normalises a ~1e-8 noise-level gradient component to a FULL
    #   +-lr first step whose sign is float noise, so unrestricted
    #   update comparison measures noise, not parity.
    all_got, all_want = [], []
    for head, want_tree, want_g in (
            ("depth_decoder", want_depth, want_g_depth),
            ("pose_decoder", want_pose, want_g_pose)):
        flat_new = jax.tree_util.tree_leaves_with_path(new_params[head])
        flat_old = dict(jax.tree_util.tree_leaves_with_path(params[head]))
        flat_want = dict(jax.tree_util.tree_leaves_with_path(want_tree))
        flat_gw = dict(jax.tree_util.tree_leaves_with_path(want_g))
        flat_gj = dict(jax.tree_util.tree_leaves_with_path(grads[head]))
        for path, new_leaf in flat_new:
            key = (head, jax.tree_util.keystr(path))
            gw, gj = np.asarray(flat_gw[path]), np.asarray(flat_gj[path])
            assert _rel_err(gj, gw) < 5e-3, (key, _rel_err(gj, gw))
            u_got = np.asarray(new_leaf) - np.asarray(flat_old[path])
            u_want = np.asarray(flat_want[path]) - np.asarray(flat_old[path])
            conf = np.abs(gw) > 1e-3 * np.sqrt((gw ** 2).mean())
            assert conf.any(), key
            err = _rel_err(u_got[conf], u_want[conf])
            assert err < 1.5e-2, (key, err)
            all_got.append(u_got[conf].ravel())
            all_want.append(u_want[conf].ravel())
    total = _rel_err(np.concatenate(all_got), np.concatenate(all_want))
    assert total < 5e-3, f"aggregate update rel err {total}"

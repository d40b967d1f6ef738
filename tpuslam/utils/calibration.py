"""Per-op-class device calibration: measured time vs roofline speed-of-light.

The dev TPU attachment (axon relay) runs ~100x slower than native v5e
silicon, and the slowdown is NOT uniform across op classes — convs, gathers,
Pallas kernels and elementwise sweeps each carry different relay factors, so
a single-matmul calibration cannot justify a native-throughput projection.
This module benchmarks each op class OF THE ADAPT STEP at its real shapes
(192x640, batch 3), pulls FLOPs/bytes from XLA's cost analysis, and computes
the v5e speed-of-light time for each:

    sol_ms = max(flops / PEAK_FLOPS, bytes / PEAK_HBM_BW)

The per-class relay factor (= measured_ms / sol_ms) shows how far each class
is from the hardware ceiling on this attachment; the projected-native table
entry is the sol time divided by an MXU/VPU efficiency assumption.  Running
`python -m tpuslam.utils.calibration` prints the table (recorded in
BASELINE.md).

Timing discipline: chained dependent calls + a scalar readback to sync
(`block_until_ready` does not block on the relay — CLAUDE.md).
"""
from __future__ import annotations

import time
from typing import Dict, List, Optional

import numpy as np

# v5e public specs: 197 TFLOP/s bf16 (MXU), ~0.5x for f32 passes, 819 GB/s HBM
PEAK_FLOPS_BF16 = 197e12
PEAK_FLOPS_F32 = 98.5e12
PEAK_HBM_GBS = 819e9
# realistic sustained efficiency for conv/gather-heavy workloads
ASSUMED_EFFICIENCY = 0.4


def _time_chained(fn, args, repeats: int = 6) -> float:
    """ms per call, chained through a donated/updated first arg when the fn
    returns one, else re-invoked on identical inputs; scalar-readback sync."""
    out = fn(*args)
    out = fn(*args)  # compile + warm

    def sync(o):
        leaf = o
        while isinstance(leaf, (tuple, list, dict)):
            leaf = list(leaf.values())[0] if isinstance(leaf, dict) else leaf[0]
        np.asarray(leaf).ravel()[:1]

    sync(out)
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / repeats * 1e3


def _cost(fn, *args) -> Dict[str, float]:
    """FLOPs and HBM bytes from XLA's compiled cost analysis."""
    import jax

    try:
        an = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(an, list):
            an = an[0]
        return {
            "flops": float(an.get("flops", 0.0)),
            "bytes": float(an.get("bytes accessed", 0.0)),
        }
    except Exception:
        return {"flops": float("nan"), "bytes": float("nan")}


def calibrate(
    height: int = 192,
    width: int = 640,
    batch_size: int = 3,
    repeats: int = 6,
    seed: int = 0,
    classes: Optional[List[str]] = None,
) -> List[Dict]:
    """Benchmark each adapt-step op class; returns one row dict per class."""
    import jax
    import jax.numpy as jnp
    import optax

    from tpuslam.geometry.camera import bilinear_sampler
    from tpuslam.models import init_depth_pose
    from tpuslam.models.depth_pose import DepthPoseNet
    from tpuslam.ops.pallas_warp import pallas_warp_static
    from tpuslam.train import (
        LossConfig,
        concat_batches,
        make_adapt_optimizer,
        make_frame_batch,
        make_train_state,
    )
    from tpuslam.train.steps import _frozen_features, warp_and_loss

    rng = np.random.default_rng(seed)
    H, W, B = height, width, batch_size
    model, variables = init_depth_pose(jax.random.PRNGKey(seed), height=H, width=W)
    params, stats = variables["params"], variables["batch_stats"]
    Kmat = np.array(
        [[0.58 * W, 0, 0.5 * W, 0], [0, 1.92 * H, 0.5 * H, 0],
         [0, 0, 1, 0], [0, 0, 0, 1]], np.float32,
    )

    def mkbatch(n):
        return make_frame_batch(
            rng.uniform(size=(n, 3, H, W, 3)).astype(np.float32),
            Kmat,
            rng.uniform(0.5, 2.0, size=(n, 2)).astype(np.float32),
        )

    training = concat_batches(mkbatch(1), mkbatch(B - 1)) if B > 1 else mkbatch(1)
    cfg = LossConfig()
    interpret = jax.default_backend() not in ("tpu",)

    # hoisted features once (inputs for the decoder classes)
    depth_feats, pose_feat = _frozen_features(model, params, stats, training)
    depth_feats = [jnp.asarray(f) for f in depth_feats]

    # decoder fwd
    def dec_fwd(params):
        vs = {"params": params, "batch_stats": stats}
        disps = model.apply(vs, depth_feats, method=DepthPoseNet.depth_decode)
        aa, tr = model.apply(vs, pose_feat, method=DepthPoseNet.pose_decode)
        return disps[("disp", 0)].sum() + aa.sum() + tr.sum()

    # decoder+warp+loss fwd/bwd — the whole per-iteration slope
    def iter_fwd_bwd(params):
        def loss_fn(p):
            vs = {"params": p, "batch_stats": stats}
            disps = model.apply(vs, depth_feats, method=DepthPoseNet.depth_decode)
            aa, tr = model.apply(vs, pose_feat, method=DepthPoseNet.pose_decode)
            losses, _ = warp_and_loss(disps, aa, tr, training, cfg, rng=None)
            return losses["loss"]

        return jax.value_and_grad(loss_fn)(params)

    # encoders (frozen, once per frame)
    def encoders(p):
        df, pf = _frozen_features(model, p, stats, training)
        return df[-1].sum() + pf.sum()

    # warp kernels at the real fused shape (2 frames x 4 scales x B)
    src = jnp.asarray(
        rng.uniform(size=(8 * B, H, W, 3)).astype(np.float32)
    )
    coords = jnp.asarray(
        (rng.uniform(size=(8 * B, H, W, 2)) * [W - 1, H - 1]).astype(np.float32)
    )

    def warp_pallas_fb(src, coords):
        def f(c):
            return pallas_warp_static(src, c, interpret).sum()

        return jax.value_and_grad(f)(coords)

    def warp_xla_fb(src, coords):
        def f(c):
            return bilinear_sampler(src, c).sum()

        return jax.value_and_grad(f)(coords)

    def warp_pallas_packed_fb(src, coords):
        def f(c):
            return pallas_warp_static(src, c, interpret, 1, False, True).sum()

        return jax.value_and_grad(f)(coords)

    def warp_pallas_segskip_fb(src, coords):
        def f(c):
            return pallas_warp_static(
                src, c, interpret, 1, False, False, True
            ).sum()

        return jax.value_and_grad(f)(coords)

    from tpuslam.ops.pallas_warp import (pallas_warp_static_fused,
                                         pallas_warp_tall)

    def warp_pallas_fused_fb(src, coords):
        def f(c):
            return pallas_warp_static_fused(src, c, interpret, 2, True).sum()

        return jax.value_and_grad(f)(coords)

    src2 = src[: 2 * B]  # deduped sources for the tall kernel

    def warp_tall_fb(src2, coords):
        def f(c):
            return pallas_warp_tall(src2, c, interpret, 4).sum()

        return jax.value_and_grad(f)(coords)

    # fused reprojection-error kernel at the real warp-stack shape
    from tpuslam.ops.pallas_loss import pallas_reproj_err

    loss_target = jnp.asarray(
        rng.uniform(size=(B, H, W, 3)).astype(np.float32)
    )

    def loss_pallas_fb(preds, target):
        def f(p):
            return pallas_reproj_err(p, target, interpret).sum()

        return jax.value_and_grad(f)(preds)

    # loss fwd+bwd alone (warped preds given): the non-warp, non-conv slice
    # of the per-iteration cost — sizes the fused-loss-kernel opportunity
    from tpuslam.losses.photometric import total_loss

    loss_inputs = {("rgb", f, 0): jnp.asarray(
        rng.uniform(size=(B, H, W, 3)).astype(np.float32)) for f in (0, -1, 1)}
    for s in (1, 2, 3):
        loss_inputs[("rgb", 0, s)] = jnp.asarray(
            rng.uniform(size=(B, H // 2**s, W // 2**s, 3)).astype(np.float32))
    for f in (0, 1):
        loss_inputs[("relative_distance", f)] = jnp.asarray(
            rng.uniform(0.5, 2.0, size=(B,)).astype(np.float32))
    loss_outputs = {}
    for s in (0, 1, 2, 3):
        for f in (-1, 1):
            loss_outputs[("rgb", f, s)] = jnp.asarray(
                rng.uniform(size=(B, H, W, 3)).astype(np.float32))
        loss_outputs[("disp", s)] = jnp.asarray(
            rng.uniform(0.01, 1.0, size=(B, H // 2**s, W // 2**s, 1)).astype(np.float32))
    for f in (-1, 1):
        loss_outputs[("translation", 0, f)] = jnp.asarray(
            rng.uniform(size=(B, 3)).astype(np.float32))

    def loss_fwd_bwd(outputs):
        def f(o):
            return total_loss(loss_inputs, o, scales=(0, 1, 2, 3))["loss"]

        return jax.value_and_grad(f)(outputs)

    # Adam update on the decoder-masked tree (the adapt optimizer)
    tx = make_adapt_optimizer(params, 1e-4)
    state = make_train_state(params, stats, tx)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)

    def adam(opt_state, grads, params):
        updates, new_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_state

    # one big bf16 matmul — the historical single-point calibration, kept as
    # a reference row
    a16 = jnp.asarray(rng.uniform(size=(4096, 4096)).astype(np.float32)).astype(
        jnp.bfloat16
    )

    def matmul_bf16(a):
        return (a @ a).sum()

    table = [
        ("matmul_bf16_4096", jax.jit(matmul_bf16), (a16,), PEAK_FLOPS_BF16),
        ("encoder_fwd", jax.jit(encoders), (params,), PEAK_FLOPS_F32),
        ("decoder_fwd", jax.jit(dec_fwd), (params,), PEAK_FLOPS_F32),
        ("iter_fwd_bwd", jax.jit(iter_fwd_bwd), (params,), PEAK_FLOPS_F32),
        ("loss_fwd_bwd", jax.jit(loss_fwd_bwd), (loss_outputs,), PEAK_FLOPS_F32),
        ("warp_pallas_fwd_bwd", jax.jit(warp_pallas_fb), (src, coords), PEAK_FLOPS_F32),
        ("warp_pallas_packed_fwd_bwd", jax.jit(warp_pallas_packed_fb),
         (src, coords), PEAK_FLOPS_F32),
        ("warp_pallas_segskip_fwd_bwd", jax.jit(warp_pallas_segskip_fb),
         (src, coords), PEAK_FLOPS_F32),
        ("warp_pallas_fused_fwd_bwd", jax.jit(warp_pallas_fused_fb),
         (src, coords), PEAK_FLOPS_F32),
        ("warp_tall_fwd_bwd", jax.jit(warp_tall_fb),
         (src2, coords), PEAK_FLOPS_F32),
        ("loss_pallas_fwd_bwd", jax.jit(loss_pallas_fb),
         (src, loss_target), PEAK_FLOPS_F32),
        ("warp_xla_fwd_bwd", jax.jit(warp_xla_fb), (src, coords), PEAK_FLOPS_F32),
        ("adam_update", jax.jit(adam), (state.opt_state, grads, params), PEAK_FLOPS_F32),
    ]
    ana = analytic_bytes(height, width, batch_size, len(cfg.scales))
    rows = []
    for name, fn, args, peak in table:
        if classes is not None and name not in classes:
            continue
        ms = _time_chained(fn, args, repeats=repeats)
        cost = _cost(fn, *args)
        sol_flops_ms = cost["flops"] / peak * 1e3
        # XLA's `bytes accessed` is fusion-blind (sums every HLO operand as
        # if it round-tripped HBM; ~250x overcount on gathers) — kept as the
        # upper-bound column; the roofline uses the analytic fused traffic
        ana_b = ana.get(name)
        ana_sol_ms = (ana_b / PEAK_HBM_GBS * 1e3) if ana_b else float("nan")
        sol_ms = (
            max(sol_flops_ms, ana_sol_ms)
            if ana_b
            else max(sol_flops_ms, cost["bytes"] / PEAK_HBM_GBS * 1e3)
        )
        rows.append(
            {
                "class": name,
                "measured_ms": round(ms, 3),
                "gflops": round(cost["flops"] / 1e9, 2),
                "xla_gbytes_ub": round(cost["bytes"] / 1e9, 3),
                "ana_gbytes": round(ana_b / 1e9, 3) if ana_b else float("nan"),
                "sol_ms": round(sol_ms, 4),
                "bound": "hbm" if sol_ms > sol_flops_ms else "mxu",
                "relay_factor": round(ms / sol_ms, 1) if sol_ms > 0 else float("nan"),
                "proj_native_ms": round(sol_ms / ASSUMED_EFFICIENCY, 3),
            }
        )
    return rows


def analytic_bytes(height: int = 192, width: int = 640, batch: int = 3,
                   scales: int = 4, dtype_bytes: int = 4,
                   extra_tiles: int = 2, out_dtype_bytes: int = 4,
                   ) -> Dict[str, float]:
    """Analytic FUSED HBM traffic per op class (bytes), assuming XLA fuses
    elementwise chains so only stage inputs/outputs/weights round-trip HBM.

    This replaces XLA's fusion-blind `bytes accessed` (which counts every
    HLO operand as if it hit HBM — a ~250x overcount on gathers, see
    BASELINE.md) with a lower-bound inventory of what MUST move:
    weights + each conv's input/output activations for the CNNs, source
    image + coords + output for the warp, pred/target maps + loss surfaces
    for the loss, and 4x params (p, g, m, v read + write) for Adam.  True
    traffic sits between this bound and ~2x of it (imperfect fusion,
    padding); the roofline in BASELINE.md uses it with a 40% efficiency
    assumption.

    Round-4 honesty fix: the WINDOWED Pallas warp kernels DMA a
    (out_h + 16*extra_tiles, 384) source window per (8, 128) output tile —
    a ~15x read amplification of the source stack at the shipped
    extra_tiles=2 that earlier inventories omitted.  That amplified window
    traffic (~530 MB/iter at 192x640 batch 3), not gather arithmetic, is
    what bounds the windowed kernel natively; the `warp_tall` class keys
    the window by (image, column stripe) instead (~26 MB) and dedups the
    scale-tiled sources.  `out_dtype_bytes=2` models `pallas_bf16_out`."""
    B, H, W, D = batch, height, width, dtype_bytes
    OD = out_dtype_bytes
    img = H * W * 3 * D

    def resnet18_acts(h, w, b):
        # conv1 -> maxpool -> 4 stages x 2 basic blocks (2 convs each);
        # traffic = in + out of every conv (NHWC), plus the residual adds'
        # extra read of the skip tensor
        t = b * (h * w * 3 + h // 2 * (w // 2) * 64) * D          # conv1
        t += b * (h // 2 * (w // 2) * 64 + h // 4 * (w // 4) * 64) * D  # pool
        for stage, (ch, red) in enumerate([(64, 4), (128, 8), (256, 16), (512, 32)]):
            hw = (h // red) * (w // red)
            per_conv = b * hw * ch * 2 * D
            t += 4 * per_conv + 2 * b * hw * ch * D  # 4 convs + 2 skip reads
        return t

    resnet_w = 11.7e6 * D  # ~11.7M params per ResNet18 encoder
    encoders = (
        resnet18_acts(H, W, B)            # depth encoder, batch B
        + resnet18_acts(H, W, 2 * B)      # pose encoder, doubled batch, 6ch stem
        + 2 * resnet_w
    )

    # depth decoder: 5 upconv levels x 2 convs, channels 256..16, at
    # H/16..H resolutions, plus skip reads and `scales` disp heads
    dec = 0.0
    for ch, red in [(256, 16), (128, 8), (64, 4), (32, 2), (16, 1)]:
        hw = (H // red) * (W // red)
        dec += B * hw * ch * 2 * 2 * D + B * hw * ch * D  # 2 convs + skip
    dec += scales * B * H * W * 1 * 2 * D                 # disp heads (approx)
    dec += 3.2e6 * D                                      # decoder weights
    pose_dec = B * (H // 32) * (W // 32) * 256 * 6 * D + 1.6e6 * D

    maps = 2 * scales * B                                 # warped full-res maps
    coords = maps * H * W * 2 * D                         # f32 pixel coords
    out_img = H * W * 3 * OD                              # stored warp outputs

    # windowed kernels: source window DMA per (8, 128) output tile
    out_h = 8
    win_ampl = (out_h + 16 * extra_tiles) * 384 / (out_h * 128)
    src_windows = maps * img * win_ampl
    # full-height stripe kernel: one (H, 384) window per (source image,
    # column stripe); sources deduped to the 2B distinct frames
    src_stripes = 2 * B * (W // 128) * (H * 384 * 3 * D)

    # two-kernel windowed path: fwd (windows+coords+out) + bwd kernel
    # (windows+coords again + incoming g + dcoords out)
    warp_two = (src_windows + coords + maps * out_img) + (
        src_windows + coords + maps * out_img + coords
    )
    # fused-grad windowed: fwd stores out+dx+dy; VJP is an XLA contraction
    # reading dx, dy, g(=dpred) and writing dcoords — no second sweep
    warp_fused = (src_windows + coords + 3 * maps * out_img) + (
        2 * maps * out_img + maps * out_img + coords
    )
    # tall fused: stripe windows replace the amplified tile windows
    warp_tall = (src_stripes + coords + 3 * maps * out_img) + (
        2 * maps * out_img + maps * out_img + coords
    )
    # composite fused backward (ops/pallas_fused.py): warp + loss fwd as
    # above, ONE bwd kernel reading pred + target + g_err + dx + dy and
    # writing only the (maps, 2, H, W) coordinate cotangent — the dpred
    # stack and its re-read disappear entirely
    err_maps = maps * H * W * 4
    warp_loss_fused_bwd = (
        # fwd: warp (stripes + coords + out/dx/dy) + loss (pred, target, err)
        src_stripes + coords + 3 * maps * out_img
        + maps * out_img + B * img + err_maps
        # bwd: one kernel reads pred/target/g/dx/dy, writes the coordinate
        # cotangent; the live-mask elementwise fuses into the dcoords
        # consumer (same convention as the two-op entries above)
        + maps * out_img + B * img + err_maps + 2 * maps * out_img
        + coords
    )
    # in-kernel projection (pallas_proj): the kernel reads the (S*B, H, W)
    # depth blocks (each pixel once per direction) + 12 SMEM scalars per
    # sample instead of the materialised coordinate field; the bwd chain
    # re-reads depth and writes d(depth) around the same dc cotangent
    depth_k = scales * B * H * W * D
    warp_loss_fused_bwd_proj = (
        src_stripes + 2 * depth_k + 3 * maps * out_img
        + maps * out_img + B * img + err_maps
        + maps * out_img + B * img + err_maps + 2 * maps * out_img
        + coords  # dc cotangent write + chain read (unchanged layout)
    )

    # XLA loss: 8 pred reads + 8 target reads + identity (2) + per-pixel
    # loss surfaces fwd/bwd (~3x input traffic for SSIM stats + automask)
    loss = 3 * (maps + 2) * img + maps * H * W * D
    # fused loss kernel: preds read once (fwd + bwd recompute), targets
    # DMA'd once per batch row each pass, err maps + g + dpred
    loss_fused = (maps * out_img + B * img + maps * H * W * 4) + (
        maps * out_img + B * img + maps * H * W * 4 + maps * out_img
    )

    iter_fb = 2.2 * (dec + pose_dec) + warp_two + loss    # bwd ~1.2x fwd convs
    adam = 4 * 2 * (3.2e6 + 1.6e6) * D                    # m,v,p,g r/w decoder tree
    return {
        "encoder_fwd": encoders,
        "decoder_fwd": dec + pose_dec,
        "iter_fwd_bwd": iter_fb,
        "warp_pallas_fwd_bwd": warp_two,
        # the packed/seg-skip variants move the SAME bytes — they cut
        # in-register gather work, not HBM traffic
        "warp_pallas_packed_fwd_bwd": warp_two,
        "warp_pallas_segskip_fwd_bwd": warp_two,
        "warp_pallas_fused_fwd_bwd": warp_fused,
        "warp_tall_fwd_bwd": warp_tall,
        "warp_loss_fused_bwd": warp_loss_fused_bwd,
        "warp_loss_fused_bwd_proj": warp_loss_fused_bwd_proj,
        "loss_fwd_bwd": loss,
        "loss_pallas_fwd_bwd": loss_fused,
        "adam_update": adam,
        # supporting XLA stages of the fused pipeline (for the composed
        # projection): coordinate production fwd+bwd, min-mask/smoothness
        "coords_fwd_bwd": 4 * (scales * B * H * W * (1 + 3 + 2) * D),
        # with pallas_proj the XLA stage shrinks to the depth re-read +
        # d(depth) write of the VJP chain (the affine maps are ~bytes)
        "coords_fwd_bwd_proj": 2 * depth_k,
        "mask_smooth": 3 * maps * H * W * 4 + 2 * B * img,
    }


def project_native_fps(rows: List[Dict], adapt_iters: int = 5) -> Dict[str, float]:
    """Projected native v5e frame time from the per-class roofline: fixed
    (encoders) + K x per-iteration (decoder fwd/bwd + warp + loss + Adam).
    `iter_fwd_bwd` already contains the warp+loss, so the composition is
    encoders + K * (iter_fwd_bwd + adam)."""
    by = {r["class"]: r for r in rows}
    try:
        fixed = by["encoder_fwd"]["proj_native_ms"]
        per_iter = by["iter_fwd_bwd"]["proj_native_ms"] + by["adam_update"]["proj_native_ms"]
    except KeyError:
        return {}
    frame_ms = fixed + adapt_iters * per_iter
    return {
        "proj_native_fixed_ms": round(fixed, 3),
        "proj_native_per_iter_ms": round(per_iter, 3),
        "proj_native_frame_ms": round(frame_ms, 3),
        "proj_native_fps": round(1e3 / frame_ms, 1),
    }


# measured adapt-step conv FLOP counts at 192x640 batch 3 (BASELINE.md
# round-3 calibration table) — used by the analytic fused-pipeline
# projection when no measurement rows are available
_ENCODER_GFLOPS = 86.8
_DECODER_GFLOPS = 26.0


def project_native_fps_fused(
    adapt_iters: int = 5,
    bf16: bool = True,
    mxu_eff: float = 0.45,
    hbm_eff: float = 0.7,
    height: int = 192,
    width: int = 640,
    batch: int = 3,
    fused_bwd: bool = False,
    proj: bool = False,
) -> Dict[str, float]:
    """Analytic native-v5e projection for the ROUND-4 FUSED PIPELINE:
    tall column-stripe warp (deduped sources, fused gradient) + fused VMEM
    reprojection-error kernel + bf16 stored warp outputs + bf16 convs.

    Composed per frame as encoders + K * (decoders fwd/bwd + warp_tall +
    fused loss + coordinate production + mask/smoothness + Adam), each
    stage at max(FLOPs / MXU peak / mxu_eff, bytes / HBM peak / hbm_eff).
    Efficiency is PER CLASS: conv stages sustain ~40-50% of MXU peak
    (dominated by small spatial tiles and layer switches); the pallas /
    elementwise stages are long sequential HBM streams that sustain
    ~65-75% of bandwidth.  `bf16` halves conv ACTIVATION traffic too (the
    shipped bf16-conv default stores bf16 activations), not just compute.

    This is the roofline the round-4 kernels were built against: the
    windowed kernel's ~15x source-window amplification (the previous
    ~530 MB/iter residual) is gone and the loss slice no longer
    materialises pooled SSIM moments.  Conservative bracket = mxu_eff 0.4
    / hbm_eff 0.55; expected = 0.45 / 0.7."""
    ana = analytic_bytes(height, width, batch, 4,
                         out_dtype_bytes=2 if bf16 else 4)
    peak = PEAK_FLOPS_BF16 if bf16 else PEAK_FLOPS_F32
    act = 0.5 if bf16 else 1.0  # bf16 convs store bf16 activations

    def hbm_ms(name):
        return ana[name] / PEAK_HBM_GBS * 1e3 / hbm_eff

    enc_ms = max(_ENCODER_GFLOPS * 1e9 / peak * 1e3 / mxu_eff,
                 act * ana["encoder_fwd"] / PEAK_HBM_GBS * 1e3 / hbm_eff)
    dec_ms = max(_DECODER_GFLOPS * 2.2 * 1e9 / peak * 1e3 / mxu_eff,
                 act * ana["decoder_fwd"] * 2.2 / PEAK_HBM_GBS * 1e3 / hbm_eff)
    if fused_bwd and proj:
        # composite backward + in-kernel projection (pallas_proj): the
        # points/coords production and its round trips are gone too
        warp_loss = {"warp_loss": hbm_ms("warp_loss_fused_bwd_proj")}
    elif fused_bwd:
        # composite backward (ops/pallas_fused.py): warp + loss ride one
        # traffic class, the dpred round-trip is gone
        warp_loss = {"warp_loss": hbm_ms("warp_loss_fused_bwd")}
    else:
        warp_loss = {"warp": hbm_ms("warp_tall_fwd_bwd"),
                     "loss": hbm_ms("loss_pallas_fwd_bwd")}
    parts = {
        "dec": dec_ms,
        **warp_loss,
        "coords": hbm_ms("coords_fwd_bwd_proj" if proj
                         else "coords_fwd_bwd"),
        "mask_smooth": hbm_ms("mask_smooth"),
        "adam": hbm_ms("adam_update"),
    }
    per_iter = sum(parts.values())
    frame_ms = enc_ms + adapt_iters * per_iter
    return {
        "fused_proj_fixed_ms": round(enc_ms, 3),
        "fused_proj_per_iter_ms": round(per_iter, 3),
        "fused_proj_parts_ms": {k: round(v, 3) for k, v in parts.items()},
        "fused_proj_frame_ms": round(frame_ms, 3),
        "fused_proj_fps": round(1e3 / frame_ms, 1),
        "fused_proj_dtype": "bf16" if bf16 else "f32",
        "fused_proj_eff": (mxu_eff, hbm_eff),
    }


def frame_sol_ms(
    adapt_iters: int = 5,
    bf16: bool = True,
    tall: bool = False,
    fused_loss: bool = False,
    fused_bwd: bool = False,
    proj: bool = False,
    bf16_out: bool = False,
    extra_tiles: int = 2,
    height: int = 192,
    width: int = 640,
    batch: int = 3,
    mxu_eff: float = 1.0,
    hbm_eff: float = 1.0,
) -> float:
    """Analytic native-v5e frame time for an ARBITRARY bench.py flag combo.

    At the default efficiencies of 1.0 this is the per-frame speed of light
    (max(FLOPs/MXU peak, analytic fused bytes/HBM peak) per stage, summed
    over encoders + K iterations) — the denominator of bench.py's
    `roofline_frac`.  At (0.45, 0.7) it reproduces
    `project_native_fps_fused`'s expected bracket for the fused configs and
    extends it to the windowed default (fused-grad kernel + XLA loss).
    Generalises project_native_fps_fused so bench.py can report the
    projection FOR THE MEASURED CONFIG (VERDICT r4 #3)."""
    ana = analytic_bytes(height, width, batch, 4, extra_tiles=extra_tiles,
                         out_dtype_bytes=2 if bf16_out else 4)
    peak = PEAK_FLOPS_BF16 if bf16 else PEAK_FLOPS_F32
    act = 0.5 if bf16 else 1.0  # bf16 convs store bf16 activations

    def hbm_ms(name):
        return ana[name] / PEAK_HBM_GBS * 1e3 / hbm_eff

    # conv FLOP counts scale with pixel count vs the calibrated 192x640 ref
    px = (height * width) / (192 * 640) * (batch / 3)
    enc_ms = max(_ENCODER_GFLOPS * px * 1e9 / peak * 1e3 / mxu_eff,
                 act * ana["encoder_fwd"] / PEAK_HBM_GBS * 1e3 / hbm_eff)
    dec_ms = max(_DECODER_GFLOPS * px * 2.2 * 1e9 / peak * 1e3 / mxu_eff,
                 act * ana["decoder_fwd"] * 2.2 / PEAK_HBM_GBS * 1e3 / hbm_eff)
    if tall and fused_loss and fused_bwd and proj:
        warp_loss = hbm_ms("warp_loss_fused_bwd_proj")
    elif tall and fused_loss and fused_bwd:
        warp_loss = hbm_ms("warp_loss_fused_bwd")
    elif tall and fused_loss:
        warp_loss = hbm_ms("warp_tall_fwd_bwd") + hbm_ms("loss_pallas_fwd_bwd")
    elif tall:
        warp_loss = hbm_ms("warp_tall_fwd_bwd") + hbm_ms("loss_fwd_bwd")
    elif fused_loss:
        warp_loss = (hbm_ms("warp_pallas_fused_fwd_bwd")
                     + hbm_ms("loss_pallas_fwd_bwd"))
    else:  # shipped default: windowed fused-grad kernel + XLA loss
        warp_loss = (hbm_ms("warp_pallas_fused_fwd_bwd")
                     + hbm_ms("loss_fwd_bwd"))
    coords = hbm_ms("coords_fwd_bwd_proj" if proj else "coords_fwd_bwd")
    per_iter = (dec_ms + warp_loss + coords + hbm_ms("mask_smooth")
                + hbm_ms("adam_update"))
    return enc_ms + adapt_iters * per_iter


def main() -> None:
    rows = calibrate()
    header = ("class", "measured_ms", "gflops", "xla_gbytes_ub", "ana_gbytes",
              "sol_ms", "bound", "relay_factor", "proj_native_ms")
    print(" | ".join(header))
    for r in rows:
        print(" | ".join(str(r[k]) for k in header))
    proj = project_native_fps(rows)
    for k, v in proj.items():
        print(f"{k}: {v}")
    for bf16 in (False, True):
        for fused_bwd, proj in ((False, False), (True, False), (True, True)):
            for mxu, hbm in ((0.4, 0.55), (0.45, 0.7)):
                print(project_native_fps_fused(bf16=bf16, mxu_eff=mxu,
                                               hbm_eff=hbm,
                                               fused_bwd=fused_bwd,
                                               proj=proj))


if __name__ == "__main__":
    main()

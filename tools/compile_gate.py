"""Compiled-mode gate for every shipped Pallas kernel variant.

Interpret-mode tests cannot catch Mosaic lowering constraints (round 4
proved it: `pallas_proj` passed its interpret tests for a whole round while
crashing at Mosaic lowering on the relay — VERDICT r4 weak #1).  This gate
compiles each kernel variant fwd+bwd AT PRODUCTION SHAPE (192x640, batch 3,
4 scales) with `jit(...).lower(...).compile()` — compile only, no
execution, so one pass costs seconds even over the relay tunnel — and
reports PASS/FAIL per variant.

A kernel variant that fails this gate cannot be claimed "built" in
BASELINE.md.  Run it as the preamble of every relay session
(tools/relay_session.sh) and after any kernel edit:

    python tools/compile_gate.py                # all variants, production shape
    python tools/compile_gate.py --only tall_proj
    python tools/compile_gate.py --height 96 --width 320

Exit code: 0 all pass, 1 any variant fails.  Mosaic lowering only exists
for TPU targets — on a CPU backend every variant fails with "unsupported
backend", so the gate warns and exits 2 there; only the TPU (relay) run is
authoritative, and the relay's remote-compile Mosaic is the strictest
toolchain we target (no dynamic addressing, no partial SMEM blocks;
CLAUDE.md).
"""
from __future__ import annotations

import argparse
import json
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def _inputs(H, W, B, S, C, rng):
    """Production-shape operands for every variant (host numpy, cheap)."""
    N = 2 * S * B
    src = jnp.asarray(rng.uniform(size=(N, H, W, C)).astype(np.float32))
    src2 = jnp.asarray(rng.uniform(size=(2 * B, H, W, C)).astype(np.float32))
    coords = jnp.asarray(
        (rng.uniform(size=(N, H, W, 2)) * [W - 1, H - 1]).astype(np.float32)
    )
    depth = jnp.asarray(
        rng.uniform(1.0, 50.0, size=(S * B, H, W, 1)).astype(np.float32)
    )
    ab = jnp.asarray(rng.uniform(-1, 1, size=(2 * B, 12)).astype(np.float32))
    target = jnp.asarray(rng.uniform(size=(B, H, W, C)).astype(np.float32))
    return dict(src=src, src2=src2, coords=coords, depth=depth, ab=ab,
                target=target)


def build_variants(H, W, B, S, C):
    """name -> (fn, args): fn contains the variant's fwd AND custom-VJP bwd
    (value_and_grad through a scalar), so BOTH pallas_calls must lower."""
    from tpuslam.ops.pallas_fused import warp_reproj_err, warp_reproj_err_proj
    from tpuslam.ops.pallas_loss import pallas_reproj_err
    from tpuslam.ops.pallas_warp import (pallas_warp_static,
                                         pallas_warp_static_fused,
                                         pallas_warp_tall,
                                         pallas_warp_tall_proj)

    rng = np.random.default_rng(0)
    a = _inputs(H, W, B, S, C, rng)

    def grad_c(f):  # fwd+bwd w.r.t. coords
        return lambda src, coords: jax.value_and_grad(
            lambda c: f(src, c).astype(jnp.float32).sum())(coords)

    def grad_d(f):  # fwd+bwd w.r.t. (depth, ab) for the proj variants
        return lambda src, depth, ab: jax.value_and_grad(
            lambda d, m: f(src, d, m).astype(jnp.float32).sum(),
            argnums=(0, 1))(depth, ab)

    V = {}
    # shipped default: fused-grad windowed kernel, group_skip, extra_tiles 2
    V["static_fused_grad[default]"] = (
        grad_c(lambda s, c: pallas_warp_static_fused(s, c, False, 2, True)),
        (a["src"], a["coords"]))
    V["static_fused_bf16out"] = (
        grad_c(lambda s, c: pallas_warp_static_fused(s, c, False, 2, True,
                                                     True)),
        (a["src"], a["coords"]))
    # two-kernel windowed paths (opt-in A/B configs)
    V["static_groupskip"] = (
        grad_c(lambda s, c: pallas_warp_static(s, c, False, 2, False, False,
                                               False, True)),
        (a["src"], a["coords"]))
    V["static_dense"] = (
        grad_c(lambda s, c: pallas_warp_static(s, c, False, 1)),
        (a["src"], a["coords"]))
    V["static_packed"] = (
        grad_c(lambda s, c: pallas_warp_static(s, c, False, 1, False, True)),
        (a["src"], a["coords"]))
    V["static_segskip"] = (
        grad_c(lambda s, c: pallas_warp_static(s, c, False, 1, False, False,
                                               True)),
        (a["src"], a["coords"]))
    # tall column-stripe family (the native-roofline configuration)
    V["tall"] = (
        grad_c(lambda s, c: pallas_warp_tall(s, c, False, S)),
        (a["src2"], a["coords"]))
    V["tall_bf16out"] = (
        grad_c(lambda s, c: pallas_warp_tall(s, c, False, S, True)),
        (a["src2"], a["coords"]))
    V["tall_proj"] = (
        grad_d(lambda s, d, m: pallas_warp_tall_proj(s, d, m, False, S)),
        (a["src2"], a["depth"], a["ab"]))
    V["tall_proj_bf16out"] = (
        grad_d(lambda s, d, m: pallas_warp_tall_proj(s, d, m, False, S,
                                                     True)),
        (a["src2"], a["depth"], a["ab"]))
    # fused loss + composite backward
    V["reproj_err"] = (
        lambda preds, tgt: jax.value_and_grad(
            lambda p: pallas_reproj_err(p, tgt, False).sum())(preds),
        (a["src"], a["target"]))

    def fused(s, c, t):
        err, _ = warp_reproj_err(s, c, t, False, S, True)
        return err.sum()

    V["fused_bwd[tall+loss]"] = (
        lambda s, c, t: jax.value_and_grad(fused, argnums=1)(s, c, t),
        (a["src2"], a["coords"], a["target"]))

    def fused_proj(s, d, m, t):
        err, _ = warp_reproj_err_proj(s, d, m, t, False, S, True)
        return err.sum()

    V["fused_bwd_proj[full-stack]"] = (
        lambda s, d, m, t: jax.value_and_grad(
            fused_proj, argnums=(1, 2))(s, d, m, t),
        (a["src2"], a["depth"], a["ab"], a["target"]))
    return V


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=192)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--batch", type=int, default=3)
    ap.add_argument("--scales", type=int, default=4)
    ap.add_argument("--only", default=None,
                    help="substring filter on variant names")
    ap.add_argument("--run", action="store_true",
                    help="also execute each compiled variant once and check "
                         "finiteness (catches runtime-only Mosaic faults)")
    args = ap.parse_args()

    variants = build_variants(args.height, args.width, args.batch,
                              args.scales, 3)
    backend = jax.default_backend()
    print(f"compile gate: backend={backend} shape="
          f"{args.height}x{args.width} batch={args.batch} "
          f"scales={args.scales}", flush=True)
    if backend != "tpu":
        print("SKIP: Mosaic lowering requires a TPU backend — run this "
              "gate over the relay (see tools/relay_session3.sh)")
        sys.exit(2)
    results = {}
    for name, (fn, fargs) in variants.items():
        if args.only and args.only not in name:
            continue
        t0 = time.time()
        try:
            compiled = jax.jit(fn).lower(*fargs).compile()
            if args.run:
                out = compiled(*fargs)
                leaves = jax.tree_util.tree_leaves(out)
                ok = all(bool(jnp.isfinite(l).all()) for l in leaves)
                assert ok, "non-finite output"
            results[name] = "PASS"
            print(f"PASS  {name}  ({time.time() - t0:.1f}s)", flush=True)
        except Exception as e:
            head = str(e).splitlines()[0][:200] if str(e) else repr(e)[:200]
            results[name] = f"FAIL: {head}"
            print(f"FAIL  {name}  ({time.time() - t0:.1f}s)\n      {head}",
                  flush=True)
            if "--only" in sys.argv:
                traceback.print_exc()
    n_fail = sum(1 for v in results.values() if v != "PASS")
    print(json.dumps({"backend": backend, "pass": len(results) - n_fail,
                      "fail": n_fail, "results": results}))
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

"""Host-feed profile on a REAL-PNG KITTI fixture at 192x640 (VERDICT r4 #10).

Generates an on-disk KITTI-odometry-layout fixture with full-resolution
(1241x376, the odometry camera size) PNGs, then measures the per-frame host
feed through the production loader: decode+LANCZOS resize, FrameBatch
assembly, and host->device transfer (profile_host_pipeline) — with and
without the sliding-window decode cache (data/base.py::ImageCache).

Run on the 1-core dev box:  python tools/profile_kitti_host.py
Numbers recorded in BASELINE.md round 5.
"""
from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

SRC_W, SRC_H = 1241, 376  # KITTI odometry image_2 resolution
N_FRAMES = 26


def make_fixture(root: Path, n: int = N_FRAMES) -> Path:
    from datetime import datetime, timedelta

    from PIL import Image

    seq_dir = root / "sequences" / "04"
    (seq_dir / "image_2").mkdir(parents=True)
    (seq_dir / "oxts" / "data").mkdir(parents=True)
    (root / "poses").mkdir()
    rng = np.random.default_rng(0)
    base_t = datetime(2011, 9, 30, 12, 0, 0)
    ts_lines, poses = [], []
    T = np.eye(4)
    # band-limited texture so the PNGs compress like road scenes
    base = rng.uniform(0, 255, (SRC_H // 4, SRC_W // 4, 3)).astype(np.float32)
    for i in range(n):
        img = np.asarray(
            Image.fromarray(base.astype(np.uint8)).resize(
                (SRC_W, SRC_H), Image.BILINEAR
            ),
            np.float32,
        )
        img += rng.uniform(0, 30, img.shape)  # per-frame variation
        Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(
            seq_dir / "image_2" / f"{i:06d}.png"
        )
        base = np.roll(base, 3, axis=1)  # simulated forward motion
        fields = np.zeros(30)
        fields[8:11] = [3.0, 4.0, 0.0]  # 5 m/s
        np.savetxt(seq_dir / "oxts" / "data" / f"{i:010d}.txt", fields[None])
        ts_lines.append((base_t + timedelta(milliseconds=100 * i)).strftime(
            "%Y-%m-%d %H:%M:%S.%f") + "000")
        poses.append(T[:3].reshape(-1).copy())
        step = np.eye(4)
        step[2, 3] = 1.2
        T = T @ step
    (seq_dir / "oxts" / "timestamps.txt").write_text("\n".join(ts_lines) + "\n")
    np.savetxt(root / "poses" / "04.txt", np.stack(poses))
    return root


def main() -> None:
    import jax

    # decode/batch are pure host stages; force CPU so the transfer row
    # doesn't hang on a relay outage (it is attachment-specific anyway)
    jax.config.update("jax_platforms", "cpu")
    from tpuslam.data.base import ImageCache
    from tpuslam.data.kitti import KittiOdometry
    from tpuslam.utils.profiling import profile_host_pipeline

    with tempfile.TemporaryDirectory() as tmp:
        root = make_fixture(Path(tmp))
        t0 = time.perf_counter()
        ds = KittiOdometry(root, 4, height=192, width=640,
                           with_depth=False, do_augmentation=False)
        print(f"loader init: {time.perf_counter() - t0:.2f}s "
              f"({len(ds)} samples)")

        # single-image decode cost (decode + LANCZOS to 192x640)
        from tpuslam.data.base import load_image
        p = ds.image_files[2]
        load_image(p, 192, 640)
        t0 = time.perf_counter()
        for _ in range(10):
            load_image(p, 192, 640)
        print(f"decode+resize one 1241x376 PNG -> 192x640: "
              f"{(time.perf_counter() - t0) / 10 * 1e3:.1f} ms")

        for cached in (False, True):
            if not cached:
                ds._images = type("Nop", (), {
                    "load": staticmethod(
                        lambda path, h, w: load_image(path, h, w))
                })()
            else:
                ds._images = ImageCache()
            stats = profile_host_pipeline(dataset=ds, samples=20)
            print(f"cache={cached}: {stats}")


if __name__ == "__main__":
    sys.exit(main())

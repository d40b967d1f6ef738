"""Prime a replay buffer from a dataset — `make_cityscapes_buffer.py` parity.

Streams every sample of the configured dataset through the replay buffer's
diversity-gated `add` (embedding each frame with the configured embedder) and
persists the buffer state for later SLAM runs.
"""
from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from tpuslam.cli.pretrain import build_dataset
from tpuslam.config import parse_config
from tpuslam.memory import ReplayBuffer


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="prime a replay buffer")
    ap.add_argument("--config", required=True, type=Path)
    ap.add_argument("--split", default="train")
    ap.add_argument("--out", type=Path, default=None)
    ap.add_argument("--max-samples", type=int, default=None)
    args = ap.parse_args(argv)

    cfg = parse_config(args.config)
    dataset = build_dataset(cfg, args.split)
    out = args.out or cfg.replay_buffer.load_path or Path("./replay_buffer")
    rb = cfg.replay_buffer
    buffer = ReplayBuffer(
        storage_dir=out,
        height=cfg.dataset.height,
        width=cfg.dataset.width,
        max_buffer_size=rb.max_buffer_size,
        maximize_diversity=rb.maximize_diversity,
        similarity_threshold=rb.similarity_threshold,
        similarity_sampling=rb.similarity_sampling,
    )

    # embed with the depth encoder's pooled stage-4 feature (random-init is a
    # valid descriptor; pass --config with load_weights_folder for trained)
    from tpuslam.checkpoint.io import load_checkpoint
    from tpuslam.models import DepthPoseNet, init_depth_pose

    model, variables = init_depth_pose(
        jax.random.PRNGKey(0), height=cfg.dataset.height, width=cfg.dataset.width
    )
    params, stats = variables["params"], variables["batch_stats"]
    lw = cfg.depth_pose.load_weights_folder
    if lw is not None and Path(lw).exists():
        params, stats, _, _ = load_checkpoint(lw, params, stats)

    @jax.jit
    def embed(image):
        from tpuslam.models.embedder import l2_normalize

        _, feat = model.apply(
            {"params": params, "batch_stats": stats},
            image,
            method=DepthPoseNet.depth_forward,
        )
        return l2_normalize(feat)

    n = len(dataset) if args.max_samples is None else min(args.max_samples, len(dataset))
    for i in range(n):
        sample = dataset[i]
        emb = np.asarray(embed(jnp.asarray(sample.rgb[1][None])))[0]
        buffer.add(sample, emb, verbose=(i % 50 == 0))
    path = buffer.save_state()
    print(f"buffer: {len(buffer)} samples -> {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

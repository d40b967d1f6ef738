"""Pretraining driver — the `main_pretrain.py` equivalent.

Usage:
    python -m tpuslam.cli.pretrain --config <yaml> [--epochs N] [--dp N]
"""
from __future__ import annotations

import argparse
from pathlib import Path

from tpuslam.config import parse_config
from tpuslam.train.pretrain import Pretrainer


def build_dataset(cfg, split: str):
    dc = cfg.dataset
    if dc.dataset == "Cityscapes":
        from tpuslam.data.cityscapes import Cityscapes

        return Cityscapes(
            dc.dataset_path, split=split, height=dc.height, width=dc.width,
            do_augmentation=(split == "train"),
        )
    if dc.dataset == "Kitti":
        from tpuslam.data import KittiOdometry

        train_set = cfg.depth_pose.train_set
        val_set = cfg.depth_pose.val_set
        if train_set == "all":
            val = (val_set,) if isinstance(val_set, int) else tuple(val_set)
            train_set = tuple(s for s in range(11) if s not in val and s != 3)
        seqs = train_set if split == "train" else val_set
        return KittiOdometry(
            dc.dataset_path, seqs, height=dc.height, width=dc.width,
            do_augmentation=(split == "train"),
        )
    if dc.dataset == "Synthetic":
        from tpuslam.data import SyntheticDataset

        return SyntheticDataset(
            num_frames=dc.num_frames, height=dc.height, width=dc.width,
            trajectory=dc.trajectory, speed=dc.speed,
            do_augmentation=(split == "train"),
            seed=0 if split == "train" else 1,
        )
    raise ValueError(f"unsupported dataset {dc.dataset}")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="tpuslam pretraining")
    ap.add_argument("--config", required=True, type=Path)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--dp", type=int, default=None, help="data-parallel devices")
    args = ap.parse_args(argv)

    cfg = parse_config(args.config)
    pc = cfg.depth_pose
    trainer = Pretrainer(
        height=cfg.dataset.height,
        width=cfg.dataset.width,
        scales=pc.scales,
        resnet_depth=pc.resnet_depth,
        resnet_pose=pc.resnet_pose,
        learning_rate=pc.learning_rate,
        scheduler_step_size=pc.scheduler_step_size,
        batch_size=pc.batch_size,
        min_depth=pc.min_depth,
        max_depth=pc.max_depth,
        disparity_smoothness=pc.disparity_smoothness,
        velocity_loss_scaling=pc.velocity_loss_scaling,
        mask_dynamic=pc.mask_dynamic,
        log_path=pc.log_path,
        dp_devices=args.dp if args.dp is not None else pc.dp_devices,
        encoder_weights=pc.encoder_weights,
        resnet_pretrained=pc.resnet_pretrained,
        scale_prior_epochs=pc.scale_prior_epochs,
        scale_prior_weight=pc.scale_prior_weight,
        dtype=pc.dtype,
    )
    train_ds = build_dataset(cfg, "train")
    try:
        val_ds = build_dataset(cfg, "val")
    except Exception:
        val_ds = None
    print(f"pretrain: {len(train_ds)} train samples, dp={trainer.dp_devices}")
    trainer.fit(
        train_ds,
        val_ds,
        num_epochs=args.epochs if args.epochs is not None else pc.num_epochs,
        save_frequency=pc.save_frequency,
        validate=val_ds is not None,
        depth_error=val_ds is not None,
        save_val_depth=(
            max(1, pc.save_val_depth_batches) * pc.batch_size
            if pc.save_val_depth
            else 0
        ),
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

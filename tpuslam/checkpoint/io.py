"""Checkpoint save/load: flax msgpack with the reference's directory contract.

The reference stores per-network `.pth` files under
`<log_path>/models/weights_{epoch:03}/` plus `optimizer.pth` and a copy of the
config (depth_pose_prediction.py:669-703).  Here a checkpoint directory holds:

  weights_{epoch:03}/
    params.msgpack        # flax-serialised model params
    batch_stats.msgpack   # BN running stats
    opt_state.msgpack     # optax state (optional)
    meta.yaml             # epoch, step, shapes
    config.yaml           # run config copy (provenance)

`load_torch_reference/` import of reference `.pth` files lives in
torch_import.py (torch is CPU-available in dev environments).
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import yaml
from flax import serialization


def save_checkpoint(
    log_path: Path,
    epoch: int,
    params: Any,
    batch_stats: Any,
    opt_state: Any = None,
    meta: Optional[Dict] = None,
    config_yaml: Optional[str] = None,
) -> Path:
    folder = Path(log_path) / "models" / f"weights_{epoch:03d}"
    folder.mkdir(parents=True, exist_ok=True)
    (folder / "params.msgpack").write_bytes(serialization.to_bytes(params))
    (folder / "batch_stats.msgpack").write_bytes(serialization.to_bytes(batch_stats))
    if opt_state is not None:
        (folder / "opt_state.msgpack").write_bytes(serialization.to_bytes(opt_state))
    meta = dict(meta or {})
    meta["epoch"] = epoch
    with open(folder / "meta.yaml", "w") as f:
        yaml.safe_dump(meta, f)
    if config_yaml is not None:
        (folder.parent.parent / "config.yaml").write_text(config_yaml)
    return folder


def load_checkpoint(
    folder: Path,
    params_template: Any,
    batch_stats_template: Any,
    opt_state_template: Any = None,
) -> Tuple[Any, Any, Any, Dict]:
    """Load a checkpoint dir into templates (shape/dtype-checked by flax).

    Missing opt_state falls back to the template (reference behaviour: fresh
    optimizer when the stored one is absent/mismatched, :747-749).
    """
    folder = Path(folder)
    params = serialization.from_bytes(
        params_template, (folder / "params.msgpack").read_bytes()
    )
    batch_stats = serialization.from_bytes(
        batch_stats_template, (folder / "batch_stats.msgpack").read_bytes()
    )
    opt_state = opt_state_template
    opt_path = folder / "opt_state.msgpack"
    if opt_state_template is not None and opt_path.exists():
        try:
            opt_state = serialization.from_bytes(
                opt_state_template, opt_path.read_bytes()
            )
        except Exception:
            print("checkpoint: optimizer state mismatch — starting fresh")
    meta = {}
    meta_path = folder / "meta.yaml"
    if meta_path.exists():
        with open(meta_path) as f:
            meta = yaml.safe_load(f) or {}
    return params, batch_stats, opt_state, meta


def latest_checkpoint(log_path: Path) -> Optional[Path]:
    models = Path(log_path) / "models"
    if not models.exists():
        return None
    candidates = sorted(models.glob("weights_*"))
    return candidates[-1] if candidates else None


def mark_best_checkpoint(
    log_path: Path, epoch: int, monitor: str, value: float
) -> None:
    """Record which epoch's checkpoint is the best so far (models/best.yaml).

    Written by Pretrainer.fit's best-tracking so downstream consumers (A/B
    harnesses, cli.rungs --weights) can load the best epoch instead of the
    last — a degrading run (train loss falling while val depth error rises,
    the round-4 quality-pretrain failure mode) otherwise silently feeds its
    worst checkpoint forward."""
    models = Path(log_path) / "models"
    models.mkdir(parents=True, exist_ok=True)
    with open(models / "best.yaml", "w") as f:
        yaml.safe_dump(
            {"epoch": epoch, "monitor": monitor, "value": float(value)}, f
        )


def best_checkpoint(log_path: Path) -> Optional[Path]:
    """The checkpoint dir marked best by `mark_best_checkpoint`, if any
    (falls back to None — callers chain `or latest_checkpoint(...)`)."""
    marker = Path(log_path) / "models" / "best.yaml"
    if not marker.exists():
        return None
    with open(marker) as f:
        meta = yaml.safe_load(f) or {}
    folder = Path(log_path) / "models" / f"weights_{int(meta['epoch']):03d}"
    return folder if folder.exists() else None

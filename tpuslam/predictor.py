"""DepthPosePrediction facade — API parity with the reference L2 interface.

Mirrors the public surface of the reference class
(/root/reference/depth_pose_prediction/depth_pose_prediction.py: train /
adapt / validate / predict / predict_pose / predict_from_image(s) /
save_model / load_model / load_online_model / compute_depth_error /
compute_pose_error) on top of the fused JAX steps.  The "online" model pair
(expert) mirrors the reference's use_online machinery (:139-152, 650-655).

All images are NHWC float32 in [0, 1]; single images may omit the batch dim.
"""
from __future__ import annotations

import warnings
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpuslam.checkpoint.io import latest_checkpoint, load_checkpoint, save_checkpoint
from tpuslam.config.schema import DatasetConfig, DepthPoseConfig
from tpuslam.data.base import Sample
from tpuslam.eval.depth import calc_depth_error
from tpuslam.eval.trajectory import rotation_error, translation_error
from tpuslam.models import init_depth_pose
from tpuslam.train.batch import FrameBatch, pad_batch
from tpuslam.train.pretrain import Pretrainer
from tpuslam.train.state import make_adapt_optimizer, make_train_state
from tpuslam.train.steps import (
    LossConfig,
    adapt_step,
    eval_step,
    predict_depth_step,
    predict_pose_step,
)


def _batchify(image) -> jax.Array:
    image = jnp.asarray(image)
    return image[None] if image.ndim == 3 else image


class DepthPosePrediction:
    def __init__(
        self,
        dataset_config: DatasetConfig,
        config: DepthPoseConfig,
        use_online: bool = False,
    ):
        self.dataset_config = dataset_config
        self.config = config
        self.height = dataset_config.height
        self.width = dataset_config.width
        self.min_depth = config.min_depth
        self.max_depth = config.max_depth
        self.batch_size = config.batch_size
        self.load_weights_folder = config.load_weights_folder
        self.log_path = Path(config.log_path)
        self.is_trained = False
        self.epoch = 0

        self.model, variables = init_depth_pose(
            jax.random.PRNGKey(0),
            height=self.height,
            width=self.width,
            resnet_depth=config.resnet_depth,
            resnet_pose=config.resnet_pose,
            scales=tuple(config.scales),
            dtype=jnp.dtype(config.dtype),  # conv compute dtype (params stay f32)
        )
        if config.encoder_weights is not None or config.resnet_pretrained:
            from tpuslam.checkpoint.torch_import import init_encoders_from_imagenet

            variables = init_encoders_from_imagenet(
                variables, config.encoder_weights, required=config.resnet_pretrained
            )
        self.loss_cfg = LossConfig(
            scales=tuple(config.scales),
            min_depth=config.min_depth,
            max_depth=config.max_depth,
            disparity_smoothness=config.disparity_smoothness,
            velocity_loss_scaling=config.velocity_loss_scaling,
            use_pallas_warp=getattr(config, "pallas_warp", False),
            pallas_packed=getattr(config, "pallas_packed", False),
            pallas_seg_skip=getattr(config, "pallas_seg_skip", False),
            pallas_group_skip=getattr(config, "pallas_group_skip", True),
            pallas_fused_grad=getattr(config, "pallas_fused_grad", True),
            pallas_fused_loss=getattr(config, "pallas_fused_loss", False),
            pallas_bf16_out=getattr(config, "pallas_bf16_out", False),
            pallas_tall=getattr(config, "pallas_tall", False),
            pallas_fused_bwd=getattr(config, "pallas_fused_bwd", False),
            pallas_proj=getattr(config, "pallas_proj", False),
            pallas_extra_tiles=getattr(config, "pallas_extra_tiles", 2),
        )
        self.tx = make_adapt_optimizer(
            variables["params"], config.learning_rate,
            depth_lr_scale=getattr(config, "adapt_depth_lr_scale", 1.0),
        )
        self.state = make_train_state(
            variables["params"], variables["batch_stats"], self.tx
        )
        self.use_online = use_online
        self.online_state = (
            make_train_state(variables["params"], variables["batch_stats"], self.tx)
            if use_online
            else None
        )

    # ------------------------------------------------------------ training
    def train(
        self,
        train_dataset,
        val_dataset=None,
        validate: bool = False,
        depth_error: bool = False,
        use_wandb: bool = False,
        num_epochs: Optional[int] = None,
    ) -> None:
        """Offline pretraining (reference train(), :219-289)."""
        c = self.config
        trainer = Pretrainer(
            height=self.height,
            width=self.width,
            scales=c.scales,
            resnet_depth=c.resnet_depth,
            resnet_pose=c.resnet_pose,
            learning_rate=c.learning_rate,
            scheduler_step_size=c.scheduler_step_size,
            batch_size=c.batch_size,
            min_depth=c.min_depth,
            max_depth=c.max_depth,
            disparity_smoothness=c.disparity_smoothness,
            velocity_loss_scaling=c.velocity_loss_scaling,
            mask_dynamic=c.mask_dynamic,
            log_path=c.log_path,
            dp_devices=c.dp_devices,
            encoder_weights=c.encoder_weights,
            resnet_pretrained=c.resnet_pretrained,
            scale_prior_epochs=c.scale_prior_epochs,
            scale_prior_weight=c.scale_prior_weight,
            dtype=c.dtype,
        )
        trainer.state = self.state
        log_fn = None
        logger = None
        if use_wandb:
            from tpuslam.utils.profiling import MetricsLogger

            logger = MetricsLogger(self.log_path / "metrics.jsonl", use_wandb=True)
            log_fn = logger.log
        trainer.fit(
            train_dataset,
            val_dataset,
            num_epochs=num_epochs if num_epochs is not None else c.num_epochs,
            save_frequency=c.save_frequency,
            validate=validate,
            depth_error=depth_error,
            log_fn=log_fn,
            save_val_depth=(
                max(1, c.save_val_depth_batches) * c.batch_size
                if c.save_val_depth
                else 0
            ),
            image_logger=logger,
        )
        self.state = trainer.state
        self.epoch = trainer.epoch
        self.is_trained = True

    def adapt(
        self,
        online_batch: FrameBatch,
        training_batch: Optional[FrameBatch] = None,
        steps: int = 1,
        use_online: bool = False,
        online_loss_weight: Optional[float] = None,
        online_index: int = 0,
    ):
        """Online adaptation (reference adapt(), :291-319): K fused update
        iterations when training data is given, otherwise a no-grad eval.
        `online_loss_weight` re-weights the online sample, spreading the rest
        uniformly over the replay samples (reference :297-305).

        Like the reference, the returned outputs/losses are the LAST
        iteration's training-batch forward; unlike the reference the warped
        ('rgb', f, s) images are dropped from the outputs (they are loss
        inputs only and dominate the transfer) — use `predict` for a full
        eval forward that includes them."""
        state = self.online_state if (use_online and self.online_state) else self.state
        if training_batch is not None:
            if online_loss_weight is not None and training_batch.batch_size > 1:
                B = training_batch.batch_size
                buffer_w = (1.0 - online_loss_weight) / (B - 1)
                w = np.full((B,), buffer_w, np.float32)
                w[online_index] = online_loss_weight
                training_batch = training_batch.replace(weights=jnp.asarray(w))
            training_batch = pad_batch(training_batch, self.batch_size)
            state, losses, outputs = adapt_step(
                self.model, self.tx, self.loss_cfg, state,
                online_batch, training_batch, num_steps=steps,
            )
            if use_online and self.online_state is not None:
                self.online_state = state
            else:
                self.state = state
        else:
            losses, outputs = eval_step(
                self.model, self.loss_cfg, state.params, state.batch_stats,
                online_batch,
            )
        return outputs, losses

    def validate(self, dataset, max_batches: Optional[int] = None) -> float:
        if not self.is_trained:
            warnings.warn("The model has not been trained yet.", RuntimeWarning)
        from tpuslam.train.pretrain import batches_from

        losses = []
        rng = np.random.default_rng(0)
        for i, batch in enumerate(batches_from(dataset, self.batch_size, rng, shuffle=False)):
            if max_batches is not None and i >= max_batches:
                break
            step_losses, _ = eval_step(
                self.model, self.loss_cfg, self.state.params,
                self.state.batch_stats, batch,
            )
            losses.append(float(step_losses["loss"]))
        return float(np.mean(losses)) if losses else float("nan")

    # ---------------------------------------------------------- prediction
    def predict(self, batch: FrameBatch):
        """Full no-grad forward on a batch (reference predict(), :530-536)."""
        if not self.is_trained:
            warnings.warn("The model has not been trained yet.", RuntimeWarning)
        losses, outputs = eval_step(
            self.model, self.loss_cfg, self.state.params, self.state.batch_stats, batch
        )
        return outputs

    def predict_from_image(self, image, as_numpy: bool = True):
        """Single image -> depth map (reference :538-554)."""
        if not self.is_trained:
            warnings.warn("The model has not been trained yet.", RuntimeWarning)
        depth, _ = predict_depth_step(
            self.model, self.state.params, self.state.batch_stats,
            _batchify(image), min_depth=self.min_depth, max_depth=self.max_depth,
        )
        return np.asarray(depth[0, ..., 0]) if as_numpy else depth

    def predict_from_images(
        self,
        image_0,
        image_1,
        as_numpy: bool = True,
        return_loss: bool = False,
        camera_matrix=None,
        inv_camera_matrix=None,
        relative_distance=None,
    ):
        """Two images -> (depth_0, depth_1, relative pose) (reference :556-626).

        With `return_loss=True` (and calibration given) also returns the
        scale-0 photometric loss of warping image_0 into image_1's frame —
        the reference's drift/novelty probe (:602-624)."""
        if not self.is_trained:
            warnings.warn("The model has not been trained yet.", RuntimeWarning)
        i0, i1 = _batchify(image_0), _batchify(image_1)
        d0, _ = predict_depth_step(
            self.model, self.state.params, self.state.batch_stats, i0,
            min_depth=self.min_depth, max_depth=self.max_depth,
        )
        d1, _ = predict_depth_step(
            self.model, self.state.params, self.state.batch_stats, i1,
            min_depth=self.min_depth, max_depth=self.max_depth,
        )
        T, _ = predict_pose_step(
            self.model, self.state.params, self.state.batch_stats, i0, i1
        )
        if return_loss:
            if camera_matrix is None or inv_camera_matrix is None:
                raise ValueError("return_loss requires camera matrices")
            from tpuslam.geometry.camera import (
                backproject_depth,
                bilinear_sampler,
                pixel_grid,
                project_3d,
            )
            from tpuslam.geometry.se3 import se3_inverse
            from tpuslam.losses.photometric import reprojection_loss

            H, W = i1.shape[1:3]
            K = jnp.asarray(camera_matrix, jnp.float32).reshape(1, 4, 4)
            inv_K = jnp.asarray(inv_camera_matrix, jnp.float32).reshape(1, 4, 4)
            # warp image_0 (frame -1) into image_1's frame using T(0,-1)=inv(T)
            pts = backproject_depth(d1[..., 0], inv_K, pixel_grid(H, W))
            coords = project_3d(pts, K, se3_inverse(T), H, W)
            warped = bilinear_sampler(i0, coords)
            reproj = reprojection_loss(warped, i1)
            ident = reprojection_loss(i0, i1)
            photometric = float(jnp.minimum(reproj, ident).mean())
            losses = {"reprojection_loss/scale_0": photometric, "loss": photometric}
            if relative_distance is not None:
                vel = float(
                    jnp.abs(
                        jnp.linalg.norm(T[0, :3, 3])
                        - jnp.abs(jnp.asarray(relative_distance))
                    ).mean()
                )
                losses["velocity_loss"] = vel
            if as_numpy:
                return (
                    np.asarray(d0[0, ..., 0]),
                    np.asarray(d1[0, ..., 0]),
                    np.asarray(T[0]),
                    losses,
                )
            return d0, d1, T, losses
        if as_numpy:
            return (
                np.asarray(d0[0, ..., 0]),
                np.asarray(d1[0, ..., 0]),
                np.asarray(T[0]),
            )
        return d0, d1, T

    def predict_pose(self, image_0, image_1, as_numpy: bool = True, use_online: bool = False):
        """Relative pose + placeholder covariance (reference :628-664)."""
        if not self.is_trained:
            warnings.warn("The model has not been trained yet.", RuntimeWarning)
        state = self.online_state if (use_online and self.online_state) else self.state
        T, cov = predict_pose_step(
            self.model, state.params, state.batch_stats,
            _batchify(image_0), _batchify(image_1),
        )
        if as_numpy:
            return np.asarray(T[0]), np.asarray(cov)
        return T, cov

    # ------------------------------------------------------------- metrics
    def compute_depth_error(
        self, dataset, median_scaling: bool = True,
        max_samples: Optional[int] = None, print_results: bool = True,
    ) -> Dict[str, float]:
        """Monodepth2-style depth eval (reference :344-468): depth always via
        min_depth/disp regardless of the training max_depth (the reference
        passes None at :406), per-sample metrics averaged, median scaling
        ratio reported as med_scaling.

        Covers the FULL dataset by default like the reference's val-loader
        sweep (depth_pose_prediction.py:344-468); `max_samples` is an
        explicit opt-in cap (logged when it truncates).  Predictions are
        dispatched without syncing and transferred as ONE stacked array —
        the per-sample host round trip dominated the old loop."""
        n = len(dataset)
        if max_samples is not None and n > max_samples:
            print(f"compute_depth_error: truncating {n} -> {max_samples} samples")
            n = max_samples
        preds = []
        gts = []
        for i in range(n):
            s: Sample = dataset[i]
            if s.depth is None:
                continue
            depth, _ = predict_depth_step(
                self.model, self.state.params, self.state.batch_stats,
                _batchify(s.rgb[1]), min_depth=self.min_depth, max_depth=None,
            )
            preds.append(depth[:, ..., 0])
            gts.append(s.depth)
        if not preds:
            return {}
        preds = np.asarray(jnp.concatenate(preds, axis=0))  # one transfer
        metrics = []
        ratios = []
        for pred, gt in zip(preds, gts):
            if median_scaling:
                valid = gt > self.min_depth
                if valid.any():
                    from tpuslam.eval.depth import _resize_bilinear

                    pr = _resize_bilinear(pred, *gt.shape)
                    ratios.append(
                        float(np.median(gt[valid]) / np.median(pr[valid]))
                    )
            metrics.append(
                calc_depth_error(
                    pred, gt, median_scaling=median_scaling,
                    min_depth=self.min_depth, max_depth=self.max_depth,
                )
            )
        out = {k: float(np.mean([m[k] for m in metrics])) for k in metrics[0]}
        if median_scaling and ratios:
            out["med_scaling"] = float(np.median(ratios))
        if print_results:
            print(" ".join(f"{k}={v:.4f}" for k, v in out.items()))
        return out

    def compute_pose_error(
        self, dataset, max_samples: Optional[int] = None,
        print_results: bool = True,
    ) -> Dict[str, float]:
        """Mean frame-to-frame pose error vs GT (reference :470-525).

        Full dataset by default (`max_samples` is an opt-in cap, logged when
        truncating); poses transfer as one stacked array, not per sample."""
        n = len(dataset)
        if max_samples is not None and n > max_samples:
            print(f"compute_pose_error: truncating {n} -> {max_samples} samples")
            n = max_samples
        Ts, gt_poses = [], []
        for i in range(n):
            s: Sample = dataset[i]
            if s.rel_pose is None:
                continue
            T, _ = self.predict_pose(s.rgb[1], s.rgb[2], as_numpy=False)
            Ts.append(T[:1])
            gt_poses.append(s.rel_pose)
        terrs, rerrs = [], []
        if Ts:
            Ts = np.asarray(jnp.concatenate(Ts, axis=0))  # one transfer
        for T, rel_pose in zip(Ts, gt_poses):
            err = np.linalg.inv(rel_pose) @ np.linalg.inv(T)
            terrs.append(translation_error(err))
            rerrs.append(rotation_error(err))
        out = {
            "trans_error": float(np.mean(terrs)) if terrs else float("nan"),
            "rot_error": float(np.mean(rerrs)) if rerrs else float("nan"),
        }
        if print_results:
            print(f"pose error: {out}")
        return out

    # --------------------------------------------------------- persistence
    def save_model(self) -> Path:
        return save_checkpoint(
            self.log_path,
            epoch=self.epoch,
            params=self.state.params,
            batch_stats=self.state.batch_stats,
            opt_state=self.state.opt_state,
        )

    def load_model(self, load_optimizer: bool = True, folder: Optional[Path] = None):
        folder = folder or self.load_weights_folder
        if folder is None:
            folder = latest_checkpoint(self.log_path)
        if folder is None or not Path(folder).exists():
            print(f"Cannot find weights folder: {folder}")
            return
        params, stats, opt_state, meta = load_checkpoint(
            folder,
            self.state.params,
            self.state.batch_stats,
            self.state.opt_state if load_optimizer else None,
        )
        self.state = self.state.replace(
            params=params,
            batch_stats=stats,
            opt_state=opt_state if opt_state is not None else self.state.opt_state,
        )
        self.epoch = int(meta.get("epoch", 0))
        self.is_trained = True

    def load_online_model(self, load_optimizer: bool = True, folder: Optional[Path] = None):
        """Load the expert/online pair from the same checkpoint (reference :751-792)."""
        if self.online_state is None:
            raise RuntimeError("constructed with use_online=False")
        folder = folder or self.load_weights_folder
        params, stats, opt_state, _ = load_checkpoint(
            folder,
            self.online_state.params,
            self.online_state.batch_stats,
            self.online_state.opt_state if load_optimizer else None,
        )
        self.online_state = self.online_state.replace(
            params=params,
            batch_stats=stats,
            opt_state=opt_state if opt_state is not None else self.online_state.opt_state,
        )

    def load_reference_checkpoint(self, weights_folder: Path):
        """Import a PyTorch reference `weights_NNN/` folder directly."""
        from tpuslam.checkpoint.torch_import import import_reference_checkpoint

        params, stats = import_reference_checkpoint(weights_folder)
        self.state = self.state.replace(params=params, batch_stats=stats)
        self.is_trained = True

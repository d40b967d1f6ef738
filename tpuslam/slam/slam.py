"""Online continual-SLAM orchestrator.

Step semantics follow the reference loop (/root/reference/slam/slam.py:137-281)
with the compute path restructured for TPU: per frame, ONE fused XLA dispatch
(`adapt_step`) performs the K adaptation iterations and produces the pose,
depth, losses (all from the final iteration's training-batch forward, like
the reference's adapt()) and the retrieval embeddings; host code does the
replay-buffer bookkeeping, pose-graph maintenance, loop-closure search and
metric logging around it.

Preserved reference behaviours (quirks documented in SURVEY §7):
* skip frames whose signed relative distance is below `min_distance`
  (slam.py:165-168) — zero losses returned, no vertex added;
* sign-flip: the odometry edge uses inv(cam_T_cam(0,1)) unless the rig is
  reversing (:181-184);
* odometry covariance diag(1,1,.1,1,1,.1) -> information inv(cov); loop
  closures weighted 0.5x (:212-214, 238-244);
* first graph vertex pinned to dataset.global_poses[1] (:112);
* loop-closure cadence: every `keyframe_frequency` steps while
  step < 4000, with `lc_distance_poses` cooldown (:224-225);
* `start_frame` gating for delayed mapping (:205-211).
"""
from __future__ import annotations

import pickle
import time
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpuslam.config.schema import Config
from tpuslam.checkpoint.io import load_checkpoint
from tpuslam.data import KittiOdometry, SyntheticDataset
from tpuslam.data.base import Sample
from tpuslam.eval.depth import calc_depth_error
from tpuslam.eval.trajectory import rotation_error, translation_error
from tpuslam.loopclosure import LoopClosureDetection
from tpuslam.memory import ReplayBuffer
from tpuslam.models import DepthPoseNet, init_depth_pose
from tpuslam.models.embedder import l2_normalize
from tpuslam.posegraph import PoseGraph
from tpuslam.train import (
    FrameBatch,
    LossConfig,
    adapt_step,
    concat_batches,
    consolidate_step,
    consolidate_step_async,
    eval_step,
    make_adapt_optimizer,
    make_frame_batch,
    make_train_state,
    pad_batch,
    predict_pose_step,
)

LC_MAX_STEP = 4000  # reference hard cap (slam/slam.py:224)


def _tree_ready(state) -> bool:
    """True when an async dispatch's result has materialised on device.

    Checks a single leaf — all leaves of one dispatch complete together.
    Backends whose arrays lack `is_ready` report True (update adopted every
    frame: still correct, just less lag-tolerant)."""
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    is_ready = getattr(leaf, "is_ready", None)
    return True if is_ready is None else bool(is_ready())


def _embed_frame(model, params, batch_stats, image):
    """Pooled stage-4 depth-encoder feature of one (1, H, W, 3) image
    (encoder half only — no decoder work)."""
    feats = model.apply(
        {"params": params, "batch_stats": batch_stats},
        image,
        method=DepthPoseNet.depth_encode,
    )
    return l2_normalize(feats[-1].mean(axis=(1, 2)))


class Slam:
    def __init__(self, config: Config, dataset=None):
        self.config = config
        sc, dc, pc = config.slam, config.dataset, config.depth_pose
        self.do_adaptation = sc.adaptation
        self.adaptation_epochs = sc.adaptation_epochs
        self.min_distance = sc.min_distance
        self.start_frame = sc.start_frame
        self.logging = sc.logging
        self.plot_frequency = sc.plot_frequency
        self.do_loop_closures = sc.do_loop_closures
        self.keyframe_frequency = sc.keyframe_frequency
        self.lc_distance_poses = sc.lc_distance_poses
        self.batch_size = pc.batch_size if self.do_adaptation else 1
        self.log_path = Path(pc.log_path)
        self.log_path.mkdir(parents=True, exist_ok=True)

        # --- dataset ----------------------------------------------------
        if dataset is not None:
            self.dataset = dataset
        elif dc.dataset == "Kitti":
            self.dataset = KittiOdometry(
                dc.dataset_path,
                int(sc.dataset_sequence),
                height=dc.height,
                width=dc.width,
                with_poses=True,
                min_distance=sc.min_distance,
            )
        elif dc.dataset == "RobotCar":
            from tpuslam.data.robotcar import DEFAULT_SEQUENCE, EVAL_WINDOWS, RobotCar

            # reference eval windows (slam/slam.py:56-72)
            window = EVAL_WINDOWS.get(int(sc.dataset_sequence), (750, 4750))
            self.dataset = RobotCar(
                dc.dataset_path,
                DEFAULT_SEQUENCE,
                height=dc.height,
                width=dc.width,
                with_poses=True,
                min_distance=sc.min_distance,
                start_frame=window[0],
                end_frame=window[1],
                every_n_frame=2,
            )
        elif dc.dataset == "Synthetic":
            self.dataset = SyntheticDataset(
                num_frames=dc.num_frames,
                height=dc.height,
                width=dc.width,
                trajectory=dc.trajectory,
                speed=dc.speed,
                sparse_depth=getattr(dc, "sparse_depth", False),
            )
        else:
            raise ValueError(f"unsupported dataset type {dc.dataset}")

        # --- model + fused step state -----------------------------------
        self.model, variables = init_depth_pose(
            jax.random.PRNGKey(0),
            height=dc.height,
            width=dc.width,
            resnet_depth=pc.resnet_depth,
            resnet_pose=pc.resnet_pose,
            scales=pc.scales,
            dtype=jnp.bfloat16 if pc.dtype == "bfloat16" else jnp.float32,
        )
        params, batch_stats = variables["params"], variables["batch_stats"]
        if pc.load_weights_folder is not None and Path(pc.load_weights_folder).exists():
            params, batch_stats, _, _ = load_checkpoint(
                pc.load_weights_folder, params, batch_stats
            )
            print(f"slam: loaded weights from {pc.load_weights_folder}")
        elif pc.load_weights_folder is not None:
            print(f"slam: weights folder not found, using random init: "
                  f"{pc.load_weights_folder}")
        self.tx = make_adapt_optimizer(
            params, pc.learning_rate, depth_lr_scale=pc.adapt_depth_lr_scale
        )
        self.state = make_train_state(params, batch_stats, self.tx)
        # Dual-network mode (CL-SLAM expert/generalist, BASELINE rung 3):
        # `state` acts as the fast EXPERT; `generalist_state` consolidates on
        # replay-only batches every `generalist_interval` frames.  Mirrors
        # the reference's models/online_models split
        # (depth_pose_prediction.py:139-152) — its shipped loop trains a
        # single network (use_online=False), which is our default too.
        self.use_expert = sc.use_expert
        self.generalist_interval = sc.generalist_interval
        self.generalist_steps = sc.generalist_steps
        if self.use_expert:
            self.generalist_state = make_train_state(params, batch_stats, self.tx)
        else:
            self.generalist_state = None
        self.async_adaptation = sc.async_adaptation
        # Readback pipelining (schema.py SlamConfig.pipeline_depth): frames
        # whose host-side bookkeeping has not run yet wait here as (sample,
        # device-array) entries; _retire() drains them in order
        self.pipeline_depth = getattr(sc, "pipeline_depth", 0)
        from collections import deque

        self._retire_queue: "deque" = deque()
        # CoVIO async bookkeeping: the update in flight (None = none) and
        # counters proving updates lag/skip rather than gate the frame rate
        self._pending_state = None
        self.async_updates_launched = 0
        self.async_updates_adopted = 0
        # bounded LRU for loop-closure candidate images (see _lc_image)
        from collections import OrderedDict

        self._lc_cache: "OrderedDict[int, np.ndarray]" = OrderedDict()
        self._lc_cache_size = 32
        # per-LC-edge quality diagnostics (pred vs GT relative translation)
        self.lc_edge_diagnostics: List[dict] = []
        # per-frame replay-batch composition (buffer sample ids drawn)
        self.replay_composition: List[List[int]] = []
        self.loss_cfg = LossConfig(
            scales=tuple(pc.scales),
            min_depth=pc.min_depth,
            max_depth=pc.max_depth,
            disparity_smoothness=pc.disparity_smoothness,
            velocity_loss_scaling=pc.velocity_loss_scaling,
            use_pallas_warp=pc.pallas_warp,
            pallas_packed=getattr(pc, "pallas_packed", False),
            pallas_seg_skip=getattr(pc, "pallas_seg_skip", False),
            pallas_group_skip=getattr(pc, "pallas_group_skip", True),
            pallas_fused_grad=getattr(pc, "pallas_fused_grad", True),
            pallas_fused_loss=getattr(pc, "pallas_fused_loss", False),
            pallas_bf16_out=getattr(pc, "pallas_bf16_out", False),
            pallas_tall=getattr(pc, "pallas_tall", False),
            pallas_fused_bwd=getattr(pc, "pallas_fused_bwd", False),
            pallas_proj=getattr(pc, "pallas_proj", False),
            pallas_extra_tiles=getattr(pc, "pallas_extra_tiles", 2),
        )

        # --- replay buffer ----------------------------------------------
        if self.do_adaptation and self.batch_size > 1:
            rb = config.replay_buffer
            state_path = None
            if rb.load_path is not None:
                buffer_dir = Path(rb.load_path)
                buffer_dir.mkdir(parents=True, exist_ok=True)
                candidate = buffer_dir / "buffer_state.pkl"
                state_path = candidate if candidate.exists() else None
            else:
                buffer_dir = None
            self.replay_buffer = ReplayBuffer(
                storage_dir=buffer_dir,
                state_path=state_path,
                height=dc.height,
                width=dc.width,
                batch_size=self.batch_size - 1,
                max_buffer_size=rb.max_buffer_size,
                maximize_diversity=rb.maximize_diversity,
                similarity_threshold=rb.similarity_threshold,
                similarity_sampling=rb.similarity_sampling,
            )
        else:
            self.replay_buffer = None

        # --- loop closures + pose graphs --------------------------------
        lc = config.loop_closure
        self.lc_embedder = lc.embedder
        num_features = 512 if lc.embedder == "depth_encoder" else 576
        self.loop_closure_detection = LoopClosureDetection(
            detection_threshold=lc.detection_threshold,
            id_threshold=lc.id_threshold,
            num_matches=lc.num_matches,
            num_features=num_features,
        )
        if self.lc_embedder == "mobilenet":
            from tpuslam.models.embedder import MobileNetV3SmallEmbedder

            self._mobilenet = MobileNetV3SmallEmbedder()
            if lc.embedder_weights is not None and Path(lc.embedder_weights).exists():
                from tpuslam.checkpoint.torch_import import load_mobilenet_embedder

                self._mobilenet_vars = load_mobilenet_embedder(lc.embedder_weights)
                print(f"slam: loaded mobilenet embedder from {lc.embedder_weights}")
            else:
                self._mobilenet_vars = self._mobilenet.init(
                    jax.random.PRNGKey(1), jnp.zeros((1, dc.height, dc.width, 3))
                )
                print(
                    "slam: WARNING — mobilenet LC embedder is randomly initialised "
                    "(no embedder_weights); detection_threshold "
                    f"{lc.detection_threshold} is calibrated for ImageNet features "
                    "(reference loop_closure_detection/encoder.py:28-33)"
                )
            self._mobilenet_apply = jax.jit(
                lambda v, x: self._mobilenet.apply(v, x)
            )

        self.pose_graph = PoseGraph()
        self.gt_pose_graph = PoseGraph()
        if self.start_frame == 0:
            # reference quirk: first vertex is global_poses[1]
            self.pose_graph.add_vertex(0, self.dataset.global_poses[1], fixed=True)
        self.gt_pose_graph.add_vertex(0, self.dataset.global_poses[1], fixed=True)

        # --- bookkeeping -------------------------------------------------
        self.current_step = 0
        self.since_last_loop_closures = self.lc_distance_poses
        self.rel_trans_error: List[float] = []
        self.rel_rot_error: List[float] = []
        self.depth_loss: List[float] = []
        self.velocity_loss: List[float] = []
        self.depth_error: List[Dict[str, float]] = []
        self.step_times: List[float] = []

    def __len__(self) -> int:
        return len(self.dataset)

    # ------------------------------------------------------------------
    def _sample_to_batch(self, sample: Sample) -> FrameBatch:
        return make_frame_batch(
            sample.rgb[None],
            sample.K,
            sample.rel_dist[None],
            rgb_aug=None if sample.rgb_aug is None else sample.rgb_aug[None],
        )

    def _training_batch(self, online: FrameBatch, sample: Sample) -> FrameBatch:
        if self.replay_buffer is None or len(self.replay_buffer) == 0:
            return pad_batch(online, self.batch_size)
        embedding = None
        if self.replay_buffer.similarity_sampling:
            # similarity-weighted draws need the current frame's embedding
            # before the fused dispatch — one extra encoder forward
            # (reference always pays this, slam/slam.py:143-147; we only pay
            # it when the mode is enabled)
            embedding = np.asarray(
                _embed_frame(
                    self.model, self.state.params, self.state.batch_stats,
                    jnp.asarray(sample.rgb[1][None]),
                )
            )[0]
        draws = self.replay_buffer.get(current_index=sample.index, embedding=embedding)
        self.replay_composition.append([int(d.index) for d in draws])
        if not draws:
            return pad_batch(online, self.batch_size)
        replay = make_frame_batch(
            np.stack([d.rgb for d in draws]),
            np.stack([d.K for d in draws]),
            np.stack([d.rel_dist for d in draws]),
            rgb_aug=np.stack([d.aug for d in draws]),
        )
        return pad_batch(concat_batches(online, replay), self.batch_size)

    def _lc_embedding(self, sample: Sample, outputs) -> np.ndarray:
        """Embedding of the frame +1 image for the LC index.

        With the depth-encoder embedder it comes straight out of the fused
        step's outputs (zero extra dispatches); the MobileNet embedder pays
        one small extra forward like the reference."""
        if self.lc_embedder == "mobilenet":
            emb = self._mobilenet_apply(
                self._mobilenet_vars, jnp.asarray(sample.rgb[2][None])
            )
            return np.asarray(l2_normalize(emb))[0]
        if getattr(self, "_packed_lc_embedding", None) is not None:
            return self._packed_lc_embedding  # already on host (one transfer)
        if ("lc_embedding",) in outputs:
            return np.asarray(outputs[("lc_embedding",)])[0]
        emb = _embed_frame(
            self.model,
            self.state.params,
            self.state.batch_stats,
            jnp.asarray(sample.rgb[2][None]),
        )
        return np.asarray(emb)[0]

    # ------------------------------------------------------------------
    def step(self, sample: Optional[Sample] = None) -> Dict[str, float]:
        """One SLAM frame.  `sample` may be supplied by a prefetcher (see
        `run`) so host-side decode/render overlaps the previous frame's
        device work — the reference gets this from DataLoader workers
        (slam/slam.py:75-82).

        With `pipeline_depth` N > 0 the per-frame host readbacks are
        deferred: this call dispatches frame t's device work, then retires
        frame t-N's bookkeeping (buffer add, pose-graph edge, LC search,
        metrics), so the device never idles on a host sync.  The returned
        losses are then frame t-N's (zeros until the pipe fills); callers
        see the same totals once the queue is flushed (`flush_pipeline`)."""
        self.current_step += 1
        t_start = time.perf_counter()
        if sample is None:
            sample = self.dataset[self.current_step - 1]
        entry = self._dispatch(sample)
        if self.pipeline_depth > 0:
            self._start_host_copies(entry)
        self._retire_queue.append(entry)
        out = {"depth_loss": 0.0, "velocity_loss": 0.0}
        while len(self._retire_queue) > self.pipeline_depth:
            out = self._retire(self._retire_queue.popleft())
        if entry["kind"] == "full":
            self.step_times.append(time.perf_counter() - t_start)
        return out

    def _dispatch(self, sample: Sample) -> Dict:
        """Device-dispatch phase of one frame: everything that must run
        BEFORE frame t+1 can start, with no host readback.  Returns a retire
        entry holding the device arrays."""
        step_id = self.current_step
        online = self._sample_to_batch(sample)

        # skip-frame rule: signed relative distance below threshold
        if step_id > 1 and float(sample.rel_dist[1]) < self.min_distance:
            # the reference admits EVERY frame to the replay buffer, including
            # min-distance-skipped ones, with the pre-adaptation embedding
            # (slam/slam.py:143-153 runs before the skip check at :165-168);
            # skipped frames pay the one extra encoder forward it costs
            embedding = None
            if self.replay_buffer is not None:
                embedding = _embed_frame(
                    self.model, self.state.params, self.state.batch_stats,
                    jnp.asarray(sample.rgb[1][None]),
                )
            return {"kind": "skip", "step_id": step_id, "sample": sample,
                    "embedding": embedding}

        # --- the fused dispatch -----------------------------------------
        if self.do_adaptation and self.async_adaptation:
            # CoVIO mode (reference README.md:171-172 async variant):
            # inference runs at frame rate on the newest COMPLETED weights;
            # the weight update is dispatched asynchronously and adopted at a
            # later step boundary.  If an update is still in flight, this
            # frame launches none (updates lag/skip — real CoVIO semantics);
            # the eval never waits for an update.
            if self._pending_state is not None and _tree_ready(self._pending_state):
                self.state = self._pending_state
                self._pending_state = None
                self.async_updates_adopted += 1
            losses, outputs = eval_step(
                self.model, self.loss_cfg, self.state.params,
                self.state.batch_stats, online,
                with_lc_embedding=self.do_loop_closures,
            )
            if self._pending_state is None:
                training = self._training_batch(online, sample)
                # non-donating variant: self.state keeps serving inference
                # while the update computes
                self._pending_state, _ = consolidate_step_async(
                    self.model, self.tx, self.loss_cfg, self.state, training,
                    num_steps=self.adaptation_epochs,
                )
                self.async_updates_launched += 1
        elif self.do_adaptation:
            training = self._training_batch(online, sample)
            # the online frame is training row 0 — the eval sub-batch is
            # derived on device (online=None), halving the image transfer
            self.state, losses, outputs = adapt_step(
                self.model,
                self.tx,
                self.loss_cfg,
                self.state,
                None,
                training,
                num_steps=self.adaptation_epochs,
                with_lc_embedding=self.do_loop_closures,
            )
        else:
            losses, outputs = eval_step(
                self.model, self.loss_cfg, self.state.params,
                self.state.batch_stats, online,
                with_lc_embedding=self.do_loop_closures,
            )

        # --- generalist consolidation (dual-network mode) -----------------
        if (
            self.use_expert
            and self.replay_buffer is not None
            and len(self.replay_buffer) > 0
            and step_id % self.generalist_interval == 0
        ):
            draws = self.replay_buffer.get(current_index=None)
            if draws:
                replay = make_frame_batch(
                    np.stack([d.rgb for d in draws]),
                    np.stack([d.K for d in draws]),
                    np.stack([d.rel_dist for d in draws]),
                    rgb_aug=np.stack([d.aug for d in draws]),
                )
                replay = pad_batch(replay, self.batch_size)
                self.generalist_state, _ = consolidate_step(
                    self.model, self.tx, self.loss_cfg, self.generalist_state,
                    replay, num_steps=self.generalist_steps,
                )

        return {"kind": "full", "step_id": step_id, "sample": sample,
                "losses": losses, "outputs": outputs}

    def _start_host_copies(self, entry: Dict) -> None:
        """Initiate async device->host copies of every array _retire will
        read, right after dispatch.  Deferring the readback alone does not
        hide a LATENCY-bound sync (the transfer would only start when
        _retire blocks); starting the copy here lets it ride alongside the
        next `pipeline_depth` frames' device work, so the retire-side
        np.asarray finds the bytes already on host.  Backends without
        copy_to_host_async fall back to blocking at retire."""
        if entry["kind"] == "skip":
            arrs = [entry["embedding"]]
        else:
            losses, outputs = entry["losses"], entry["outputs"]
            if ("retire_packed",) in outputs:
                # one packed vector carries pose + embedding + losses (+ LC
                # embedding): a single device->host transfer per frame
                # (train/steps.py::_pack_retire, VERDICT r4 #9)
                arrs = [outputs[("retire_packed",)]]
            else:
                arrs = [
                    outputs[("embedding",)],
                    outputs[("cam_T_cam", 0, 1)],
                    losses.get("depth_loss"),
                    losses.get("velocity_loss"),
                    losses.get("loss"),
                    outputs.get(("lc_embedding",)),
                ]
            if self.logging and entry["sample"].depth is not None:
                arrs.append(outputs.get(("depth", 0)))
        for a in arrs:
            start = getattr(a, "copy_to_host_async", None)
            if start is not None:
                try:
                    start()
                except Exception:
                    pass  # transfer falls back to blocking at retire

    def _retire(self, entry: Dict) -> Dict[str, float]:
        """Host bookkeeping phase of one frame: the readbacks (pose,
        embedding, losses) and everything they drive — replay-buffer
        admission, pose-graph vertex/edge, loop-closure search + PGO,
        metrics.  Runs in frame order; with pipelining it executes while
        later frames' device work is in flight, so the pose graph / buffer
        / LC index lag the dispatch frontier by <= pipeline_depth frames
        (LC pose predictions then use the NEWEST adapted weights rather
        than frame t's — documented divergence, PARITY.md)."""
        sample: Sample = entry["sample"]
        step_id: int = entry["step_id"]
        if entry["kind"] == "skip":
            if self.replay_buffer is not None and entry["embedding"] is not None:
                self.replay_buffer.add(
                    sample, np.asarray(entry["embedding"])[0]
                )
            return {"depth_loss": 0.0, "velocity_loss": 0.0}
        losses, outputs = entry["losses"], entry["outputs"]

        packed = outputs.get(("retire_packed",))
        self._packed_lc_embedding = None
        if packed is not None:
            # ONE transfer for everything this phase reads (the layout of
            # train/steps.py::_pack_retire, recovered from shapes)
            flat = np.asarray(packed)
            D = int(outputs[("embedding",)].shape[-1])
            T01 = np.asarray(flat[:16].reshape(4, 4), np.float64)
            embedding = flat[16:16 + D]
            dl, vl, tl = (float(x) for x in flat[16 + D:19 + D])
            if ("lc_embedding",) in outputs:
                self._packed_lc_embedding = flat[19 + D:]
            losses_out = {"depth_loss": dl, "velocity_loss": vl, "loss": tl}
        else:
            embedding = np.asarray(outputs[("embedding",)])[0]
            T01 = np.asarray(outputs[("cam_T_cam", 0, 1)][0], np.float64)
            losses_out = {
                "depth_loss": float(losses.get("depth_loss", 0.0)),
                "velocity_loss": float(losses.get("velocity_loss", 0.0)),
                "loss": float(losses.get("loss", 0.0)),
            }
        if self.replay_buffer is not None:
            self.replay_buffer.add(sample, embedding)

        if float(np.sign(sample.rel_dist[1])) < 0:
            transformation = T01  # reversing
        else:
            transformation = np.linalg.inv(T01)
        if not np.isfinite(losses_out["loss"]):
            # hard failure like the reference (depth_pose_prediction.py:1115-1118)
            raise RuntimeError(f"NaN loss at step {step_id}: {losses_out}")

        # --- ground-truth graph ----------------------------------------
        gt_transformation = np.asarray(sample.rel_pose, np.float64)
        gt_pose = np.asarray(sample.abs_pose, np.float64)
        self.gt_pose_graph.add_vertex(step_id, gt_pose)
        self.gt_pose_graph.add_edge(
            (self.gt_pose_graph.vertex_ids[-2], step_id), gt_transformation
        )

        # --- predicted pose graph --------------------------------------
        if step_id == self.start_frame:
            self.pose_graph.add_vertex(step_id, gt_pose, fixed=True)
        elif step_id > self.start_frame:
            prev_id = self.pose_graph.vertex_ids[-1]
            odom_pose = self.pose_graph.get_pose(prev_id) @ transformation
            self.pose_graph.add_vertex(step_id, odom_pose)
            cov = np.eye(6)
            cov[2, 2] = cov[5, 5] = 0.1
            self.pose_graph.add_edge(
                (prev_id, step_id),
                transformation,
                information=np.linalg.inv(cov),
            )

        # --- loop closures ----------------------------------------------
        optimized = False
        if self.do_loop_closures and step_id >= self.start_frame:
            self.loop_closure_detection.add(
                step_id, self._lc_embedding(sample, outputs)
            )
            if (
                step_id % self.keyframe_frequency == 0
                and step_id < LC_MAX_STEP
                and self.since_last_loop_closures > self.lc_distance_poses
            ):
                lc_ids, sims = self.loop_closure_detection.search(step_id)
                for lc_id, sim in zip(lc_ids, sims):
                    lc_image = self._lc_image(lc_id)
                    if lc_image is None:
                        continue
                    T_lc, _ = predict_pose_step(
                        self.model,
                        self.state.params,
                        self.state.batch_stats,
                        jnp.asarray(sample.rgb[2][None]),
                        jnp.asarray(lc_image[None]),
                    )
                    lc_transformation = np.asarray(T_lc[0], np.float64)
                    cov = np.eye(6)
                    cov[2, 2] = cov[5, 5] = 0.1
                    self.pose_graph.add_edge(
                        (step_id, lc_id),
                        lc_transformation,
                        information=0.5 * np.linalg.inv(cov),
                        is_loop_closure=True,
                    )
                    # edge diagnostics: how good was the predicted LC pose?
                    # (a garbage relative pose here makes the PGO solve PULL
                    # the trajectory off — the rung-4-worse-than-rung-1
                    # failure mode on untrained nets, BASELINE.md round 3)
                    pred_t = float(np.linalg.norm(lc_transformation[:3, 3]))
                    diag = {
                        "step": step_id,
                        "lc_id": int(lc_id),
                        "sim": float(sim),
                        "pred_dist": pred_t,
                    }
                    try:
                        gt_rel = np.linalg.inv(
                            self.gt_pose_graph.get_pose(step_id)
                        ) @ self.gt_pose_graph.get_pose(int(lc_id))
                        diag["gt_dist"] = float(np.linalg.norm(gt_rel[:3, 3]))
                        diag["trans_err"] = float(
                            np.linalg.norm(
                                lc_transformation[:3, 3] - gt_rel[:3, 3]
                            )
                        )
                    except Exception:
                        pass
                    self.lc_edge_diagnostics.append(diag)
                    if self.logging:
                        print(
                            f"loop closure {step_id} -> {lc_id} "
                            f"[sim={sim:.3f}, pred_dist={pred_t:.1f}m"
                            + (
                                f", gt_dist={diag['gt_dist']:.1f}m"
                                if "gt_dist" in diag
                                else ""
                            )
                            + "]"
                        )
                if lc_ids:
                    # native C++ solver when buildable (no jit recompiles as
                    # the graph grows); the JAX LM otherwise.  The cap matches
                    # the reference (slam/slam.py:246) — both backends
                    # terminate early on convergence like g2o
                    self.pose_graph.optimize(max_iterations=10000, backend="auto")
                    optimized = True
            if optimized:
                self.since_last_loop_closures = 0
            else:
                self.since_last_loop_closures += 1

        # --- metrics -----------------------------------------------------
        if self.logging:
            rel_err = np.linalg.inv(gt_transformation) @ transformation
            self.rel_trans_error.append(translation_error(rel_err))
            self.rel_rot_error.append(rotation_error(rel_err))
            self.depth_loss.append(losses_out["depth_loss"])
            self.velocity_loss.append(losses_out["velocity_loss"])
            if sample.depth is not None:
                pred_depth = np.asarray(outputs[("depth", 0)][0, ..., 0])
                self.depth_error.append(
                    calc_depth_error(
                        pred_depth,
                        sample.depth,
                        min_depth=self.loss_cfg.min_depth,
                        max_depth=self.loss_cfg.max_depth,
                    )
                )
        # periodic visual checkpoints (reference slam/slam.py:272-278)
        if (
            self.logging
            and self.plot_frequency > 0
            and step_id % self.plot_frequency == 0
        ):
            try:
                self.plot_trajectory(self.log_path / f"trajectory_{step_id}.png")
                self.plot_metrics(self.log_path / f"metrics_{step_id}.png")
                self.pose_graph.visualize_in_meshlab(
                    self.log_path / f"pose_graph_{step_id}.obj",
                    verbose=False,
                )
            except Exception as e:  # plotting must never kill the run
                print(f"periodic plotting skipped: {e}")
        return losses_out

    def reset_expert_from_generalist(self) -> None:
        """Reinitialise the expert from the consolidated generalist weights —
        the CL-SLAM deployment move when entering a (re)visited environment."""
        if self.generalist_state is None:
            raise RuntimeError("dual-network mode is not enabled (use_expert)")
        self.state = make_train_state(
            self.generalist_state.params,
            self.generalist_state.batch_stats,
            self.tx,
        )

    def _lc_image(self, lc_id: int) -> Optional[np.ndarray]:
        """Frame +1 image of the step that registered `lc_id` — re-served by
        the dataset on demand, behind a bounded LRU cache: one candidate can
        be probed on several later frames (cooldown window), and a dataset
        Sample decode is 3 PNG reads + a resize pyramid on real data."""
        idx = lc_id - 1
        if not (0 <= idx < len(self.dataset)):
            return None
        cached = self._lc_cache.get(idx)
        if cached is not None:
            self._lc_cache.move_to_end(idx)
            return cached
        image = self.dataset[idx].rgb[2]
        self._lc_cache[idx] = image
        if len(self._lc_cache) > self._lc_cache_size:
            self._lc_cache.popitem(last=False)
        return image

    # ------------------------------------------------------------------
    def run(
        self,
        max_steps: Optional[int] = None,
        progress: bool = True,
        prefetch_depth: int = 3,
        prefetch_workers: int = 1,
    ):
        """Drive the loop with an N-deep host prefetch: worker threads
        decode/render up to `prefetch_depth` frames ahead of the device
        (the device sync inside step() releases the GIL).  Depth > 1 absorbs
        decode-latency jitter — at native device speeds a single-frame buffer
        drains on any slow PNG and stalls the chip.  `prefetch_workers` > 1
        decodes frames concurrently (PIL/numpy release the GIL) while
        consumption stays in order — for real datasets whose 3-PNG decode
        exceeds the device frame time."""
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        n = len(self) if max_steps is None else min(max_steps, len(self))
        depth = max(1, prefetch_depth)
        with ThreadPoolExecutor(max_workers=max(1, prefetch_workers)) as pool:
            pending = deque(
                pool.submit(self.dataset.__getitem__, self.current_step + k)
                for k in range(min(depth, n))
            )
            for k in range(n):
                sample = pending.popleft().result()
                if k + depth < n:
                    pending.append(
                        pool.submit(self.dataset.__getitem__, self.current_step + depth)
                    )
                losses = self.step(sample=sample)
                if progress and self.current_step % 25 == 0:
                    print(
                        f"step {self.current_step}/{n} "
                        f"loss={losses.get('loss', 0):.4f} "
                        f"({1.0 / max(np.mean(self.step_times[-25:]), 1e-9):.1f} fps)"
                    )
        self.finish_async()
        return self

    def flush_pipeline(self) -> None:
        """Retire every queued frame (no-op when pipeline_depth == 0 —
        step() drains the queue itself).  After this, the pose graph,
        replay buffer, LC index and metric lists cover every dispatched
        frame."""
        while self._retire_queue:
            self._retire(self._retire_queue.popleft())

    def finish_async(self) -> None:
        """Adopt the in-flight CoVIO update, blocking until it completes."""
        self.flush_pipeline()
        if self._pending_state is not None:
            np.asarray(jax.tree_util.tree_leaves(self._pending_state.params)[0])
            self.state = self._pending_state
            self._pending_state = None
            self.async_updates_adopted += 1

    # ------------------------------------------------------------------
    def trajectory(self, graph: Optional[PoseGraph] = None) -> np.ndarray:
        self.flush_pipeline()
        g = graph if graph is not None else self.pose_graph
        return np.stack([p[:3, 3] for p in g.get_all_poses()])

    def save_metrics(self) -> Path:
        self.flush_pipeline()
        data = {
            "rel_trans_error": self.rel_trans_error,
            "rel_rot_error": self.rel_rot_error,
            "depth_loss": self.depth_loss,
            "velocity_loss": self.velocity_loss,
            "depth_error": self.depth_error,
            "step_times": self.step_times,
        }
        path = self.log_path / "metrics.pkl"
        with open(path, "wb") as f:
            pickle.dump(data, f)
        return path

    def plot_trajectory(self, filename=None):
        """Top-down predicted-vs-GT trajectory PNG (+ .npy dumps) — reference
        Slam.plot_trajectory (slam/slam.py:318-334)."""
        from tpuslam.viz.plots import plot_trajectory

        return plot_trajectory(
            self, filename or self.log_path / f"trajectory_{self.current_step}.png"
        )

    def plot_metrics(self, filename=None):
        """Metric panel PNG (losses, rel errors, depth metrics) — reference
        Slam.plot_metrics (slam/slam.py:336-391)."""
        from tpuslam.viz.plots import plot_metrics

        return plot_metrics(
            self, filename or self.log_path / f"metrics_{self.current_step}.png"
        )

    def save_model(self) -> None:
        from tpuslam.checkpoint.io import save_checkpoint

        save_checkpoint(
            self.log_path,
            epoch=0,
            params=self.state.params,
            batch_stats=self.state.batch_stats,
            meta={"step": int(self.state.step)},
        )
        if self.replay_buffer is not None and self.replay_buffer.storage_dir:
            self.replay_buffer.save_state()

    def final_report(self) -> str:
        from tpuslam.eval.trajectory import calc_error

        self.flush_pipeline()
        pred = self.pose_graph.get_all_poses()
        gt = self.gt_pose_graph.get_all_poses()
        n = min(len(pred), len(gt))
        return calc_error(pred[:n], gt[:n])

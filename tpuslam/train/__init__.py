from tpuslam.train.batch import FrameBatch, concat_batches, make_frame_batch, pad_batch
from tpuslam.train.state import (
    TrainState,
    make_adapt_optimizer,
    make_pretrain_optimizer,
    make_train_state,
    set_learning_rate,
    steplr,
)
from tpuslam.train.steps import (
    LossConfig,
    adapt_step,
    consolidate_step,
    consolidate_step_async,
    eval_step,
    forward,
    predict_depth_step,
    predict_pose_step,
    train_step,
    warp_and_loss,
)

__all__ = [
    "FrameBatch",
    "LossConfig",
    "TrainState",
    "adapt_step",
    "concat_batches",
    "consolidate_step",
    "consolidate_step_async",
    "eval_step",
    "forward",
    "make_adapt_optimizer",
    "make_frame_batch",
    "make_pretrain_optimizer",
    "make_train_state",
    "pad_batch",
    "predict_depth_step",
    "predict_pose_step",
    "set_learning_rate",
    "steplr",
    "warp_and_loss",
]

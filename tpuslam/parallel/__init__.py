from tpuslam.parallel.mesh import make_dp_train_step, make_mesh, shard_batch

__all__ = ["make_dp_train_step", "make_mesh", "shard_batch"]

"""tpuslam — TPU-native continual-learning visual SLAM framework.

A from-scratch JAX/Flax/Optax rebuild of the capabilities of CL-SLAM
(robot-learning-freiburg/CL-SLAM): monodepth2-style self-supervised
depth+pose networks adapted online frame-by-frame, with a diversity
replay buffer, loop-closure detection, and SE(3) pose-graph optimisation
— all designed for XLA: static shapes, fused jitted steps, device meshes.
"""

__version__ = "0.1.0"

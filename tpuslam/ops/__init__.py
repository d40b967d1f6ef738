"""Pallas TPU kernels.

NOTE: importing a name from a submodule here rebinds that attribute on the
package, so `tpuslam.ops.pallas_warp` as an ATTRIBUTE would resolve to the
function, not the module, if they shared a name — import the kernel
functions from this package (or `from tpuslam.ops.pallas_warp import ...`
directly), not via attribute access on `tpuslam.ops`.
"""
from tpuslam.ops.pallas_warp import pallas_warp, pallas_warp_static

__all__ = ["pallas_warp", "pallas_warp_static"]

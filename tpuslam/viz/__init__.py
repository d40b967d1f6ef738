from tpuslam.viz.meshlab import MeshlabExporter, false_color, norm_range_01
from tpuslam.viz.plots import plot_metrics, plot_trajectory, save_depth_panel

__all__ = [
    "MeshlabExporter",
    "false_color",
    "norm_range_01",
    "plot_metrics",
    "plot_trajectory",
    "save_depth_panel",
]

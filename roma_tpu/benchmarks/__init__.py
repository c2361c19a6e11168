from .hpatches import HpatchesHomogBenchmark
from .mega1500 import MEGA_8_SCENES, MEGA_1500_SCENES, MegaDepthPoseEstimationBenchmark
from .mega1500_native import Mega1500NativePoseBenchmark
from .mega_dense import MegadepthDenseBenchmark
from .pose import (
    compute_pose_error,
    compute_relative_pose,
    estimate_pose,
    estimate_pose_uncalibrated,
    pose_auc,
    signed_left_to_right_epipolar_distance,
    signed_point_line_distance,
)
from .scannet import ScanNetBenchmark

__all__ = [
    "HpatchesHomogBenchmark",
    "Mega1500NativePoseBenchmark",
    "MEGA_8_SCENES",
    "MEGA_1500_SCENES",
    "MegaDepthPoseEstimationBenchmark",
    "MegadepthDenseBenchmark",
    "ScanNetBenchmark",
    "compute_pose_error",
    "compute_relative_pose",
    "estimate_pose",
    "estimate_pose_uncalibrated",
    "pose_auc",
]

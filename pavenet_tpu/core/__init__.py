from .assigner import pose_hungarian_assign, build_pose_targets

__all__ = ["pose_hungarian_assign", "build_pose_targets"]

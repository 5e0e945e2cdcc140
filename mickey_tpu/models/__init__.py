from .builder import build_model
from .relative_pose import MickeyRelativePose, RelativePoseOutput

__all__ = ["build_model", "MickeyRelativePose", "RelativePoseOutput"]

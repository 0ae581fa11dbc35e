from lvt_tpu.geometry import quaternion
from lvt_tpu.geometry import se3
from lvt_tpu.geometry.se3 import Pose

__all__ = ["quaternion", "se3", "Pose"]

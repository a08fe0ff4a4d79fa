"""Native (C++) runtime components.

codegen.py generates robot-specialized C++ from a RobotModel (the
TPU-framework analogue of the reference's GRiD CUDA code generator);
lib.py binds the compiled library through ctypes.
"""

from trajoptmpcreference_tpu.native.lib import NativeDynamics

__all__ = ["NativeDynamics"]

from trajoptmpcreference_tpu.models.robot import RobotModel
from trajoptmpcreference_tpu.models.urdf import parse_urdf
from trajoptmpcreference_tpu.models.plants import (
    Plant,
    URDFPlant,
    DoubleIntegratorPlant,
    PendulumPlant,
    CartPolePlant,
)

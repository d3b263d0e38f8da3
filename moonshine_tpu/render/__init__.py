from .camera import generate_rays, LensArrays  # noqa: F401
from .sensor import Sensor, accumulate  # noqa: F401

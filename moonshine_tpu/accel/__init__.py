from .lbvh import BVH, build  # noqa: F401
from .traverse import closest_hit, any_hit, Hit  # noqa: F401

from .textures import TextureAtlas, TextureTable, sample_texture  # noqa: F401
from .types import (  # noqa: F401
    Mesh,
    Geometry,
    Instance,
    Lens,
    Glass,
    Lambert,
    Mirror,
    StandardPBR,
    MaterialInfo,
)
from .world import World, DeviceScene  # noqa: F401

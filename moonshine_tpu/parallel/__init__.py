from .sharding import make_mesh, render_sharded  # noqa: F401

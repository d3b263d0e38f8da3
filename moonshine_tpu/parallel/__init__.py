from .sharding import make_mesh, mesh_from_spec, render_sharded  # noqa: F401

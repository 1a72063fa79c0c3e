from . import bigscene, build, mesh, render  # noqa: F401

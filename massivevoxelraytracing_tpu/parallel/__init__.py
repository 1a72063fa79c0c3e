from . import mesh, render  # noqa: F401

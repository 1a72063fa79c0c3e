from . import meshgen, meshprep  # noqa: F401

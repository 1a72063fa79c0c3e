from . import cpu_oracle  # noqa: F401

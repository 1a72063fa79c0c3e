from . import bits, hashing, morton, rng  # noqa: F401

from . import datasets, trajectory  # noqa: F401

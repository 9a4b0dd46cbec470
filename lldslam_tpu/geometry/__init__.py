from . import se3, sim3, camera, lines  # noqa: F401

from . import bow, database  # noqa: F401

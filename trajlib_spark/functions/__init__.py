from . import geometry, projection  # noqa: F401

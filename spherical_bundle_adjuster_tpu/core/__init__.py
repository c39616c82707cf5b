from . import cube, rotation, sphere  # noqa: F401

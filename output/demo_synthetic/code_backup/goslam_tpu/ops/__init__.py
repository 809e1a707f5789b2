from . import lie, projective  # noqa: F401

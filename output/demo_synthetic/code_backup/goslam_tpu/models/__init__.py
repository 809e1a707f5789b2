from .droidnet import DroidNet  # noqa: F401

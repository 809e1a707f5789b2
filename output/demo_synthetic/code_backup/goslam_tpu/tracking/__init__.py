from .video import VideoBuffer  # noqa: F401

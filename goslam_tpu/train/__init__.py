from .trainer import TrainConfig, fit, make_scene  # noqa: F401

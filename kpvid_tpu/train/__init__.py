from .state import GANTrainState, make_lr_schedule, make_optimizer

__all__ = ["GANTrainState", "make_lr_schedule", "make_optimizer"]

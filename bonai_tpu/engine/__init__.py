from .optim import build_optimizer, build_lr_schedule
from .train_state import TrainState, create_train_state
from .train_step import make_train_step, make_eval_step
from .checkpoint import save_checkpoint, load_checkpoint, latest_checkpoint

__all__ = ["build_optimizer", "build_lr_schedule", "TrainState",
           "create_train_state", "make_train_step", "make_eval_step",
           "save_checkpoint", "load_checkpoint", "latest_checkpoint"]

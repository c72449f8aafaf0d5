from .checkpoint import (
    find_latest_checkpoint,
    load_checkpoint,
    load_train_state,
    save_checkpoint,
    save_train_state,
)

__all__ = [
    "find_latest_checkpoint",
    "load_checkpoint",
    "load_train_state",
    "save_checkpoint",
    "save_train_state",
]

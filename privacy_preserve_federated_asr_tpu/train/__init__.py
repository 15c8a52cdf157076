from .metrics import wer, word_error_counts
from .optim import make_optimizer, stage_trainable_predicate
from .train_state import DACSTrainState, create_train_state
from .trainer import Trainer, TrainerConfig

__all__ = [
    "wer",
    "word_error_counts",
    "make_optimizer",
    "stage_trainable_predicate",
    "DACSTrainState",
    "create_train_state",
    "Trainer",
    "TrainerConfig",
]

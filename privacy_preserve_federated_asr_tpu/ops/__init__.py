from .grl import gradient_reversal
from .gumbel import gumbel_softmax
from .losses import (
    am_softmax_loss,
    cross_entropy_loss,
    fsm_attention_loss,
    recall_family_loss,
)
from .ctc import ctc_loss
from .decode import ad_vote, greedy_ids
from .attention import attention_xla, multihead_attention

__all__ = [
    "gradient_reversal",
    "gumbel_softmax",
    "am_softmax_loss",
    "cross_entropy_loss",
    "fsm_attention_loss",
    "recall_family_loss",
    "ctc_loss",
    "ad_vote",
    "greedy_ids",
    "attention_xla",
    "multihead_attention",
]

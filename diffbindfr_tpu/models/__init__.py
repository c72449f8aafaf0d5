from . import karmadock, mdn_scorer, score_net
from .score_net import ScoreNetConfig, ScoreOutput, Sigmas

__all__ = [
    "karmadock",
    "mdn_scorer",
    "score_net",
    "ScoreNetConfig",
    "ScoreOutput",
    "Sigmas",
]

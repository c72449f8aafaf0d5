from . import score_net
from .score_net import ScoreNetConfig, ScoreOutput, Sigmas

__all__ = ["score_net", "ScoreNetConfig", "ScoreOutput", "Sigmas"]

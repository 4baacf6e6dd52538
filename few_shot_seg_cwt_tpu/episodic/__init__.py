from .inner_loop import adapt_classifier
from .engine import EpisodicEngine

__all__ = ["adapt_classifier", "EpisodicEngine"]

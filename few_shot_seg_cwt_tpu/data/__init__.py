from .classes import (
    CLASS_NAMES,
    NAME_TO_ID,
    get_split_classes,
    filter_classes,
    resolve_train_classes,
    resolve_val_classes,
)
from .listing import make_dataset
from .episodic import EpisodicDataset, StandardDataset, binarize
from .loader import EpisodeLoader, collate, infinite
from .synthetic import SyntheticEpisodicDataset, make_episode, make_episode_batch
from . import transforms

__all__ = [
    "CLASS_NAMES",
    "NAME_TO_ID",
    "get_split_classes",
    "filter_classes",
    "resolve_train_classes",
    "resolve_val_classes",
    "make_dataset",
    "EpisodicDataset",
    "StandardDataset",
    "binarize",
    "EpisodeLoader",
    "collate",
    "infinite",
    "SyntheticEpisodicDataset",
    "make_episode",
    "make_episode_batch",
    "transforms",
]

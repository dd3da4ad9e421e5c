"""Data ingestion (L1): folder datasets, image decode, threaded prefetch,
and the streaming directory watcher for online mode."""

from .dataset import PIVDataset, list_pairs
from .decode import imread_gray, imwrite_gray
from .prefetch import PairPrefetcher
from .watch import StreamingPairSource, WatchMan

__all__ = [
    "PIVDataset",
    "list_pairs",
    "imread_gray",
    "imwrite_gray",
    "PairPrefetcher",
    "StreamingPairSource",
    "WatchMan",
]

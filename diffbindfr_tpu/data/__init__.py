from .sample import (
    BUCKET_LEVELS,
    Buckets,
    DockingSample,
    choose_bucket,
    make_sample,
    stack_samples,
)
from .stream import (
    GroupedBatcher,
    Prefetcher,
    ShuffleStream,
    StreamEntry,
    build_manifest,
)

__all__ = [
    "BUCKET_LEVELS",
    "Buckets",
    "DockingSample",
    "choose_bucket",
    "make_sample",
    "stack_samples",
    "GroupedBatcher",
    "Prefetcher",
    "ShuffleStream",
    "StreamEntry",
    "build_manifest",
]

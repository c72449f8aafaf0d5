from .sample import (
    BUCKET_LEVELS,
    Buckets,
    DockingSample,
    choose_bucket,
    make_sample,
    stack_samples,
)

__all__ = [
    "BUCKET_LEVELS",
    "Buckets",
    "DockingSample",
    "choose_bucket",
    "make_sample",
    "stack_samples",
]

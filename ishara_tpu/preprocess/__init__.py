from .pipeline import (
    GroupStats,
    frame_mask,
    merge_groups,
    normalize_groups,
    numpy_oracle_preprocess,
    preprocess,
    preprocess_batch,
    resample_or_pad,
    split_groups,
    thin_frames,
)

__all__ = [
    "GroupStats",
    "frame_mask",
    "merge_groups",
    "normalize_groups",
    "numpy_oracle_preprocess",
    "preprocess",
    "preprocess_batch",
    "resample_or_pad",
    "split_groups",
    "thin_frames",
]

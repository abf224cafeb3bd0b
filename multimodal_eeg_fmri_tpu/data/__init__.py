"""Host-side data: readers, alignment, splits, batching, synthetic fixtures."""

from multimodal_eeg_fmri_tpu.data.arrays import (
    balanced_class_weights,
    pad_rows,
    stack_trees,
    subset,
    validate_dataset,
)
from multimodal_eeg_fmri_tpu.data.synthetic import (
    synthetic_eeg_trimodal,
    synthetic_fmri,
    synthetic_bridge,
)
from multimodal_eeg_fmri_tpu.data.streaming import (
    make_streaming_featurizer,
    stream_session,
)

__all__ = [
    "make_streaming_featurizer",
    "stream_session",
    "balanced_class_weights",
    "pad_rows",
    "stack_trees",
    "subset",
    "validate_dataset",
    "synthetic_eeg_trimodal",
    "synthetic_fmri",
    "synthetic_bridge",
]

"""Small shared utilities."""

from multimodal_eeg_fmri_tpu.utils.tree import (
    cast_floating,
    count_parameters,
    tree_size_bytes,
)

__all__ = ["cast_floating", "count_parameters", "tree_size_bytes"]

from aliby_tpu.extract.extract import (
    format_extraction,
    format_extraction_overlap,
    process_tree_masks,
    process_tree_masks_overlap,
)

__all__ = [
    "format_extraction",
    "format_extraction_overlap",
    "process_tree_masks",
    "process_tree_masks_overlap",
]

from .checkpoint import (
    convert_dinov2_state_dict,
    convert_mickey_state_dict,
    load_reference_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)

__all__ = [
    "convert_dinov2_state_dict",
    "convert_mickey_state_dict",
    "load_reference_checkpoint",
    "restore_checkpoint",
    "save_checkpoint",
]

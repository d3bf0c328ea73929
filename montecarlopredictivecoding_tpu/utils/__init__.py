from .checkpoint import (
    load_checkpoint,
    load_torch_state_dict,
    save_checkpoint,
    torch_state_dict_to_params,
)

__all__ = [
    "load_checkpoint",
    "save_checkpoint",
    "load_torch_state_dict",
    "torch_state_dict_to_params",
]

from .checkpoint import (
    dlgm_params_to_torch_state_dict,
    load_checkpoint,
    load_torch_dlgm,
    load_torch_state_dict,
    params_to_torch_state_dict,
    resnet9_from_torch_state_dict,
    resnet9_to_torch_state_dict,
    save_checkpoint,
    save_torch_state_dict,
    torch_dlgm_state_dict_to_params,
    torch_state_dict_to_params,
)
from .observability import (
    ProgressLogger,
    energy_absorption_report,
    plot_progress,
    profile_trace,
    slow_down_warning,
)

__all__ = [
    "load_checkpoint",
    "save_checkpoint",
    "load_torch_state_dict",
    "load_torch_dlgm",
    "torch_state_dict_to_params",
    "torch_dlgm_state_dict_to_params",
    "params_to_torch_state_dict",
    "save_torch_state_dict",
    "dlgm_params_to_torch_state_dict",
    "resnet9_from_torch_state_dict",
    "resnet9_to_torch_state_dict",
    "ProgressLogger",
    "energy_absorption_report",
    "plot_progress",
    "profile_trace",
    "slow_down_warning",
]

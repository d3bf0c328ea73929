from .pallas_mcpc import (
    aligned_layout,
    mcpc_chain_pallas,
    model_activation,
    output_pc_var,
    supports_model,
)

__all__ = [
    "aligned_layout",
    "mcpc_chain_pallas",
    "model_activation",
    "output_pc_var",
    "supports_model",
]

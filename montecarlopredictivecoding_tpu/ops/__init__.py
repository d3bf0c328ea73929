from .pallas_mcpc import mcpc_chain_pallas, model_activation, supports_model

__all__ = ["mcpc_chain_pallas", "model_activation", "supports_model"]

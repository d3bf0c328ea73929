from .pallas_mcpc import mcpc_chain_pallas, supports_model

__all__ = ["mcpc_chain_pallas", "supports_model"]

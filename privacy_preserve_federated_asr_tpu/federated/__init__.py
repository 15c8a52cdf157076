from .engine import FederatedConfig, FederatedEngine

__all__ = ["FederatedConfig", "FederatedEngine"]

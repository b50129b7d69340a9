from .detector import Model, SSODModel, build_model, grad_reverse

__all__ = ["Model", "SSODModel", "build_model", "grad_reverse"]

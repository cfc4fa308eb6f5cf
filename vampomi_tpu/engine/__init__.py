from .linear import infere_linear, LinearResult
from .probit import infere_bin_class, ProbitResult

__all__ = ["infere_linear", "LinearResult", "infere_bin_class", "ProbitResult"]

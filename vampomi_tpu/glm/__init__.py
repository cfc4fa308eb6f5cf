from .probit import (
    g1_bin_class,
    g1d_bin_class,
    newton_method_cov,
    mlogl_probit,
    predict_probit,
)

__all__ = [
    "g1_bin_class",
    "g1d_bin_class",
    "newton_method_cov",
    "mlogl_probit",
    "predict_probit",
]

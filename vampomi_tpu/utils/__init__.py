from .mathx import erfcx, normal_cdf, noise_prec_calc, calc_stdev, simulate_mixture
from .telemetry import IterationTelemetry, Tracer

__all__ = [
    "erfcx",
    "normal_cdf",
    "noise_prec_calc",
    "calc_stdev",
    "simulate_mixture",
    "IterationTelemetry",
    "Tracer",
]

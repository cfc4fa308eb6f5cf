from .operator import DesignMatrix, ax, atx, normal_eq_mult, build_design
from .cg import cg_solve, CGResult

__all__ = [
    "DesignMatrix",
    "ax",
    "atx",
    "normal_eq_mult",
    "build_design",
    "cg_solve",
    "CGResult",
]

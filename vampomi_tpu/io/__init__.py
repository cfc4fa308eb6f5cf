from .bin_io import read_bin_slab, write_bin_slab, read_meth_bin
from .phen import read_phen, read_covariates
from .csv_writer import PositionalCSV

__all__ = [
    "read_bin_slab",
    "write_bin_slab",
    "read_meth_bin",
    "read_phen",
    "read_covariates",
    "PositionalCSV",
]

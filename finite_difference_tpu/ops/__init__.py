from . import df64
from .special import norm_cdf, norm_pdf, norm_icdf, bivariate_norm_cdf
from .tridiag import (
    thomas_solve,
    thomas_solve_const,
    thomas_solve_assoc,
    thomas_solve_pscan,
    tridiag_matvec,
)

__all__ = [
    "df64",
    "norm_cdf",
    "norm_pdf",
    "norm_icdf",
    "bivariate_norm_cdf",
    "thomas_solve",
    "thomas_solve_const",
    "thomas_solve_assoc",
    "thomas_solve_pscan",
    "tridiag_matvec",
]

from petsctpu.mat.ell import AIJ, aij_from_scipy, aij_from_dense, aij_to_scipy
from petsctpu.mat.bsr import BAIJ, baij_from_scipy_bsr
from petsctpu.mat.dense import Dense
from petsctpu.mat.base import (
    Shell, Transpose, Normal, NormalHermitian, ShiftScale, Composite, LRC,
    Diagonal, Identity,
)
from petsctpu.mat.coo import ell_from_coo
from petsctpu.mat.stencil import StencilMat, stencil_from_scipy, stencil_to_scipy
from petsctpu.mat.sbaij import SBAIJ, sbaij_from_scipy
from petsctpu.mat.maij import MAIJ
from petsctpu.mat.matis import MatIS, matis_from_subdomains
from petsctpu.mat.dia import DiaMat, dia_fill, dia_from_scipy
from petsctpu.mat.band import BandMat, band_from_scipy
from petsctpu.mat.factory import mat_from_options
from petsctpu.mat.partition import (
    MatPartitioning, edge_cut, partition_rcb, partition_rcm,
)

__all__ = [
    "AIJ", "aij_from_scipy", "aij_from_dense", "aij_to_scipy",
    "BAIJ", "baij_from_scipy_bsr", "Dense",
    "Shell", "Transpose", "Normal", "NormalHermitian", "ShiftScale",
    "Composite", "LRC", "Diagonal", "Identity", "ell_from_coo",
    "StencilMat", "stencil_from_scipy", "stencil_to_scipy",
    "SBAIJ", "sbaij_from_scipy", "MAIJ", "MatIS", "matis_from_subdomains",
    "MatPartitioning", "edge_cut", "partition_rcb", "partition_rcm",
    "DiaMat", "dia_fill", "dia_from_scipy", "BandMat", "band_from_scipy", "mat_from_options",
]

from petsctpu.dm.da import DA, Q1Interp, q1_interp_scipy
from petsctpu.dm.composite import DMComposite
from petsctpu.dm.ao import AO
from petsctpu.dm.dt import (
    gauss_jacobi_quadrature, gauss_lobatto_quadrature, gauss_quadrature,
    gauss_tensor_quadrature,
)

__all__ = ["DA", "Q1Interp", "q1_interp_scipy", "DMComposite", "AO",
           "gauss_quadrature", "gauss_lobatto_quadrature",
           "gauss_jacobi_quadrature", "gauss_tensor_quadrature"]

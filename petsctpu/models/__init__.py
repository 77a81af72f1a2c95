from petsctpu.models.poisson import (laplacian_2d, poisson_3d, ex2_system,
                                     ex45_system, ex34_system, ex29_system, ex45_true_system, ex54_system,
                                     cell_neumann_laplacian_3d)

__all__ = ["laplacian_2d", "poisson_3d", "ex2_system", "ex45_system",
           "ex34_system", "ex29_system", "ex45_true_system", "ex54_system", "cell_neumann_laplacian_3d"]
from petsctpu.models.pbratu import pbratu_initial_guess, pbratu_residual  # noqa: F401,E501
from petsctpu.models.radiative import radiative_initial_guess, radiative_residual  # noqa: F401,E501

from petsctpu.ksp.common import KSPConfig, SolveResult
from petsctpu.ksp.api import KSP, ksp_solve, register_ksp, KSP_REGISTRY

__all__ = ["KSP", "KSPConfig", "SolveResult", "ksp_solve", "register_ksp",
           "KSP_REGISTRY"]

from petsctpu.snes.api import SNES, snes_solve, SNESConfig, SNESResult
from petsctpu.snes.fdjac import ColoredJacobian, jvp_operator, mffd_operator

__all__ = ["SNES", "snes_solve", "SNESConfig", "SNESResult",
           "ColoredJacobian", "jvp_operator", "mffd_operator"]

from petsctpu.pc.api import make_pc, register_pc, PC_REGISTRY
from petsctpu.pc.simple import NonePC, JacobiPC, PBJacobiPC
from petsctpu.pc.factor import ILUPC, LUPC
from petsctpu.pc.sor import SORPC

__all__ = ["make_pc", "register_pc", "PC_REGISTRY", "NonePC", "JacobiPC",
           "PBJacobiPC", "ILUPC", "LUPC", "SORPC"]

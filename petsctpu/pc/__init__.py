from petsctpu.pc.api import make_pc, register_pc, PC_REGISTRY
from petsctpu.pc.simple import NonePC, JacobiPC, PBJacobiPC
from petsctpu.pc.factor import ILUPC, LUPC
from petsctpu.pc.sor import SORPC
from petsctpu.pc.mg import MGPC, make_geometric_mg
from petsctpu.pc.gamg import make_gamg

__all__ = ["make_pc", "register_pc", "PC_REGISTRY", "NonePC", "JacobiPC",
           "PBJacobiPC", "ILUPC", "LUPC", "SORPC", "MGPC",
           "make_geometric_mg", "make_gamg"]

from petsctpu.core.options import Options
from petsctpu.core.errors import ConvergedReason, SNESConvergedReason
from petsctpu.core.layout import Layout

__all__ = ["Options", "ConvergedReason", "SNESConvergedReason", "Layout"]

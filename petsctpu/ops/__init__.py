from petsctpu.ops.stencil_pallas import stencil5_mult_pallas, pallas_available

__all__ = ["stencil5_mult_pallas", "pallas_available"]

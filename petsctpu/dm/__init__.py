from petsctpu.dm.da import DA, Q1Interp, q1_interp_scipy

__all__ = ["DA", "Q1Interp", "q1_interp_scipy"]

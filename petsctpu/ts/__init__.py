from petsctpu.ts.steppers import TS, TSConfig, TSResult, ts_solve

__all__ = ["TS", "TSConfig", "TSResult", "ts_solve"]

from petsctpu.ts.steppers import (
    TS, TSConfig, TSResult, ts_alpha, ts_pseudo, ts_solve,
)
from petsctpu.ts.imex import ts_arkimex, ts_rosw
from petsctpu.ts.characteristic import characteristic_step, ts_characteristic
from petsctpu.ts.gl import ts_gl

__all__ = ["TS", "TSConfig", "TSResult", "ts_alpha", "ts_pseudo",
           "ts_solve", "ts_arkimex", "ts_rosw", "ts_characteristic",
           "characteristic_step", "ts_gl"]

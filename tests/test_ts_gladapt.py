"""TSGLAdapt (ts/gl.py ts_gl_adaptive) vs the reference's adaptive
general-linear run (gl.c TSSolve_GL + gladapt.c TSGLAdaptChoose_Both).

Golden: tests/data/oracle_sweep/tsgl_ex4_adapt.txt — ts ex4 (1-D heat,
m=20) under -ts_type gl: the -info "Adapt chose scheme" stream pins
the ORDER sequence and chosen step sizes, the -ts_monitor lines pin
the executed (t, dt) sequence. Scheme error constants themselves are
pinned exactly (leading error constants from -ts_view)."""

import os
import re

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from petsctpu.ts.gl import gl_error_coeffs, ts_gl_adaptive
from petsctpu.ts.steppers import TSConfig

HERE = os.path.join(os.path.dirname(__file__), "data", "oracle_sweep")


def test_error_constants_match_reference():
    # -ts_view "Leading error constants" (TSGLSchemeView gl.c:393)
    ref = {1: (-1.000e-02, -1.483e-02, -3.450e-02),
           2: (4.801e-03, -2.206e-02, 5.641e-02),
           3: (5.421e-04, -2.296e-02, 2.469e-02),
           4: (2.078e-04, -1.279e-01, 1.278e-01),
           5: (-1.715e-05, 3.771e+00, -3.771e+00)}
    for p, (a, b, g) in ref.items():
        e = gl_error_coeffs(p)
        np.testing.assert_allclose(
            [e["alpha"][0], e["beta"][0], e["gamma"][0]], [a, b, g],
            rtol=1e-3)


def test_adaptive_order_and_step_sequence():
    txt = open(os.path.join(HERE, "tsgl_ex4_adapt.txt")).read()
    chose = [(int(m.group(1)), float(m.group(2))) for m in re.finditer(
        r"Adapt chose scheme \d+ \((\d+),\d+,\d+,\d+\) with step "
        r"size (\S+),", txt)]
    mon = [(float(m.group(2)), float(m.group(3))) for m in re.finditer(
        r"(\d+) TS dt (\S+) time (\S+)", txt)]
    m = 20
    h = 1.0 / (m - 1)
    x = np.arange(m) * h
    u0 = np.sin(6 * np.pi * x) + 3.0 * np.sin(2 * np.pi * x)
    s1 = 1.0 / h ** 2
    A = sp.diags([s1 * np.ones(m - 1), -2 * s1 * np.ones(m),
                  s1 * np.ones(m - 1)], [-1, 0, 1]).tolil()
    A[0, :] = 0.0
    A[0, 0] = 1.0
    A[m - 1, :] = 0.0
    A[m - 1, m - 1] = 1.0
    Ad = jnp.asarray(sp.csr_matrix(A).toarray())

    def rhs(t, u):
        return Ad @ u

    res, rec = ts_gl_adaptive(
        rhs, jnp.asarray(u0), linear_A=sp.csr_matrix(A),
        cfg=TSConfig(dt=h * h / 2.0, max_steps=12, max_time=1.0))
    # order sequence: rec[k] = (t, h, order) of step k+1; the oracle's
    # k-th "Adapt chose" line decides the scheme for step k+2
    orders = [p for (_, _, p) in rec]
    ref_orders = [1] + [p for (p, _) in chose][:len(orders) - 1]
    assert orders == ref_orders, (orders, ref_orders)
    # executed step sizes: digit-exact for the first steps (the
    # TS_LINEAR SNESKSPONLY stage semantics — including its stale-Ydot
    # quirk — are replicated exactly); fp accumulation reaches the 4th
    # digit by step ~8
    # mon[0] is the pre-step monitor; mon[k>=1] = (dt, t) of step k
    ref_h = [dt for (dt, _) in mon][1:]
    ours_h = [hh for (_, hh, _) in rec]
    np.testing.assert_allclose(ours_h[:7], ref_h[:7], rtol=1e-4)
    np.testing.assert_allclose(ours_h, ref_h[:len(ours_h)], rtol=1e-2)
    # final time tracks
    np.testing.assert_allclose(float(res.t), mon[len(ours_h)][1],
                               rtol=1e-3)

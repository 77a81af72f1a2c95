import jax.numpy as jnp
import numpy as np

from petsctpu.core import logging as plog
from petsctpu.ksp import KSP, ksp_solve
from petsctpu.mat import aij_from_scipy
from petsctpu.models import ex2_system
from petsctpu.pc import make_pc


class TestLogSummary:
    def test_events_and_flops_recorded(self):
        A, b, u = ex2_system(6, 6)
        Ad = aij_from_scipy(A)
        plog.log_begin()
        res = ksp_solve(Ad, jnp.asarray(b), pc=make_pc("jacobi", A=Ad),
                        ksp_type="cg", rtol=1e-8)
        table = plog.log_view()
        assert "KSPSolve[cg]" in table
        assert "MatMult" in table
        ev = plog._state.events[("Main", "KSPSolve[cg]")]
        assert ev.count == 1
        assert ev.time > 0
        assert ev.flops > 0
        plog._state.enabled = False

    def test_stages(self):
        plog.log_begin()
        plog.stage_push("Assembly")
        with plog.log_event("MatSetValues"):
            pass
        plog.stage_pop()
        with plog.log_event("Solve"):
            pass
        t = plog.log_view()
        assert "stage: Assembly" in t and "stage: Main" in t
        plog._state.enabled = False

    def test_ksp_view(self, capsys):
        from petsctpu.core.options import Options
        A, b, u = ex2_system(5, 5)
        Ad = aij_from_scipy(A)
        ksp = KSP(options=Options({"ksp_view": None, "pc_type": "ilu"}))
        ksp.set_operators(Ad, A_host=A)
        ksp.solve(jnp.asarray(b))
        out = capsys.readouterr().out
        assert "KSP Object" in out
        assert "type: gmres" in out
        assert "GMRES: restart=30" in out
        assert "left preconditioning" in out
        assert "PC Object" in out


def test_info_channel(capsys):
    """-info verbose stream (PetscInfo, verboseinfo.c): '[0] Func():'
    decision lines from plan/setup code, toggled by the option."""
    import numpy as np

    from petsctpu.core.logging import info_enabled, info_on, petsc_info
    from petsctpu.core.options import Options
    from petsctpu.mat.factory import mat_from_options
    from petsctpu.models import laplacian_2d

    info_on(False)
    assert not info_enabled()
    A = laplacian_2d(70, 70, dtype=np.float32).tocsr()
    mat_from_options(A, Options({"mat_type": "auto", "info": "true"}))
    assert info_enabled()
    import sys
    petsc_info("Test", "hello")
    err = capsys.readouterr().err
    assert "[0] MatFromOptions():" in err and "[0] Test(): hello" in err
    info_on(False)


def test_ams_snooper():
    """AMS analog (core/ams.py): live JSON snapshots of published
    objects + the log_view text over a localhost endpoint
    (PetscObjectAMSPublish, pams.c)."""
    import json
    import urllib.request

    from petsctpu.core import ams

    state = {"its": 0}
    ams.publish("static", 42)
    ams.publish("solver", lambda: dict(state))
    url = ams.start()
    try:
        state["its"] = 7
        snap = json.loads(urllib.request.urlopen(url, timeout=5).read())
        assert snap["static"] == 42
        assert snap["solver"]["its"] == 7
        log = urllib.request.urlopen(url + "/log", timeout=5).read()
        assert isinstance(log, bytes)
    finally:
        ams.stop()

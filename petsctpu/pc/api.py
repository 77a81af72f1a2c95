"""PC registry and factory.

Reference: PC interface src/ksp/pc/interface/precon.c (PCApply :369,
PCSetUp :805) and registry pcregis.c:90-146. A PC here is a pytree
with `.apply(x)`; setup happens in the factory (host-side symbolic
work allowed), apply is jit-safe device code.
"""

from __future__ import annotations

from typing import Optional

from petsctpu.core.options import Options
from petsctpu.pc.simple import NonePC, make_jacobi, make_pbjacobi
from petsctpu.pc.factor import make_ilu, make_lu
from petsctpu.pc.sor import make_sor

PC_REGISTRY = {}


def register_pc(name: str, factory) -> None:
    """PCRegisterDynamic analog: factory(A, A_host, options, axis) -> pc."""
    PC_REGISTRY[name] = factory


def _dtype_of(A):
    return getattr(A, "dtype", None)


def make_pc(pc_type: str, A=None, A_host=None, options: Options = None,
            axis: Optional[str] = None):
    """Build a preconditioner (PCSetFromOptions + PCSetUp analog).

    A: device operator (needed by jacobi/pbjacobi and matrix-free PCs)
    A_host: scipy matrix (needed by factorization/AMG setups)
    """
    opts = options or Options()
    if opts.get_bool("info", False):
        from petsctpu.core.logging import info_on
        info_on()
    from petsctpu.core.logging import petsc_info
    petsc_info("PCSetUp", f"pc_type={pc_type}")
    dt = _dtype_of(A)
    if pc_type in PC_REGISTRY:
        return PC_REGISTRY[pc_type](A, A_host, opts, axis)
    if pc_type == "none":
        return NonePC()
    if pc_type == "jacobi":
        return make_jacobi(A, variant=opts.get_str("pc_jacobi_type", "diag"))
    if pc_type == "pbjacobi":
        bs = opts.get_int("pc_pbjacobi_block_size", 0) or None
        return make_pbjacobi(A, bs=bs)
    if pc_type == "ilu":
        _require_host(A_host, "ilu")
        dtv = opts.get("pc_factor_drop_tolerance")
        if dtv is not None and opts.get_str(
                "pc_factor_drop_solver", "superlu") == "petsc":
            # the reference's NATIVE drop-tolerance ILU
            # (MatILUDTFactor_SeqAIJ — validated against a direct call
            # into the reference source; note the tree's PCILU options
            # path never reaches it, so -pc_factor_drop_tolerance is a
            # no-op there and ksp ex2_7 runs plain ILU(0))
            from petsctpu.pc.factor import make_iludt
            parts = ([float(x) for x in str(dtv).split(",")]
                     if isinstance(dtv, str) else [float(dtv)])
            return make_iludt(
                A_host, dt=parts[0],
                dtcount=int(parts[2]) if len(parts) > 2 else None,
                dtype=dt)
        return make_ilu(A_host, dtype=dt,
                        levels=opts.get_int("pc_factor_levels", 0),
                        ordering=opts.get_str("pc_factor_mat_ordering_type",
                                              "natural"),
                        tri=opts.get_str("pc_factor_tri_solve", "auto"),
                        drop_tol=opts.get_real("pc_factor_drop_tolerance",
                                               0.0),
                        fill_factor=opts.get_real("pc_factor_fill", 10.0),
                        transpose_solves=opts.has(
                            "pc_factor_transpose_solves"))
    if pc_type == "icc":
        _require_host(A_host, "icc")
        from petsctpu.pc.factor import make_icc
        return make_icc(
            A_host, dtype=dt,
            levels=opts.get_int("pc_factor_levels", 0),
            ordering=opts.get_str("pc_factor_mat_ordering_type", "natural"),
            tri=opts.get_str("pc_factor_tri_solve", "auto"),
            # the PCICC default is the Manteuffel shift (icc.c:198)
            shift_type=opts.get_str("pc_factor_shift_type",
                                    "positive_definite"),
            shift_amount=opts.get("pc_factor_shift_amount"),
            zeropivot=opts.get("pc_factor_zeropivot"))
    if pc_type in ("lu", "cholesky"):
        _require_host(A_host, pc_type)
        return make_lu(A_host, dtype=dt)
    if pc_type == "mg":
        da = opts.get("pc_mg_da")
        if da is None:
            raise ValueError("pc_type=mg needs options key 'pc_mg_da' (a DA)"
                             " for the grid hierarchy; use pc_type=gamg for "
                             "unstructured operators")
        from petsctpu.mat.stencil import StencilMat
        setup = opts.get_str("pc_mg_setup_type", "auto")
        if setup != "host" and isinstance(A, StencilMat) and \
                not any(b == "periodic" for b in (A.boundary or ())) and \
                opts.get_str("mg_levels_pc_type", "jacobi") == "jacobi":
            # device setup: on-device Galerkin probing, no host SpGEMM
            from petsctpu.pc.mg import make_geometric_mg_device
            return make_geometric_mg_device(A, da, dtype=dt, options=opts)
        _require_host(A_host, "mg")
        from petsctpu.pc.mg import make_geometric_mg
        return make_geometric_mg(A_host, da, dtype=dt, options=opts)
    if pc_type == "gamg":
        _require_host(A_host, "gamg")
        from petsctpu.pc.gamg import make_gamg
        return make_gamg(A_host, dtype=dt, options=opts)
    if pc_type == "bjacobi":
        # serial block Jacobi = zero-overlap ASM on contiguous row
        # blocks (PCSetUp_BJacobi bjacobi.c:14; the sharded variant
        # lives in pc/parallel.py)
        _require_host(A_host, "bjacobi")
        from petsctpu.pc.asm import make_asm
        return make_asm(A_host, dtype=dt, options=opts,
                        nblocks=opts.get_int("pc_bjacobi_blocks", 1),
                        overlap=0, restricted=False,
                        sub_pc=opts.get_str("sub_pc_type", "ilu"))
    if pc_type == "asm" or pc_type == "gasm":
        _require_host(A_host, "asm")
        from petsctpu.pc.asm import make_asm
        return make_asm(A_host, dtype=dt, options=opts)
    if pc_type == "fieldsplit":
        _require_host(A_host, "fieldsplit")
        from petsctpu.pc.fieldsplit import make_fieldsplit
        fields = opts.get("pc_fieldsplit_fields")
        if fields is None:
            raise ValueError("pc_type=fieldsplit needs options key "
                             "'pc_fieldsplit_fields' (list of IS)")
        if len(fields) != 2:
            from petsctpu.pc.fieldsplit import make_multi_fieldsplit
            return make_multi_fieldsplit(A_host, fields, options=opts,
                                         dtype=dt)
        return make_fieldsplit(A_host, fields, options=opts, dtype=dt)
    if pc_type == "ksp":
        from petsctpu.pc.composite import KSPPC
        from petsctpu.ksp.api import config_from_options
        from petsctpu.ksp.common import KSPConfig
        inner = opts.prefixed("ksp_")
        icfg = config_from_options(inner, KSPConfig(ksp_type="gmres",
                                                    rtol=1e-2, maxits=20))
        ipc_type = inner.get_str("pc_type",
                                 "ilu" if A_host is not None else "jacobi")
        ipc = make_pc(ipc_type, A=A, A_host=A_host, options=inner, axis=axis)
        if icfg.ksp_type == "specest":
            # -pc_type ksp -ksp_ksp_type specest: the stateful two-phase
            # estimator (specest.c); needs the host-driven flexible outer
            from petsctpu.ksp.specest import SpecEstPC
            spec = inner.prefixed("specest_")
            cheap = inner.prefixed("speccheap_")
            return SpecEstPC(
                A, pc=ipc,
                est_type=spec.get_str("ksp_type", "gmres"),
                cheap_type=cheap.get_str("ksp_type", "chebyshev"),
                est_maxits=spec.get_int("ksp_max_it", 5),
                cheap_maxits=cheap.get_int("ksp_max_it", 5),
                minfactor=inner.get_real("ksp_specest_minfactor", 0.9),
                maxfactor=inner.get_real("ksp_specest_maxfactor", 1.1),
                richfactor=inner.get_real("ksp_specest_richfactor", 1.0))
        return KSPPC(A, ipc, icfg, axis)
    if pc_type == "composite":
        from petsctpu.pc.composite import CompositePC
        names = opts.get_str("pc_composite_pcs", "jacobi,sor").split(",")
        mode = opts.get_str("pc_composite_type", "additive")
        pcs = tuple(make_pc(nm.strip(), A=A, A_host=A_host,
                            options=opts.prefixed(f"sub_{i}_"), axis=axis)
                    for i, nm in enumerate(names))
        return CompositePC(pcs, A, mode)
    if pc_type == "mat":
        from petsctpu.pc.composite import MatPC
        return MatPC(opts.get("pc_mat_operator") or A)
    if pc_type == "shell":
        # PCShell (src/ksp/pc/impls/shell): user-callback PC. The
        # callable rides the Options object (same pattern as
        # pc_mat_operator): apply_fn(ctx, x) -> z.
        from petsctpu.pc.composite import ShellPC
        ap = opts.get("pc_shell_apply")
        if ap is None:
            raise ValueError("pc_type=shell needs pc_shell_apply "
                             "(a callable (ctx, x) -> z) in options")
        return ShellPC(opts.get("pc_shell_ctx"), ap)
    if pc_type == "hmpi":
        # PCHMPI (src/ksp/pc/impls/openmp): outer-sequential user,
        # inner-parallel solve over the device mesh
        _require_host(A_host, "hmpi")
        from petsctpu.pc.parallel import make_hmpi
        return make_hmpi(A_host, options=opts, dtype=dt)
    if pc_type == "redundant":
        # serial semantics: every rank solves the full system → exact LU
        # (src/ksp/pc/impls/redundant); the subcomm variant arrives with
        # multi-host meshes
        _require_host(A_host, "redundant")
        return make_lu(A_host, dtype=dt)
    if pc_type in ("nn", "bddc"):
        from petsctpu.mat.matis import MatIS
        if not isinstance(A, MatIS):
            raise ValueError(f"pc_type={pc_type} needs a MatIS operator "
                             "(unassembled local Neumann matrices)")
        if pc_type == "bddc":
            # proper vertex/edge/face constraint spaces (bddc.c)
            from petsctpu.pc.bddc import make_bddc
            return make_bddc(
                A, dtype=dt,
                vertices=opts.get_bool("pc_bddc_use_vertices", True),
                edges=opts.get_bool("pc_bddc_use_edges", True))
        from petsctpu.pc.nn import make_nn
        return make_nn(A, dtype=dt,
                       balanced=opts.get_bool("pc_nn_balanced", True))
    if pc_type == "eisenstat":
        _require_host(A_host, "eisenstat")
        from petsctpu.pc.extra import make_eisenstat
        return make_eisenstat(A_host,
                              omega=opts.get_real("pc_eisenstat_omega", 1.0),
                              dtype=dt)
    if pc_type == "galerkin":
        _require_host(A_host, "galerkin")
        from petsctpu.pc.extra import make_galerkin
        P = opts.get("pc_galerkin_interpolation")
        if P is None:
            raise ValueError("pc_type=galerkin needs options key "
                             "'pc_galerkin_interpolation' (device op) and "
                             "'pc_galerkin_interpolation_host' (scipy)")
        return make_galerkin(A_host, P,
                             P_host=opts.get("pc_galerkin_interpolation_host"),
                             dtype=dt)
    if pc_type == "redistribute":
        _require_host(A_host, "redistribute")
        from petsctpu.pc.extra import make_redistribute
        return make_redistribute(A_host, dtype=dt)
    if pc_type == "lsc":
        from petsctpu.pc.extra import make_lsc
        A00 = opts.get("pc_lsc_a00")
        B = opts.get("pc_lsc_b")
        if A00 is None or B is None:
            raise ValueError("pc_type=lsc needs options keys 'pc_lsc_a00' "
                             "and 'pc_lsc_b' (scipy blocks)")
        return make_lsc(A00, B, dtype=dt)
    if pc_type == "svd":
        _require_host(A_host, "svd")
        from petsctpu.pc.extra import make_svd
        return make_svd(A_host, dtype=dt,
                        rtol=opts.get_real("pc_svd_monitor_rtol", 1e-12))
    if pc_type == "cp":
        _require_host(A_host, "cp")
        from petsctpu.pc.extra import make_cp
        return make_cp(A_host, dtype=dt)
    if pc_type == "supportgraph":
        _require_host(A_host, "supportgraph")
        from petsctpu.pc.supportgraph import make_supportgraph
        return make_supportgraph(A_host, dtype=dt, options=opts)
    if pc_type == "asa":
        _require_host(A_host, "asa")
        from petsctpu.pc.asa import make_asa
        return make_asa(A_host, dtype=dt, options=opts)
    if pc_type in ("exotic", "wb"):
        _require_host(A_host, "exotic")
        from petsctpu.pc.exotic import make_exotic_from_options
        return make_exotic_from_options(A, A_host, opts)
    if pc_type == "tfs":
        _require_host(A_host, "tfs")
        from petsctpu.pc.exotic import make_tfs
        return make_tfs(A_host, dtype=dt,
                        drop_tol=opts.get_real("pc_tfs_drop_tolerance", 0.0))
    if pc_type == "fft":
        from petsctpu.mat.fft import make_poisson_fft
        dims = opts.get("pc_fft_dims")
        if dims is None:
            raise ValueError("pc_type=fft needs options key 'pc_fft_dims' "
                             "(grid shape of the Dirichlet Laplacian)")
        return make_poisson_fft(tuple(dims), dtype=dt,
                                scale=opts.get_real("pc_fft_scale", 1.0),
                                shift=opts.get_real("pc_fft_shift", 0.0))
    if pc_type == "spai":
        _require_host(A_host, "spai")
        from petsctpu.pc.spai import make_spai
        return make_spai(A_host, dtype=dt,
                         pattern_power=opts.get_int("pc_spai_nbsteps", 1),
                         max_pattern=opts.get_int("pc_spai_max", 64))
    if pc_type == "sor":
        _require_host(A_host, "sor")
        omega = opts.get_real("pc_sor_omega", 1.0)
        sweeps = opts.get_int("pc_sor_its", 1)
        fwd = opts.get_bool("pc_sor_forward", False)
        bwd = opts.get_bool("pc_sor_backward", False)
        symmetric = opts.get_bool("pc_sor_symmetric", False) \
            or not (fwd or bwd)
        if not opts.get_bool("mat_no_inode", False):
            # reference default: AIJ matrices with inodes take the
            # node-blocked sweep (MatSOR_SeqAIJ_Inode, inode.c:2757;
            # silently — only -mat_no_inode restores scalar SOR).
            # make_inode_sor returns None for omega != 1 exactly as
            # the reference refuses that combination.
            from petsctpu.pc.sor import make_inode_sor
            ipc = make_inode_sor(A_host, omega=omega, sweeps=sweeps,
                                 symmetric=symmetric,
                                 forward_only=fwd and not symmetric,
                                 dtype=dt)
            if ipc is not None:
                return ipc
        return make_sor(
            A_host, omega=omega, sweeps=sweeps, symmetric=symmetric,
            dtype=dt)
    raise ValueError(f"unknown pc_type {pc_type!r}; known: "
                     f"{sorted(set(list(PC_REGISTRY) + ['none','jacobi','pbjacobi','ilu','lu','cholesky','icc','sor']))}")


def _require_host(A_host, name):
    if A_host is None:
        raise ValueError(f"pc_type={name} needs the host (scipy) matrix: "
                         "pass A_host to make_pc/KSP.set_operators")

#!/usr/bin/env python3
"""Mint the declarative golden sweep (tests/sweep_cases.py) from the
reference oracle.

Prereq: scripts/build_reference_oracle.sh ran (libpetsc.a under
/tmp/petsc/arch/lib). Compiles each needed tutorial once (cached in
/tmp/oracle_bins), runs every case's exact flags with
-ksp_monitor_short / -snes_monitor_short, and writes
tests/data/oracle_sweep/<tag>.txt with a provenance header.

Usage: python scripts/mint_sweep.py [tag-substring ...]
"""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tests"))
from sweep_cases import CASES  # noqa: E402

REF = "/root/reference"
BINDIR = "/tmp/oracle_bins"
OUT = os.path.join(ROOT, "tests", "data", "oracle_sweep")

EX_SRC = {
    "ex1": f"{REF}/src/ksp/ksp/examples/tutorials/ex1.c",
    "ex2": f"{REF}/src/ksp/ksp/examples/tutorials/ex2.c",
    "ex23": f"{REF}/src/ksp/ksp/examples/tutorials/ex23.c",
    "ex10": f"{REF}/src/ksp/ksp/examples/tutorials/ex10.c",
    "snes_ex5": f"{REF}/src/snes/examples/tutorials/ex5.c",
    "snes_ex14": f"{REF}/src/snes/examples/tutorials/ex14.c",
    "ts_ex4": f"{REF}/src/ts/examples/tutorials/ex4.c",
}


def build(ex):
    os.makedirs(BINDIR, exist_ok=True)
    binp = os.path.join(BINDIR, ex)
    src = EX_SRC[ex]
    if os.path.exists(binp) and os.path.getmtime(binp) > os.path.getmtime(src):
        return binp
    cmd = ["gcc", "-O2", "-w", "-I/tmp/petsc/include",
           "-I/tmp/petsc/arch/include", "-I/tmp/petsc/include/mpiuni",
           src, "-o", binp, "-L/tmp/petsc/arch/lib", "-lpetsc",
           "/usr/lib/x86_64-linux-gnu/liblapack.so.3",
           "/usr/lib/x86_64-linux-gnu/libblas.so.3", "-lm", "-ldl"]
    subprocess.run(cmd, check=True)
    return binp


def sys_argv(spec):
    """system spec -> (example binary key, extra argv)."""
    if spec.startswith("file:"):
        return "ex10", ["-f0", os.path.join(ROOT, "tests", "data",
                                            spec[5:])]
    ex, _, params = spec.partition(":")
    argv = []
    for kv in params.split(","):
        if kv:
            k, v = kv.split("=")
            if ex == "snes_ex5" and k == "m":
                argv += ["-da_grid_x", v, "-da_grid_y", v]
            elif ex == "snes_ex14" and k == "m":
                argv += ["-da_grid_x", v, "-da_grid_y", v,
                         "-da_grid_z", v]
            else:
                argv += [f"-{k}", v]
    return ex, argv


def main():
    filt = sys.argv[1:]
    os.makedirs(OUT, exist_ok=True)
    minted = skipped = 0
    for c in CASES:
        if filt and not any(f in c.tag for f in filt):
            continue
        ex, argv = sys_argv(c.sys)
        binp = build(ex)
        if ex.startswith("snes"):
            mon = ["-snes_monitor_short"]
        elif ex.startswith("ts"):
            mon = []                     # ex4 prints Timestep lines
        else:
            mon = ["-ksp_monitor_short", "-ksp_max_it", "2000"]
        full = ([binp] + argv + c.args.split() + c.oracle_args.split()
                + mon)
        r = subprocess.run(full, capture_output=True, text=True,
                           timeout=300)
        path = os.path.join(OUT, c.tag + ".txt")
        with open(path, "w") as f:
            f.write("# cmd: " + " ".join(full[1:]) + "\n")
            f.write(f"# example: {ex}  np-semantics: {c.np}\n")
            f.write(r.stdout)
            if r.returncode != 0:
                f.write(f"\n# ORACLE rc={r.returncode}\n")
                f.write(r.stderr[-2000:])
        status = "ok" if r.returncode == 0 else f"RC{r.returncode}"
        nres = (r.stdout.count("Residual norm")
                + r.stdout.count("Function norm")
                + r.stdout.count("Timestep"))
        print(f"{c.tag:40s} {status}  {nres} monitor lines")
        minted += 1
    print(f"minted {minted} (skipped {skipped})")


if __name__ == "__main__":
    main()

#!/bin/bash
# Mint complex-oracle artifacts for ksp tutorials ex39 (2-D lattice
# gauge, PCASA, PETSC_USE_COMPLEX): the assembled gauge operator H in
# reference binary format + the monitor golden. Requires
# build_reference_oracle_complex.sh to have produced /tmp/petsc-complex.
#
# The dump is made by sed-patching the ORACLE's own copy of ex39.c
# (insert a binary MatView after assembly) — no reference source
# enters this repository; only the emitted artifacts do:
#   tests/data/ex39_H.bin     (complex SeqAIJ, 72x72)
#   tests/oracle_ex39_1.txt   (full -mat_no_inode -ksp_monitor_short run)
set -e
REPO=$(cd "$(dirname "$0")"/.. && pwd)
DST=/tmp/petsc-complex
SRC=$DST/src/ksp/ksp/examples/tutorials/ex39.c
PATCHED=$DST/ex39_dump.c
sed 's|/\* it looks like H is Hermetian \*/|{ PetscViewer vv; PetscViewerBinaryOpen(PETSC_COMM_WORLD, "ex39_H.bin", FILE_MODE_WRITE, \&vv); MatView(H, vv); PetscViewerDestroy(\&vv); }\n  /* it looks like H is Hermetian */|' \
    $SRC > $PATCHED
cd $DST
gcc -O2 -w -Iinclude -Iarch/include -Iinclude/mpiuni ex39_dump.c -o /tmp/ex39_dump \
    arch/obj/stubs.o -Larch/lib -lpetsc \
    /usr/lib/x86_64-linux-gnu/liblapack.so.3 \
    /usr/lib/x86_64-linux-gnu/libblas.so.3 -lm -ldl
cd /tmp
./ex39_dump -mat_no_inode -ksp_monitor_short > /tmp/ex39_oracle.txt 2>&1
mkdir -p $REPO/tests/data
cp /tmp/ex39_H.bin $REPO/tests/data/ex39_H.bin
cp /tmp/ex39_oracle.txt $REPO/tests/oracle_ex39_1.txt
echo "minted: tests/data/ex39_H.bin + tests/oracle_ex39_1.txt"

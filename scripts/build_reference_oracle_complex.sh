#!/bin/bash
# Build the reference tree as a COMPLEX-scalar oracle in
# /tmp/petsc-complex (PETSC_USE_COMPLEX via C99 _Complex — petscmath.h
# :94 route). Used to mint goldens for complex examples (ksp
# ex39/ex40 PCASA lattice gauge; the shipped tree has no complex
# outputs). Same hand-built flow as build_reference_oracle.sh.
set -e
SRC=/root/reference
DST=/tmp/petsc-complex
[ -d $DST ] || cp -r $SRC $DST
mkdir -p $DST/arch/include $DST/arch/lib $DST/arch/obj
sed -e 's|#define PETSC_USE_SCALAR_REAL 1|#define PETSC_USE_COMPLEX 1\n#define PETSC_HAVE_C99_COMPLEX 1|' \
    -e 's|/tmp/petsc/arch/lib|/tmp/petsc-complex/arch/lib|' \
    -e 's|#define PETSC_DIR "/tmp/petsc"|#define PETSC_DIR "/tmp/petsc-complex"|' \
    "$(dirname "$0")"/oracle_petscconf.h > $DST/arch/include/petscconf.h
cp "$(dirname "$0")"/oracle_stubs.c $DST/stubs.c
cat > $DST/arch/include/petscfix.h <<'HDR'
#define INCLUDED_PETSCFIX_H
HDR
cat > $DST/arch/include/petscmachineinfo.h <<'HDR'
static const char *petscmachineinfo = "\noracle\n";
static const char *petsccompilerinfo = "\ngcc\n";
static const char *petsccompilerflagsinfo = "\n-O2\n";
static const char *petsclinkerinfo = "\ncc\n";
HDR
cat > $DST/arch/include/petscconfiginfo.h <<'HDR'
static const char *petscconfigureruntime = "oracle";
static const char *petscconfigureoptions = "hand-built complex oracle";
HDR
cd $DST
find src -name '*.c' \
  | grep -v -E '/examples/|/ftn-auto/|/ftn-custom/|/f90-custom/|/ftn-kernels/|/benchmarks/|/contrib/' \
  | grep -v -E 'cusp|cuda|/gpu/|viennacl' \
  | grep -v -E '/impls/mesh/|/sieve/|/ams/|/matlab|mathematica|/sprng/|/python|pythonsys' \
  | grep -v -E '/draw/impls/x/|/draw/impls/win32/|/draw/impls/opengl/' \
  | grep -v -E '/superlu|/umfpack|/lusol|/essl|/spooles|/mumps|/pastix|/clique|/cholmod|/elemental|fftw' \
  | grep -v -E '/pmetis/|/chaco/|/party/|/scotch/|/hypre/|/ml/|/spai/|/parms/|/supportgraph/|/sundials/|/prometheus/' \
  | grep -v -E '/threadcomm/impls/pthread/|/threadcomm/impls/openmp/' \
  | grep -v -E 'adic|adifor|matlabengine' \
  | grep -v -E 'yaml|f90-src|/hdf5/|sfwindow|rs6000_time|nt_time|usfft|/cartesian/|/bddc/|/rsaug/|/amd/' \
  > filelist.txt
compile_one() {
  obj="arch/obj/$(echo "$1" | sed 's|/|_|g; s|\.c$|.o|')"
  gcc -c -O2 -fPIC -w -Iinclude -Iarch/include -Iinclude/mpiuni "$1" -o "$obj" \
    || echo "FAIL $1"
}
export -f compile_one
xargs -P 4 -n 1 bash -c 'compile_one "$0"' < filelist.txt
gcc -c -O2 -w -Iinclude -Iarch/include -Iinclude/mpiuni stubs.c -o arch/obj/stubs.o 2>/dev/null || true
ar rcs arch/lib/libpetsc.a arch/obj/*.o
echo "complex oracle library: $DST/arch/lib/libpetsc.a"

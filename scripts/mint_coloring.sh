#!/bin/bash
# Mint MatGetColoring goldens (tests/data/oracle_coloring/*.txt) from
# the hand-built reference oracle: entire color vectors for
# -mat_coloring_type sl|lf|id over the ex10 datafiles (incl. the
# inode-compressed path exercised by ex10_baij3's bs=3 blocks).
# Prereq: scripts/build_reference_oracle.sh.
set -e
cd "$(dirname "$0")/.."
gcc -O2 -w -I/tmp/petsc/include -I/tmp/petsc/arch/include \
    -I/tmp/petsc/include/mpiuni scripts/color_probe.c -o /tmp/color_probe \
    -L/tmp/petsc/arch/lib -lpetsc \
    /usr/lib/x86_64-linux-gnu/liblapack.so.3 \
    /usr/lib/x86_64-linux-gnu/libblas.so.3 -lm -ldl
mkdir -p tests/data/oracle_coloring
for f in ex10_nonsym ex10_poisson ex10_baij3; do
  for t in sl lf id; do
    /tmp/color_probe -f tests/data/$f.bin -ctype $t \
      > tests/data/oracle_coloring/${f}_${t}.txt 2>/dev/null
  done
done
echo "minted $(ls tests/data/oracle_coloring | wc -l) coloring goldens"

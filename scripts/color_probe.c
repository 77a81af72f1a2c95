#include <petscmat.h>
int main(int argc, char **argv) {
  PetscInitialize(&argc, &argv, 0, 0);
  char file[512], type[64] = "sl";
  PetscBool flg;
  PetscOptionsGetString(PETSC_NULL, "-f", file, sizeof file, &flg);
  PetscOptionsGetString(PETSC_NULL, "-ctype", type, sizeof type, &flg);
  PetscViewer v; Mat A;
  PetscViewerBinaryOpen(PETSC_COMM_WORLD, file, FILE_MODE_READ, &v);
  MatCreate(PETSC_COMM_WORLD, &A);
  MatSetType(A, MATSEQAIJ);
  MatLoad(A, v);
  PetscViewerDestroy(&v);
  ISColoring ic;
  MatGetColoring(A, type, &ic);
  PetscInt nis; IS *isa;
  ISColoringGetIS(ic, &nis, &isa);
  PetscInt n, ncols;
  MatGetSize(A, &n, &ncols);
  PetscInt *color = malloc(sizeof(PetscInt)*ncols);
  for (PetscInt c = 0; c < nis; c++) {
    PetscInt len; const PetscInt *idx;
    ISGetLocalSize(isa[c], &len);
    ISGetIndices(isa[c], &idx);
    for (PetscInt k = 0; k < len; k++) color[idx[k]] = c;
    ISRestoreIndices(isa[c], &idx);
  }
  PetscPrintf(PETSC_COMM_WORLD, "ncolors %D\n", nis);
  for (PetscInt j = 0; j < ncols; j++)
    PetscPrintf(PETSC_COMM_WORLD, "%D ", color[j]);
  PetscPrintf(PETSC_COMM_WORLD, "\n");
  PetscFinalize();
  return 0;
}

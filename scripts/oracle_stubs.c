/* stubs for excluded optional subsystems (python bindings) */
#include <petscsys.h>
PetscErrorCode PetscPythonInitialize(const char pyexe[], const char pylib[])
{ SETERRQ(PETSC_COMM_SELF, PETSC_ERR_SUP, "No python support in oracle build"); }
PetscErrorCode PetscPythonMonitorSet(PetscObject obj, const char url[])
{ SETERRQ(PETSC_COMM_SELF, PETSC_ERR_SUP, "No python support in oracle build"); }
PetscErrorCode PetscPythonFinalize(void) { return 0; }

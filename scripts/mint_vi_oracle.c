/* Oracle harness (ours — links the hand-built reference library):
   1-D obstacle problem  -u'' = -8  on (0,1), u >= psi(x), u(0)=u(1)=0
   discretized on n interior points, solved with SNESVINEWTONSSLS or
   SNESVINEWTONRSLS (-snes_type), -snes_monitor streams captured as
   goldens for tests/test_vi.py.

   Build (after scripts/build_reference_oracle.sh):
     gcc -O2 -w -I/tmp/petsc/include -I/tmp/petsc/arch/include \
         -I/tmp/petsc/include/mpiuni scripts/mint_vi_oracle.c \
         -o /tmp/vi_oracle /tmp/petsc/arch/obj/stubs.o \
         -L/tmp/petsc/arch/lib -lpetsc liblapack liblblas -lm -ldl
*/
#include <petscsnes.h>

typedef struct { PetscInt n; PetscReal h; } Ctx;

static PetscErrorCode FormFunction(SNES snes, Vec X, Vec F, void *ptr)
{
  Ctx            *c = (Ctx*)ptr;
  const PetscScalar *x;
  PetscScalar    *f;
  PetscInt       i;
  PetscReal      ih2 = 1.0/(c->h*c->h);
  PetscErrorCode ierr;

  PetscFunctionBegin;
  ierr = VecGetArrayRead(X,&x);CHKERRQ(ierr);
  ierr = VecGetArray(F,&f);CHKERRQ(ierr);
  for (i=0; i<c->n; i++) {
    PetscScalar xl = (i==0)       ? 0.0 : x[i-1];
    PetscScalar xr = (i==c->n-1)  ? 0.0 : x[i+1];
    f[i] = ih2*(2.0*x[i]-xl-xr) + 8.0;
  }
  ierr = VecRestoreArrayRead(X,&x);CHKERRQ(ierr);
  ierr = VecRestoreArray(F,&f);CHKERRQ(ierr);
  PetscFunctionReturn(0);
}

static PetscErrorCode FormJacobian(SNES snes, Vec X, Mat *J, Mat *B,
                                   MatStructure *flag, void *ptr)
{
  Ctx            *c = (Ctx*)ptr;
  PetscInt       i, col[3];
  PetscScalar    v[3];
  PetscReal      ih2 = 1.0/(c->h*c->h);
  PetscErrorCode ierr;

  PetscFunctionBegin;
  for (i=0; i<c->n; i++) {
    PetscInt nc = 0;
    if (i > 0)      { col[nc] = i-1; v[nc++] = -ih2; }
    col[nc] = i; v[nc++] = 2.0*ih2;
    if (i < c->n-1) { col[nc] = i+1; v[nc++] = -ih2; }
    ierr = MatSetValues(*B,1,&i,nc,col,v,INSERT_VALUES);CHKERRQ(ierr);
  }
  ierr = MatAssemblyBegin(*B,MAT_FINAL_ASSEMBLY);CHKERRQ(ierr);
  ierr = MatAssemblyEnd(*B,MAT_FINAL_ASSEMBLY);CHKERRQ(ierr);
  *flag = SAME_NONZERO_PATTERN;
  PetscFunctionReturn(0);
}

int main(int argc, char **argv)
{
  SNES           snes;
  Vec            x, r, xl, xu;
  Mat            J;
  Ctx            c;
  PetscInt       i;
  PetscErrorCode ierr;

  PetscInitialize(&argc,&argv,(char*)0,NULL);
  c.n = 40;
  ierr = PetscOptionsGetInt(PETSC_NULL,"-n",&c.n,PETSC_NULL);CHKERRQ(ierr);
  c.h = 1.0/(c.n+1);

  ierr = VecCreateSeq(PETSC_COMM_SELF,c.n,&x);CHKERRQ(ierr);
  ierr = VecDuplicate(x,&r);CHKERRQ(ierr);
  ierr = VecDuplicate(x,&xl);CHKERRQ(ierr);
  ierr = VecDuplicate(x,&xu);CHKERRQ(ierr);
  ierr = VecSet(x,0.0);CHKERRQ(ierr);
  {
    PetscScalar *l;
    ierr = VecGetArray(xl,&l);CHKERRQ(ierr);
    for (i=0; i<c.n; i++) {
      PetscReal xs = (i+1)*c.h;
      l[i] = -0.2 + 0.4*(xs-0.5)*(xs-0.5);
    }
    ierr = VecRestoreArray(xl,&l);CHKERRQ(ierr);
  }
  ierr = VecSet(xu,SNES_VI_INF);CHKERRQ(ierr);

  ierr = MatCreateSeqAIJ(PETSC_COMM_SELF,c.n,c.n,3,PETSC_NULL,&J);CHKERRQ(ierr);

  ierr = SNESCreate(PETSC_COMM_SELF,&snes);CHKERRQ(ierr);
  ierr = SNESSetFunction(snes,r,FormFunction,&c);CHKERRQ(ierr);
  ierr = SNESSetJacobian(snes,J,J,FormJacobian,&c);CHKERRQ(ierr);
  ierr = SNESVISetVariableBounds(snes,xl,xu);CHKERRQ(ierr);
  ierr = SNESSetType(snes,SNESVINEWTONSSLS);CHKERRQ(ierr);
  ierr = SNESSetFromOptions(snes);CHKERRQ(ierr);
  ierr = SNESSolve(snes,PETSC_NULL,x);CHKERRQ(ierr);
  {
    SNESConvergedReason reason;
    PetscInt            its;
    ierr = SNESGetConvergedReason(snes,&reason);CHKERRQ(ierr);
    ierr = SNESGetIterationNumber(snes,&its);CHKERRQ(ierr);
    ierr = PetscPrintf(PETSC_COMM_SELF,"reason %d its %D\n",(int)reason,its);CHKERRQ(ierr);
  }
  PetscFinalize();
  return 0;
}

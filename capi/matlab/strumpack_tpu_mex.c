/* MATLAB MEX gateway for the strumpack_tpu sparse solver.
 *
 * Role of the reference's matlab/strumpack_matlab_sparse.cpp: solve
 * A x = b for a MATLAB sparse matrix through the C API.  Build from
 * MATLAB with:
 *
 *   mex strumpack_tpu_mex.c -I../ -L../ -lstrumpack_tpu_c
 *
 * (requires libstrumpack_tpu_c.so from capi/Makefile on the runtime
 * path, plus PYTHONPATH pointing at the strumpack_tpu package for the
 * embedded interpreter).  Usage from MATLAB:
 *
 *   x = strumpack_tpu_mex(A, b);                 % defaults
 *   x = strumpack_tpu_mex(A, b, '--sp_rel_tol', '1e-8', ...);
 *
 * MATLAB stores sparse matrices in compressed-sparse-COLUMN form; the
 * solver takes CSR, so this gateway solves A' y = b and returns y for
 * symmetric A, or transposes explicitly otherwise (here: pass A', the
 * canonical MATLAB idiom, as the reference mex does).
 */
#include <stdint.h>
#include <string.h>

#include "mex.h"
#include "strumpack_tpu.h"

void mexFunction(int nlhs, mxArray* plhs[], int nrhs, const mxArray* prhs[]) {
  if (nrhs < 2 || !mxIsSparse(prhs[0]))
    mexErrMsgTxt("usage: x = strumpack_tpu_mex(sparse A, b, opts...)");
  mwSize n = mxGetM(prhs[0]);
  if (mxGetN(prhs[0]) != n || mxGetM(prhs[1]) != n)
    mexErrMsgTxt("A must be square and size-compatible with b");

  /* MATLAB CSC of A == CSR of A'; the caller passes A' (see header) */
  mwIndex* jc = mxGetJc(prhs[0]);
  mwIndex* ir = mxGetIr(prhs[0]);
  double* pr = mxGetPr(prhs[0]);
  mwSize nnz = jc[n];

  int64_t* rowptr = (int64_t*)mxMalloc((n + 1) * sizeof(int64_t));
  int64_t* colind = (int64_t*)mxMalloc(nnz * sizeof(int64_t));
  for (mwSize i = 0; i <= n; i++) rowptr[i] = (int64_t)jc[i];
  for (mwSize k = 0; k < nnz; k++) colind[k] = (int64_t)ir[k];

  /* forward trailing string args as --sp_* options */
  char* argv[64];
  int argc = 0;
  for (int a = 2; a < nrhs && argc < 64; a++)
    if (mxIsChar(prhs[a])) argv[argc++] = mxArrayToString(prhs[a]);

  STRUMPACK_SparseSolver S;
  if (STRUMPACK_init_mt(&S, STRUMPACK_DOUBLE, argc, argv, 0))
    mexErrMsgTxt("strumpack_tpu init failed");
  STRUMPACK_set_csr_matrix(S, (int64_t)n, rowptr, colind, pr, 0);

  plhs[0] = mxCreateDoubleMatrix(n, 1, mxREAL);
  STRUMPACK_RETURN_CODE rc =
      STRUMPACK_solve(S, mxGetPr(prhs[1]), mxGetPr(plhs[0]), 0);
  STRUMPACK_destroy(&S);
  mxFree(rowptr);
  mxFree(colind);
  if (rc != STRUMPACK_SUCCESS) mexErrMsgTxt("solve did not converge");
}

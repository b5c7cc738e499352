/* C-interface example: 2D Poisson solved through the strumpack_tpu C API.
 *
 * Role of the reference's examples/sparse/sexample.c / testPoisson2d
 * (5-point stencil generated inline, testPoisson2d.cpp:54-78 analog) as an
 * external C consumer of the installed library (test/build_external role).
 *
 * Build: make -C capi csparse
 * Run:   PYTHONPATH=<repo>:<jax-site> ./capi/csparse [nx] [--sp_* flags...]
 */
#include <math.h>
#include <stdio.h>
#include <stdlib.h>

#include "strumpack_tpu.h"

int main(int argc, char* argv[]) {
  int nx = argc > 1 ? atoi(argv[1]) : 30;
  int64_t n = (int64_t)nx * nx;
  int64_t* rowptr = malloc((n + 1) * sizeof(int64_t));
  int64_t* colind = malloc(5 * n * sizeof(int64_t));
  double* vals = malloc(5 * n * sizeof(double));
  int64_t nnz = 0;
  rowptr[0] = 0;
  for (int r = 0; r < nx; r++) {
    for (int c = 0; c < nx; c++) {
      int64_t i = (int64_t)r * nx + c;
      if (r > 0) { colind[nnz] = i - nx; vals[nnz++] = -1.0; }
      if (c > 0) { colind[nnz] = i - 1; vals[nnz++] = -1.0; }
      colind[nnz] = i; vals[nnz++] = 4.0;
      if (c < nx - 1) { colind[nnz] = i + 1; vals[nnz++] = -1.0; }
      if (r < nx - 1) { colind[nnz] = i + nx; vals[nnz++] = -1.0; }
      rowptr[i + 1] = nnz;
    }
  }

  STRUMPACK_SparseSolver S;
  int nargs = argc > 2 ? argc - 2 : 0;
  if (STRUMPACK_init_mt(&S, STRUMPACK_DOUBLE, nargs,
                        nargs ? argv + 2 : NULL, /*verbose=*/0)) {
    fprintf(stderr, "init failed\n");
    return 1;
  }
  STRUMPACK_set_csr_matrix(S, n, rowptr, colind, vals, 1);
  STRUMPACK_RETURN_CODE rc = STRUMPACK_reorder_regular(S, nx, nx, 1, 1, 1);
  if (rc != STRUMPACK_SUCCESS) { fprintf(stderr, "reorder: %d\n", rc); return 1; }
  rc = STRUMPACK_factor(S);
  if (rc != STRUMPACK_SUCCESS) { fprintf(stderr, "factor: %d\n", rc); return 1; }

  /* b = A * ones, solve, check max |x - 1| */
  double* b = calloc(n, sizeof(double));
  double* x = calloc(n, sizeof(double));
  for (int64_t i = 0; i < n; i++)
    for (int64_t k = rowptr[i]; k < rowptr[i + 1]; k++) b[i] += vals[k];
  rc = STRUMPACK_solve(S, b, x, 0);
  if (rc != STRUMPACK_SUCCESS) { fprintf(stderr, "solve: %d\n", rc); return 1; }
  double err = 0.0;
  for (int64_t i = 0; i < n; i++) {
    double e = fabs(x[i] - 1.0);
    if (e > err) err = e;
  }
  printf("C API: n=%lld its=%d factor_nnz=%lld max|x-1|=%.3e\n",
         (long long)n, STRUMPACK_its(S), (long long)STRUMPACK_factor_nonzeros(S),
         err);
  STRUMPACK_destroy(&S);
  free(rowptr); free(colind); free(vals); free(b); free(x);
  return err < 1e-8 ? 0 : 2;
}

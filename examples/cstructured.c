/* C-interface exercise of the structured dense API + kernel regression.
 *
 * Role of the reference's examples/dense/dstructured.c (StructuredMatrix
 * C interface) and examples/dense/KernelRegression C usage: build a
 * Toeplitz-like structured matrix, compress as HSS and BLR, check the
 * matvec against the dense operator, factor+solve, then run a tiny
 * Gaussian kernel regression fit/predict.
 *
 * Exit code 0 iff all numerical checks pass.
 */
#include <math.h>
#include <stdio.h>
#include <stdlib.h>

#include "strumpack_tpu.h"

static double elem_toeplitz(int64_t i, int64_t j) {
  double d = (double)(i > j ? i - j : j - i);
  return 1.0 / (1.0 + d) + (i == j ? 2.0 : 0.0);
}

int main(int argc, char* argv[]) {
  int64_t n = argc > 1 ? atoll(argv[1]) : 200;
  double* A = (double*)malloc((size_t)(n * n) * sizeof(double));
  for (int64_t j = 0; j < n; j++)
    for (int64_t i = 0; i < n; i++)
      A[j * n + i] = elem_toeplitz(i, j);   /* column-major */

  double *x = malloc(n * sizeof(double)), *b = malloc(n * sizeof(double)),
         *y = malloc(n * sizeof(double));
  for (int64_t i = 0; i < n; i++) x[i] = 1.0;

  int types[2] = {SP_TYPE_HSS, SP_TYPE_BLR};
  for (int t = 0; t < 2; t++) {
    SP_StructMat S;
    if (SP_d_struct_from_dense(&S, n, n, A, n, types[t], 1e-10, 32, 64)) {
      fprintf(stderr, "construct failed\n");
      return 1;
    }
    /* b = S x vs dense */
    SP_d_struct_mult(S, 1, x, b);
    double errmv = 0.0;
    for (int64_t i = 0; i < n; i++) {
      double ref = 0.0;
      for (int64_t j = 0; j < n; j++) ref += A[j * n + i] * x[j];
      double e = fabs(b[i] - ref);
      if (e > errmv) errmv = e;
    }
    if (SP_d_struct_factor(S)) return 2;
    for (int64_t i = 0; i < n; i++) y[i] = b[i];
    if (SP_d_struct_solve(S, 1, y)) return 3;
    double errsol = 0.0;
    for (int64_t i = 0; i < n; i++) {
      double e = fabs(y[i] - 1.0);
      if (e > errsol) errsol = e;
    }
    printf("type %d: rank %d mem %lld  max|Sx - Ax| = %.3e  "
           "max|x-1| = %.3e\n",
           types[t], SP_d_struct_rank(S),
           (long long)SP_d_struct_memory(S), errmv, errsol);
    SP_d_struct_destroy(&S);
    if (errmv > 1e-6 || errsol > 1e-5) return 4;
  }

  /* element-function construction */
  {
    SP_StructMat S;
    if (SP_d_struct_from_elements(&S, 64, 64, elem_toeplitz, SP_TYPE_HSS,
                                  1e-10, 16, 32))
      return 5;
    SP_d_struct_mult(S, 1, x, b);
    SP_d_struct_destroy(&S);
  }

  /* kernel ridge regression: y = sign(x0) recovered on training data */
  {
    int64_t m = 128;
    int d = 2;
    double* train = malloc((size_t)(m * d) * sizeof(double));
    double* lab = malloc(m * sizeof(double));
    unsigned s = 42;
    for (int64_t i = 0; i < m; i++) {
      for (int k = 0; k < d; k++) {
        s = s * 1103515245u + 12345u;
        train[i * d + k] = ((double)(s % 10000) / 5000.0) - 1.0;
      }
      lab[i] = train[i * d] > 0 ? 1.0 : -1.0;
    }
    STRUMPACK_Kernel K;
    if (STRUMPACK_create_kernel_double(&K, m, d, train, 0.5, 1e-2, 0))
      return 6;
    if (STRUMPACK_kernel_fit_HSS(K, lab, 0, NULL)) return 7;
    double* pred = malloc(m * sizeof(double));
    if (STRUMPACK_kernel_predict(K, m, train, pred)) return 8;
    int correct = 0;
    for (int64_t i = 0; i < m; i++)
      if ((pred[i] > 0) == (lab[i] > 0)) correct++;
    printf("kernel: %d/%d training points classified correctly\n", correct,
           (int)m);
    STRUMPACK_destroy_kernel(&K);
    if (correct < (int)(0.9 * m)) return 9;
  }
  printf("OK\n");
  return 0;
}

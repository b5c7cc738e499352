/* strumpack_tpu C API.
 *
 * Role of the reference's C interface StrumpackSparseSolver.h:156-260
 * (STRUMPACK_init_mt / set_csr_matrix / reorder / factor / solve /
 * ~40 option setters / statistics getters over an opaque handle with
 * per-precision dispatch), re-targeted at the TPU-native solver: the
 * library embeds a Python interpreter and drives the strumpack_tpu
 * package (JAX/XLA compute path).  Function and enum names follow the
 * reference so existing C callers can switch.
 *
 * Link against libstrumpack_tpu_c.so (see capi/Makefile).  The embedded
 * interpreter needs PYTHONPATH to include the strumpack_tpu package dir
 * (and, on this image, /root/.axon_site for the TPU backend plugin).
 */
#ifndef STRUMPACK_TPU_C_H
#define STRUMPACK_TPU_C_H

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct {
  void* obj;       /* owned Python-side handle */
  int precision;   /* STRUMPACK_PRECISION */
} STRUMPACK_SparseSolver;

/* StrumpackSparseSolver.h precision tags (reference :60-67). Index type
 * is always 64-bit capable here (the _64 variants of the reference). */
typedef enum {
  STRUMPACK_FLOAT = 0,
  STRUMPACK_DOUBLE = 1,
  STRUMPACK_FLOATCOMPLEX = 2,
  STRUMPACK_DOUBLECOMPLEX = 3
} STRUMPACK_PRECISION;

typedef enum { STRUMPACK_MT = 0, STRUMPACK_MPI_DIST = 1 } STRUMPACK_INTERFACE;

/* StrumpackParameters.hpp:50-58 ReturnCode */
typedef enum {
  STRUMPACK_SUCCESS = 0,
  STRUMPACK_MATRIX_NOT_SET = 1,
  STRUMPACK_REORDERING_ERROR = 2,
  STRUMPACK_ZERO_PIVOT = 3,
  STRUMPACK_NO_CONVERGENCE = 4,
  STRUMPACK_INACCURATE_INERTIA = 5
} STRUMPACK_RETURN_CODE;

/* StrumpackOptions.hpp:92-107 CompressionType (reference ABI order) */
typedef enum {
  STRUMPACK_NONE = 0,
  STRUMPACK_HSS = 1,
  STRUMPACK_BLR = 2,
  STRUMPACK_HODLR = 3,
  STRUMPACK_BLR_HODLR = 4,
  STRUMPACK_ZFP_BLR_HODLR = 5,
  STRUMPACK_LOSSLESS = 6,
  STRUMPACK_LOSSY = 7
} STRUMPACK_COMPRESSION_TYPE;

/* StrumpackOptions.hpp:166 KrylovSolver */
typedef enum {
  STRUMPACK_AUTO = 0,
  STRUMPACK_DIRECT = 1,
  STRUMPACK_REFINE = 2,
  STRUMPACK_PREC_GMRES = 3,
  STRUMPACK_GMRES = 4,
  STRUMPACK_PREC_BICGSTAB = 5,
  STRUMPACK_BICGSTAB = 6
} STRUMPACK_KRYLOV_SOLVER;

/* StrumpackOptions.hpp:61 ReorderingStrategy (supported subset) */
typedef enum {
  STRUMPACK_NATURAL = 0,
  STRUMPACK_METIS = 1,     /* mapped to the built-in general ND */
  STRUMPACK_GEOMETRIC = 6,
  STRUMPACK_RCM = 8,
  STRUMPACK_AMD = 9,
  STRUMPACK_ND = 12
} STRUMPACK_REORDERING_STRATEGY;

/* StrumpackOptions.hpp:120 MatchingJob */
typedef enum {
  STRUMPACK_MATCHING_NONE = 0,
  STRUMPACK_MATCHING_MAX_DIAGONAL_PRODUCT_SCALING = 5
} STRUMPACK_MATCHING_JOB;

/* Lifecycle (reference :156-171).  argc/argv are forwarded to the
 * --sp_* option parser; returns 0 on success. */
int STRUMPACK_init_mt(STRUMPACK_SparseSolver* S,
                      STRUMPACK_PRECISION precision, int argc, char* argv[],
                      int verbose);
void STRUMPACK_destroy(STRUMPACK_SparseSolver* S);

/* Input (reference :175-189).  row_ptr/col_ind are int64; values points
 * at n-row CSR data of the handle's precision. */
int STRUMPACK_set_csr_matrix(STRUMPACK_SparseSolver S, int64_t n,
                             const int64_t* row_ptr, const int64_t* col_ind,
                             const void* values, int symmetric_pattern);
int STRUMPACK_update_csr_matrix_values(STRUMPACK_SparseSolver S, int64_t n,
                                       const int64_t* row_ptr,
                                       const int64_t* col_ind,
                                       const void* values,
                                       int symmetric_pattern);

/* Phases (reference :193-208) */
STRUMPACK_RETURN_CODE STRUMPACK_reorder(STRUMPACK_SparseSolver S);
STRUMPACK_RETURN_CODE STRUMPACK_reorder_regular(STRUMPACK_SparseSolver S,
                                                int nx, int ny, int nz,
                                                int components, int width);
STRUMPACK_RETURN_CODE STRUMPACK_factor(STRUMPACK_SparseSolver S);
STRUMPACK_RETURN_CODE STRUMPACK_solve(STRUMPACK_SparseSolver S,
                                      const void* b, void* x,
                                      int use_initial_guess);

/* Option setters (reference :235-260) */
void STRUMPACK_set_from_options(STRUMPACK_SparseSolver S, int argc,
                                char* argv[]);
void STRUMPACK_set_verbose(STRUMPACK_SparseSolver S, int v);
void STRUMPACK_set_maxit(STRUMPACK_SparseSolver S, int maxit);
void STRUMPACK_set_gmres_restart(STRUMPACK_SparseSolver S, int m);
void STRUMPACK_set_rel_tol(STRUMPACK_SparseSolver S, double tol);
void STRUMPACK_set_abs_tol(STRUMPACK_SparseSolver S, double tol);
void STRUMPACK_set_Krylov_solver(STRUMPACK_SparseSolver S,
                                 STRUMPACK_KRYLOV_SOLVER solver);
void STRUMPACK_set_matching(STRUMPACK_SparseSolver S,
                            STRUMPACK_MATCHING_JOB job);
void STRUMPACK_set_reordering_method(STRUMPACK_SparseSolver S,
                                     STRUMPACK_REORDERING_STRATEGY m);
void STRUMPACK_set_compression(STRUMPACK_SparseSolver S,
                               STRUMPACK_COMPRESSION_TYPE t);
void STRUMPACK_set_compression_rel_tol(STRUMPACK_SparseSolver S, double tol);
void STRUMPACK_set_compression_abs_tol(STRUMPACK_SparseSolver S, double tol);
void STRUMPACK_set_compression_min_sep_size(STRUMPACK_SparseSolver S, int s);
void STRUMPACK_set_compression_leaf_size(STRUMPACK_SparseSolver S, int l);

/* Statistics getters (reference :266-292) */
int STRUMPACK_its(STRUMPACK_SparseSolver S);
int STRUMPACK_maximum_rank(STRUMPACK_SparseSolver S);
int64_t STRUMPACK_factor_nonzeros(STRUMPACK_SparseSolver S);
int STRUMPACK_inertia(STRUMPACK_SparseSolver S, int64_t* neg, int64_t* zero,
                      int64_t* pos);


/* ------------------------------------------------------------------ */
/* Structured dense matrices (reference structured/StructuredMatrix.h +
 * StructuredMatrixC.cpp roles).  Dense inputs are column-major with
 * leading dimension ldA; solve overwrites B in place. */

typedef struct {
  void* obj;
  int precision;   /* STRUMPACK_PRECISION */
} SP_StructMat;

typedef enum {
  SP_TYPE_HSS = 0,
  SP_TYPE_BLR = 1,
  SP_TYPE_HODLR = 2,
  SP_TYPE_HODBF = 3,
  SP_TYPE_BUTTERFLY = 4,
  SP_TYPE_LR = 5,
  SP_TYPE_LOSSY = 6
} SP_STRUCTURED_TYPE;

int SP_d_struct_from_dense(SP_StructMat* S, int64_t rows, int64_t cols,
                           const double* A, int64_t ldA,
                           SP_STRUCTURED_TYPE type, double rel_tol,
                           int leaf_size, int max_rank);
int SP_s_struct_from_dense(SP_StructMat* S, int64_t rows, int64_t cols,
                           const float* A, int64_t ldA,
                           SP_STRUCTURED_TYPE type, double rel_tol,
                           int leaf_size, int max_rank);
/* element function A(i,j) evaluated on demand (construct_from_elements) */
int SP_d_struct_from_elements(SP_StructMat* S, int64_t rows, int64_t cols,
                              double (*elem)(int64_t, int64_t),
                              SP_STRUCTURED_TYPE type, double rel_tol,
                              int leaf_size, int max_rank);
int SP_d_struct_mult(SP_StructMat S, int64_t nrhs, const double* B,
                     double* C);
int SP_d_struct_factor(SP_StructMat S);
int SP_d_struct_solve(SP_StructMat S, int64_t nrhs, double* B);
int SP_d_struct_rank(SP_StructMat S);
int64_t SP_d_struct_memory(SP_StructMat S);
void SP_d_struct_destroy(SP_StructMat* S);

/* ------------------------------------------------------------------ */
/* Kernel-matrix regression (reference kernel/Kernel.h role).  train is
 * column-major d x n (each point contiguous); type 0 = Gauss,
 * 1 = Laplace. */

typedef struct { void* obj; } STRUMPACK_Kernel;

int STRUMPACK_create_kernel_double(STRUMPACK_Kernel* K, int64_t n, int d,
                                   const double* train, double h,
                                   double lambda, int type);
int STRUMPACK_kernel_fit_HSS(STRUMPACK_Kernel K, const double* labels,
                             int argc, char* argv[]);
int STRUMPACK_kernel_predict(STRUMPACK_Kernel K, int64_t m,
                             const double* test, double* prediction);
void STRUMPACK_destroy_kernel(STRUMPACK_Kernel* K);

#ifdef __cplusplus
}
#endif
#endif /* STRUMPACK_TPU_C_H */

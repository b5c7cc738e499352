/* strumpack_tpu C API implementation.
 *
 * Role of the reference's StrumpackSparseSolverC.cpp (C ABI over the C++
 * driver with per-precision dispatch).  Here the "driver" is the Python
 * strumpack_tpu package (JAX/XLA compute path), so this library embeds a
 * CPython interpreter once per process and keeps the C surface minimal:
 * every entry point calls a function of an embedded Python glue module
 * (_stpu_capi below) that does all buffer handling with ctypes/numpy
 * (zero-copy views of the caller's arrays).
 */
#include <stdarg.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include "strumpack_tpu.h"

/* ------------------------------------------------------------------ */
/* Embedded glue module: all numpy/ctypes work happens in Python.      */
static const char* GLUE_SRC =
"import ctypes\n"
"import os\n"
"import numpy as np\n"
"import jax\n"
"import strumpack_tpu as st\n"
"from strumpack_tpu.sparse.csr import CSRMatrix\n"
"\n"
"# jax may have been preloaded (sitecustomize) before JAX_PLATFORMS could\n"
"# take effect; re-apply the env var through the live config\n"
"_plat = os.environ.get('JAX_PLATFORMS')\n"
"if _plat:\n"
"    try: jax.config.update('jax_platforms', _plat)\n"
"    except Exception: pass\n"
"\n"
"_DT = {0: np.float32, 1: np.float64, 2: np.complex64, 3: np.complex128}\n"
"_REORD = {0: 'natural', 1: 'metis', 6: 'geometric', 8: 'rcm', 9: 'amd',\n"
"          12: 'nd'}\n"
"_KRYLOV = {0: 'auto', 1: 'direct', 2: 'refine', 3: 'prec_gmres',\n"
"           4: 'gmres', 5: 'prec_bicgstab', 6: 'bicgstab'}\n"
"_COMP = {0: 'none', 1: 'hss', 2: 'blr', 3: 'hodlr', 4: 'blr_hodlr',\n"
"         5: 'zfp_blr_hodlr', 6: 'lossless', 7: 'lossy'}\n"
"\n"
"class Handle:\n"
"    def __init__(self, precision, argv, verbose):\n"
"        import jax, os\n"
"        plat = os.environ.get('JAX_PLATFORMS')\n"
"        if plat:\n"
"            # jax may have been preloaded (sitecustomize) before the env\n"
"            # var could take effect; re-apply it through the config\n"
"            try: jax.config.update('jax_platforms', plat)\n"
"            except Exception: pass\n"
"        self.prec = precision\n"
"        self.dtype = _DT[precision]\n"
"        fdt = np.dtype(self.dtype)\n"
"        if fdt in (np.float64, np.complex128):\n"
"            jax.config.update('jax_enable_x64', True)\n"
"        name = {0: 'float32', 1: 'float64', 2: 'complex64',\n"
"                3: 'complex128'}[precision]\n"
"        self.opts = st.SPOptions(verbose=bool(verbose), factor_dtype=name,\n"
"                                 refine_dtype=name)\n"
"        if argv:\n"
"            self.opts.set_from_command_line(list(argv))\n"
"        self.solver = st.SparseSolver(self.opts)\n"
"\n"
"def _arr(addr, n, dtype):\n"
"    buf = (ctypes.c_char * (n * np.dtype(dtype).itemsize)).from_address(addr)\n"
"    return np.frombuffer(buf, dtype=dtype, count=n)\n"
"\n"
"def init(precision, argv, verbose):\n"
"    return Handle(precision, argv, verbose)\n"
"\n"
"def set_csr(h, n, rp_addr, ci_addr, v_addr, symm, update):\n"
"    rowptr = _arr(rp_addr, n + 1, np.int64).copy()\n"
"    nnz = int(rowptr[-1])\n"
"    colind = _arr(ci_addr, nnz, np.int64).copy()\n"
"    vals = _arr(v_addr, nnz, h.dtype).copy()\n"
"    A = CSRMatrix(int(n), rowptr, colind, vals, symm_sparse=bool(symm))\n"
"    if update:\n"
"        h.solver.update_matrix_values(A)\n"
"    else:\n"
"        h.solver.set_csr_matrix(A)\n"
"    return 0\n"
"\n"
"def reorder(h, nx, ny, nz, components, width):\n"
"    if components > 0:\n"
"        h.solver.opts.components = components\n"
"    if width > 0:\n"
"        h.solver.opts.separator_width = width\n"
"    if nx > 0:\n"
"        rc = h.solver.reorder(nx, max(ny, 1), max(nz, 1))\n"
"    else:\n"
"        rc = h.solver.reorder()\n"
"    return int(rc.value)\n"
"\n"
"def factor(h):\n"
"    return int(h.solver.factor().value)\n"
"\n"
"def solve(h, b_addr, x_addr, use_x0):\n"
"    n = h.solver.A.n\n"
"    b = _arr(b_addr, n, h.dtype).copy()\n"
"    xv = _arr(x_addr, n, h.dtype)\n"
"    x0 = xv.copy() if use_x0 else None\n"
"    x, rc = h.solver.solve(b, x0=x0)\n"
"    xv[:] = np.asarray(x, dtype=h.dtype)\n"
"    return int(rc.value)\n"
"\n"
"def set_from_options(h, argv):\n"
"    h.opts.set_from_command_line(list(argv))\n"
"    return 0\n"
"\n"
"def set_opt(h, name, value):\n"
"    from strumpack_tpu.options import (CompressionType, KrylovSolver,\n"
"                                       MatchingJob, ReorderingStrategy)\n"
"    o = h.opts\n"
"    if name == 'verbose': o.verbose = bool(value)\n"
"    elif name == 'maxit': o.maxit = int(value)\n"
"    elif name == 'gmres_restart': o.gmres_restart = int(value)\n"
"    elif name == 'rel_tol': o.rel_tol = float(value)\n"
"    elif name == 'abs_tol': o.abs_tol = float(value)\n"
"    elif name == 'krylov': o.krylov_solver = KrylovSolver(_KRYLOV[int(value)])\n"
"    elif name == 'matching':\n"
"        o.matching = (MatchingJob.MAX_DIAGONAL_PRODUCT_SCALING\n"
"                      if int(value) == 5 else MatchingJob.NONE)\n"
"    elif name == 'reordering':\n"
"        o.reordering_method = ReorderingStrategy(_REORD[int(value)])\n"
"    elif name == 'compression':\n"
"        o.compression = CompressionType(_COMP[int(value)])\n"
"    elif name == 'comp_rel_tol':\n"
"        o.blr.rel_tol = float(value); o.hss.rel_tol = float(value)\n"
"    elif name == 'comp_abs_tol':\n"
"        o.blr.abs_tol = float(value); o.hss.abs_tol = float(value)\n"
"    elif name == 'comp_min_sep_size': o.compression_min_sep_size = int(value)\n"
"    elif name == 'comp_leaf_size':\n"
"        o.compression_leaf_size = int(value)\n"
"        o.blr.leaf_size = int(value); o.hss.leaf_size = int(value)\n"
"    return 0\n"
"\n"
"def get_stat(h, name):\n"
"    s = h.solver\n"
"    if name == 'its': return int(s.Krylov_iterations())\n"
"    if name == 'factor_nonzeros': return int(s.factor_nonzeros())\n"
"    if name == 'maximum_rank':\n"
"        try: return int(s.fac.max_rank())\n"
"        except Exception: return 0\n"
"    return 0\n"
"\n"
"def inertia(h):\n"
"    neg, zero, pos = h.solver.inertia()\n"
"    return (int(neg), int(zero), int(pos))\n"
"\n"
"# ---- structured dense matrices (StructuredMatrix.h role) ----\n"
"_STYPE = {0: 'hss', 1: 'blr', 2: 'hodlr', 3: 'hodbf', 4: 'butterfly',\n"
"          5: 'lr', 6: 'lossy'}\n"
"\n"
"def _x64(dtype):\n"
"    import jax\n"
"    if np.dtype(dtype) in (np.float64, np.complex128):\n"
"        jax.config.update('jax_enable_x64', True)\n"
"\n"
"def struct_from_dense(prec, rows, cols, addr, ld, stype, tol, leaf, rank):\n"
"    from strumpack_tpu.structured.structured import (StructuredOptions,\n"
"                                                     Type,\n"
"                                                     construct_from_dense)\n"
"    dt = _DT[prec]\n"
"    _x64(dt)\n"
"    full = _arr(addr, ld * cols, dt)\n"
"    A = np.ascontiguousarray(full.reshape(cols, ld).T[:rows])\n"
"    o = StructuredOptions(type=Type(_STYPE[stype]), rel_tol=tol,\n"
"                          leaf_size=leaf, max_rank=rank)\n"
"    return construct_from_dense(A, o)\n"
"\n"
"def struct_from_elements(prec, rows, cols, fn_addr, stype, tol, leaf,\n"
"                         rank):\n"
"    dt = _DT[prec]\n"
"    _x64(dt)\n"
"    EF = ctypes.CFUNCTYPE(ctypes.c_double, ctypes.c_int64,\n"
"                          ctypes.c_int64)(fn_addr)\n"
"    A = np.empty((rows, cols), dt)\n"
"    for i in range(rows):\n"
"        for j in range(cols):\n"
"            A[i, j] = EF(i, j)\n"
"    from strumpack_tpu.structured.structured import (StructuredOptions,\n"
"                                                     Type,\n"
"                                                     construct_from_dense)\n"
"    o = StructuredOptions(type=Type(_STYPE[stype]), rel_tol=tol,\n"
"                          leaf_size=leaf, max_rank=rank)\n"
"    return construct_from_dense(A, o)\n"
"\n"
"def struct_mult(S, prec, nrhs, b_addr, c_addr):\n"
"    dt = _DT[prec]\n"
"    m = S.rows\n"
"    B = _arr(b_addr, m * nrhs, dt).reshape(nrhs, m).T\n"
"    C = np.asarray(S.mult(np.ascontiguousarray(B)), dtype=dt)\n"
"    _arr(c_addr, m * nrhs, dt)[:] = C.T.ravel()\n"
"    return 0\n"
"\n"
"def struct_factor(S):\n"
"    S.factor()\n"
"    return 0\n"
"\n"
"def struct_solve(S, prec, nrhs, b_addr):\n"
"    dt = _DT[prec]\n"
"    m = S.rows\n"
"    buf = _arr(b_addr, m * nrhs, dt)\n"
"    B = buf.reshape(nrhs, m).T\n"
"    X = np.asarray(S.solve(np.ascontiguousarray(B)), dtype=dt)\n"
"    buf[:] = X.T.ravel()\n"
"    return 0\n"
"\n"
"def struct_rank(S):\n"
"    return int(S.rank())\n"
"\n"
"def struct_memory(S):\n"
"    return int(S.memory())\n"
"\n"
"# ---- kernel regression (kernel/Kernel.h role) ----\n"
"def kernel_create(n, d, addr, h, lam, ktype):\n"
"    import jax\n"
"    jax.config.update('jax_enable_x64', True)\n"
"    from strumpack_tpu.kernel.kernel import GaussKernel, LaplaceKernel\n"
"    X = _arr(addr, n * d, np.float64).reshape(n, d).copy()\n"
"    K = (GaussKernel if ktype == 0 else LaplaceKernel)(h=h, lam=lam)\n"
"    return {'K': K, 'X': X}\n"
"\n"
"def kernel_fit_hss(kh, y_addr, argv):\n"
"    n = kh['X'].shape[0]\n"
"    y = _arr(y_addr, n, np.float64).copy()\n"
"    kh['K'].fit_HSS(kh['X'], y)\n"
"    return 0\n"
"\n"
"def kernel_predict(kh, m, t_addr, p_addr):\n"
"    d = kh['X'].shape[1]\n"
"    T = _arr(t_addr, m * d, np.float64).reshape(m, d).copy()\n"
"    pred = np.asarray(kh['K'].predict(T), dtype=np.float64)\n"
"    _arr(p_addr, m, np.float64)[:] = pred\n"
"    return 0\n";


static PyObject* glue = NULL;

static int ensure_glue(void) {
  if (glue) return 0;
  if (!Py_IsInitialized()) {
    /* isolate from caller's signal handlers; inherit environment
     * (PYTHONPATH, JAX_PLATFORMS) like any python process would */
    Py_InitializeEx(0);
  }
  PyObject* code =
      Py_CompileString(GLUE_SRC, "_stpu_capi.py", Py_file_input);
  if (!code) { PyErr_Print(); return -1; }
  glue = PyImport_ExecCodeModule("_stpu_capi", code);
  Py_DECREF(code);
  if (!glue) { PyErr_Print(); return -1; }
  return 0;
}

static PyObject* argv_tuple(int argc, char* argv[]) {
  PyObject* t = PyTuple_New(argc > 0 ? argc : 0);
  for (int i = 0; i < argc; i++)
    PyTuple_SET_ITEM(t, i, PyUnicode_FromString(argv[i]));
  return t;
}

/* call glue.<fn>(handle, ...) returning a long (or -1 on error) */
static long call_long(PyObject* callable_result) {
  if (!callable_result) { PyErr_Print(); return -1; }
  long v = PyLong_AsLong(callable_result);
  Py_DECREF(callable_result);
  if (PyErr_Occurred()) { PyErr_Print(); return -1; }
  return v;
}

int STRUMPACK_init_mt(STRUMPACK_SparseSolver* S,
                      STRUMPACK_PRECISION precision, int argc, char* argv[],
                      int verbose) {
  if (ensure_glue()) return -1;
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject* args = argv_tuple(argc, argv);
  PyObject* h = PyObject_CallMethod(glue, "init", "iOi", (int)precision,
                                    args, verbose);
  Py_DECREF(args);
  PyGILState_Release(g);
  if (!h) { PyErr_Print(); return -1; }
  S->obj = (void*)h;
  S->precision = (int)precision;
  return 0;
}

void STRUMPACK_destroy(STRUMPACK_SparseSolver* S) {
  if (!S || !S->obj) return;
  PyGILState_STATE g = PyGILState_Ensure();
  Py_DECREF((PyObject*)S->obj);
  PyGILState_Release(g);
  S->obj = NULL;
}

static int set_csr(STRUMPACK_SparseSolver S, int64_t n,
                   const int64_t* row_ptr, const int64_t* col_ind,
                   const void* values, int symm, int update) {
  PyGILState_STATE g = PyGILState_Ensure();
  long rc = call_long(PyObject_CallMethod(
      glue, "set_csr", "OLKKKii", (PyObject*)S.obj, (long long)n,
      (unsigned long long)(uintptr_t)row_ptr,
      (unsigned long long)(uintptr_t)col_ind,
      (unsigned long long)(uintptr_t)values, symm, update));
  PyGILState_Release(g);
  return (int)rc;
}

int STRUMPACK_set_csr_matrix(STRUMPACK_SparseSolver S, int64_t n,
                             const int64_t* row_ptr, const int64_t* col_ind,
                             const void* values, int symmetric_pattern) {
  return set_csr(S, n, row_ptr, col_ind, values, symmetric_pattern, 0);
}

int STRUMPACK_update_csr_matrix_values(STRUMPACK_SparseSolver S, int64_t n,
                                       const int64_t* row_ptr,
                                       const int64_t* col_ind,
                                       const void* values,
                                       int symmetric_pattern) {
  return set_csr(S, n, row_ptr, col_ind, values, symmetric_pattern, 1);
}

STRUMPACK_RETURN_CODE STRUMPACK_reorder(STRUMPACK_SparseSolver S) {
  PyGILState_STATE g = PyGILState_Ensure();
  long rc = call_long(PyObject_CallMethod(glue, "reorder", "Oiiiii",
                                          (PyObject*)S.obj, 0, 0, 0, 0, 0));
  PyGILState_Release(g);
  return (STRUMPACK_RETURN_CODE)rc;
}

STRUMPACK_RETURN_CODE STRUMPACK_reorder_regular(STRUMPACK_SparseSolver S,
                                                int nx, int ny, int nz,
                                                int components, int width) {
  PyGILState_STATE g = PyGILState_Ensure();
  long rc = call_long(PyObject_CallMethod(
      glue, "reorder", "Oiiiii", (PyObject*)S.obj, nx, ny, nz, components,
      width));
  PyGILState_Release(g);
  return (STRUMPACK_RETURN_CODE)rc;
}

STRUMPACK_RETURN_CODE STRUMPACK_factor(STRUMPACK_SparseSolver S) {
  PyGILState_STATE g = PyGILState_Ensure();
  long rc = call_long(
      PyObject_CallMethod(glue, "factor", "O", (PyObject*)S.obj));
  PyGILState_Release(g);
  return (STRUMPACK_RETURN_CODE)rc;
}

STRUMPACK_RETURN_CODE STRUMPACK_solve(STRUMPACK_SparseSolver S,
                                      const void* b, void* x,
                                      int use_initial_guess) {
  PyGILState_STATE g = PyGILState_Ensure();
  long rc = call_long(PyObject_CallMethod(
      glue, "solve", "OKKi", (PyObject*)S.obj,
      (unsigned long long)(uintptr_t)b, (unsigned long long)(uintptr_t)x,
      use_initial_guess));
  PyGILState_Release(g);
  return (STRUMPACK_RETURN_CODE)rc;
}

void STRUMPACK_set_from_options(STRUMPACK_SparseSolver S, int argc,
                                char* argv[]) {
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject* args = argv_tuple(argc, argv);
  call_long(PyObject_CallMethod(glue, "set_from_options", "OO",
                                (PyObject*)S.obj, args));
  Py_DECREF(args);
  PyGILState_Release(g);
}

static void set_opt_l(STRUMPACK_SparseSolver S, const char* name, long v) {
  PyGILState_STATE g = PyGILState_Ensure();
  call_long(PyObject_CallMethod(glue, "set_opt", "Osl", (PyObject*)S.obj,
                                name, v));
  PyGILState_Release(g);
}

static void set_opt_d(STRUMPACK_SparseSolver S, const char* name, double v) {
  PyGILState_STATE g = PyGILState_Ensure();
  call_long(PyObject_CallMethod(glue, "set_opt", "Osd", (PyObject*)S.obj,
                                name, v));
  PyGILState_Release(g);
}

void STRUMPACK_set_verbose(STRUMPACK_SparseSolver S, int v) {
  set_opt_l(S, "verbose", v);
}
void STRUMPACK_set_maxit(STRUMPACK_SparseSolver S, int maxit) {
  set_opt_l(S, "maxit", maxit);
}
void STRUMPACK_set_gmres_restart(STRUMPACK_SparseSolver S, int m) {
  set_opt_l(S, "gmres_restart", m);
}
void STRUMPACK_set_rel_tol(STRUMPACK_SparseSolver S, double tol) {
  set_opt_d(S, "rel_tol", tol);
}
void STRUMPACK_set_abs_tol(STRUMPACK_SparseSolver S, double tol) {
  set_opt_d(S, "abs_tol", tol);
}
void STRUMPACK_set_Krylov_solver(STRUMPACK_SparseSolver S,
                                 STRUMPACK_KRYLOV_SOLVER solver) {
  set_opt_l(S, "krylov", (long)solver);
}
void STRUMPACK_set_matching(STRUMPACK_SparseSolver S,
                            STRUMPACK_MATCHING_JOB job) {
  set_opt_l(S, "matching", (long)job);
}
void STRUMPACK_set_reordering_method(STRUMPACK_SparseSolver S,
                                     STRUMPACK_REORDERING_STRATEGY m) {
  set_opt_l(S, "reordering", (long)m);
}
void STRUMPACK_set_compression(STRUMPACK_SparseSolver S,
                               STRUMPACK_COMPRESSION_TYPE t) {
  set_opt_l(S, "compression", (long)t);
}
void STRUMPACK_set_compression_rel_tol(STRUMPACK_SparseSolver S, double tol) {
  set_opt_d(S, "comp_rel_tol", tol);
}
void STRUMPACK_set_compression_abs_tol(STRUMPACK_SparseSolver S, double tol) {
  set_opt_d(S, "comp_abs_tol", tol);
}
void STRUMPACK_set_compression_min_sep_size(STRUMPACK_SparseSolver S, int s) {
  set_opt_l(S, "comp_min_sep_size", s);
}
void STRUMPACK_set_compression_leaf_size(STRUMPACK_SparseSolver S, int l) {
  set_opt_l(S, "comp_leaf_size", l);
}

static long get_stat(STRUMPACK_SparseSolver S, const char* name) {
  PyGILState_STATE g = PyGILState_Ensure();
  long v = call_long(PyObject_CallMethod(glue, "get_stat", "Os",
                                         (PyObject*)S.obj, name));
  PyGILState_Release(g);
  return v;
}

int STRUMPACK_its(STRUMPACK_SparseSolver S) { return (int)get_stat(S, "its"); }
int STRUMPACK_maximum_rank(STRUMPACK_SparseSolver S) {
  return (int)get_stat(S, "maximum_rank");
}
int64_t STRUMPACK_factor_nonzeros(STRUMPACK_SparseSolver S) {
  return (int64_t)get_stat(S, "factor_nonzeros");
}

int STRUMPACK_inertia(STRUMPACK_SparseSolver S, int64_t* neg, int64_t* zero,
                      int64_t* pos) {
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject* r =
      PyObject_CallMethod(glue, "inertia", "O", (PyObject*)S.obj);
  int rc = -1;
  if (r && PyTuple_Check(r) && PyTuple_GET_SIZE(r) == 3) {
    *neg = PyLong_AsLongLong(PyTuple_GET_ITEM(r, 0));
    *zero = PyLong_AsLongLong(PyTuple_GET_ITEM(r, 1));
    *pos = PyLong_AsLongLong(PyTuple_GET_ITEM(r, 2));
    rc = 0;
  } else if (!r) {
    PyErr_Print();
  }
  Py_XDECREF(r);
  PyGILState_Release(g);
  return rc;
}

/* ------------------------------------------------------------------ */
/* Structured dense matrices (structured/StructuredMatrix.h role)      */

static int struct_from_dense_impl(SP_StructMat* S, int prec, int64_t rows,
                                  int64_t cols, const void* A, int64_t ldA,
                                  SP_STRUCTURED_TYPE type, double rel_tol,
                                  int leaf_size, int max_rank) {
  if (ensure_glue()) return -1;
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject* h = PyObject_CallMethod(
      glue, "struct_from_dense", "iLLKLidii", prec, (long long)rows,
      (long long)cols, (unsigned long long)(uintptr_t)A, (long long)ldA,
      (int)type, rel_tol, leaf_size, max_rank);
  PyGILState_Release(g);
  if (!h) { PyErr_Print(); return -1; }
  S->obj = (void*)h;
  S->precision = prec;
  return 0;
}

int SP_d_struct_from_dense(SP_StructMat* S, int64_t rows, int64_t cols,
                           const double* A, int64_t ldA,
                           SP_STRUCTURED_TYPE type, double rel_tol,
                           int leaf_size, int max_rank) {
  return struct_from_dense_impl(S, STRUMPACK_DOUBLE, rows, cols, A, ldA,
                                type, rel_tol, leaf_size, max_rank);
}

int SP_s_struct_from_dense(SP_StructMat* S, int64_t rows, int64_t cols,
                           const float* A, int64_t ldA,
                           SP_STRUCTURED_TYPE type, double rel_tol,
                           int leaf_size, int max_rank) {
  return struct_from_dense_impl(S, STRUMPACK_FLOAT, rows, cols, A, ldA,
                                type, rel_tol, leaf_size, max_rank);
}

int SP_d_struct_from_elements(SP_StructMat* S, int64_t rows, int64_t cols,
                              double (*elem)(int64_t, int64_t),
                              SP_STRUCTURED_TYPE type, double rel_tol,
                              int leaf_size, int max_rank) {
  if (ensure_glue()) return -1;
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject* h = PyObject_CallMethod(
      glue, "struct_from_elements", "iLLKidii", (int)STRUMPACK_DOUBLE,
      (long long)rows, (long long)cols,
      (unsigned long long)(uintptr_t)elem, (int)type, rel_tol, leaf_size,
      max_rank);
  PyGILState_Release(g);
  if (!h) { PyErr_Print(); return -1; }
  S->obj = (void*)h;
  S->precision = STRUMPACK_DOUBLE;
  return 0;
}

int SP_d_struct_mult(SP_StructMat S, int64_t nrhs, const double* B,
                     double* C) {
  PyGILState_STATE g = PyGILState_Ensure();
  long v = call_long(PyObject_CallMethod(
      glue, "struct_mult", "OiLKK", (PyObject*)S.obj, S.precision,
      (long long)nrhs, (unsigned long long)(uintptr_t)B,
      (unsigned long long)(uintptr_t)C));
  PyGILState_Release(g);
  return (int)v;
}

int SP_d_struct_factor(SP_StructMat S) {
  PyGILState_STATE g = PyGILState_Ensure();
  long v = call_long(PyObject_CallMethod(glue, "struct_factor", "O",
                                         (PyObject*)S.obj));
  PyGILState_Release(g);
  return (int)v;
}

int SP_d_struct_solve(SP_StructMat S, int64_t nrhs, double* B) {
  PyGILState_STATE g = PyGILState_Ensure();
  long v = call_long(PyObject_CallMethod(
      glue, "struct_solve", "OiLK", (PyObject*)S.obj, S.precision,
      (long long)nrhs, (unsigned long long)(uintptr_t)B));
  PyGILState_Release(g);
  return (int)v;
}

int SP_d_struct_rank(SP_StructMat S) {
  PyGILState_STATE g = PyGILState_Ensure();
  long v = call_long(PyObject_CallMethod(glue, "struct_rank", "O",
                                         (PyObject*)S.obj));
  PyGILState_Release(g);
  return (int)v;
}

int64_t SP_d_struct_memory(SP_StructMat S) {
  PyGILState_STATE g = PyGILState_Ensure();
  long v = call_long(PyObject_CallMethod(glue, "struct_memory", "O",
                                         (PyObject*)S.obj));
  PyGILState_Release(g);
  return (int64_t)v;
}

void SP_d_struct_destroy(SP_StructMat* S) {
  if (!S || !S->obj) return;
  PyGILState_STATE g = PyGILState_Ensure();
  Py_DECREF((PyObject*)S->obj);
  PyGILState_Release(g);
  S->obj = NULL;
}

/* ------------------------------------------------------------------ */
/* Kernel regression (kernel/Kernel.h role)                            */

int STRUMPACK_create_kernel_double(STRUMPACK_Kernel* K, int64_t n, int d,
                                   const double* train, double h,
                                   double lambda, int type) {
  if (ensure_glue()) return -1;
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject* kh = PyObject_CallMethod(
      glue, "kernel_create", "LiKddi", (long long)n, d,
      (unsigned long long)(uintptr_t)train, h, lambda, type);
  PyGILState_Release(g);
  if (!kh) { PyErr_Print(); return -1; }
  K->obj = (void*)kh;
  return 0;
}

int STRUMPACK_kernel_fit_HSS(STRUMPACK_Kernel K, const double* labels,
                             int argc, char* argv[]) {
  PyGILState_STATE g = PyGILState_Ensure();
  PyObject* args = argv_tuple(argc, argv);
  long v = call_long(PyObject_CallMethod(
      glue, "kernel_fit_hss", "OKO", (PyObject*)K.obj,
      (unsigned long long)(uintptr_t)labels, args));
  Py_DECREF(args);
  PyGILState_Release(g);
  return (int)v;
}

int STRUMPACK_kernel_predict(STRUMPACK_Kernel K, int64_t m,
                             const double* test, double* prediction) {
  PyGILState_STATE g = PyGILState_Ensure();
  long v = call_long(PyObject_CallMethod(
      glue, "kernel_predict", "OLKK", (PyObject*)K.obj, (long long)m,
      (unsigned long long)(uintptr_t)test,
      (unsigned long long)(uintptr_t)prediction));
  PyGILState_Release(g);
  return (int)v;
}

void STRUMPACK_destroy_kernel(STRUMPACK_Kernel* K) {
  if (!K || !K->obj) return;
  PyGILState_STATE g = PyGILState_Ensure();
  Py_DECREF((PyObject*)K->obj);
  PyGILState_Release(g);
  K->obj = NULL;
}

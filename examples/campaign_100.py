"""BASELINE config 3: 3D Poisson 100^3 (n = 10^6) BLR+HODLR factor + GMRES
on one TPU chip (reference headline: SparseSolver with --sp_compression on
a 1M-dof Poisson problem; BASELINE.md config 3).

Round-4 config (landed: factor 300 s steady, 15.1 GB peak, GMRES
its=7, residual 2.4e-4): lossy (bf16) dense factors below sep 256, BLR
with rank-16-compressed CBs to 2048, SAMPLING-built HSS above (leaf
256, rank 256 — never densely assembled, sequential per-front
execution) keeps a million unknowns inside 16 GB HBM.

Usage: python examples/campaign_100.py [n]
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main(argv):
    import jax
    cache = os.environ.get("JAX_CACHE_DIR",
                           os.path.expanduser("~/.cache/strumpack_tpu_jax"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import strumpack_tpu as st
    from strumpack_tpu.options import CompressionType, KrylovSolver
    from strumpack_tpu.sparse.gen import poisson3d

    n = int(argv[1]) if len(argv) > 1 else 100
    opts = st.SPOptions(verbose=True, factor_dtype="float32",
                        refine_dtype="float32")
    opts.compression = CompressionType.ZFP_BLR_HODLR
    opts.hss.sampling = True      # sampling-built HSS tops: the giant
    #                               fronts are never assembled densely
    opts.hodlr_min_sep_size = 2048
    opts.compression_min_sep_size = 256
    opts.blr.max_rank = 32
    opts.blr.rel_tol = 1e-4
    opts.blr.cb_compression = True
    opts.blr.cb_rank_cap = 16
    # top-front capacity: rank 128 at the 12288-wide root stalls the
    # preconditioned GMRES at ~7e-2, and leaf 512 + BLR-to-4096 blew
    # HBM; rank 256 at leaf 256 measured preconditioner-grade on the
    # 6144-wide 64^3 root (its=5, residual 9.7e-5)
    opts.hss.leaf_size = 256
    opts.hss.max_rank = 256
    opts.hss.rel_tol = 1e-4
    opts.krylov_solver = KrylovSolver.PREC_GMRES
    opts.rel_tol = 1e-4
    opts.set_from_command_line(argv)

    t0 = time.time()
    A = poisson3d(n)
    t_gen = time.time() - t0
    s = st.SparseSolver(opts)
    s.set_csr_matrix(A)
    t0 = time.time()
    s.reorder(n, n, n)
    t_reorder = time.time() - t0
    print(f"# gen={t_gen:.1f}s reorder={t_reorder:.1f}s n={A.n} "
          f"nnz={A.nnz}", flush=True)
    rng = np.random.default_rng(0)
    xex = rng.standard_normal(A.n).astype(np.float32)
    b = A.spmv(xex)
    t0 = time.time()
    x, rc = s.solve(b)
    t_first = time.time() - t0
    res = float(np.linalg.norm(A.spmv(x) - b) / np.linalg.norm(b))
    print(f"# rc={rc} first_solve={t_first:.1f}s its={s.its} "
          f"residual={res:.3e}", flush=True)
    # steady-state re-solve (factors + programs cached)
    t0 = time.time()
    x, rc2 = s.solve(b)
    t_steady = time.time() - t0
    print(json.dumps({
        "metric": f"poisson3d_{n}_blr_hodlr_solve_s",
        "value": round(t_steady, 3), "unit": "s",
        "n": A.n, "its": s.its, "residual": res,
        "first_solve_s": round(t_first, 1),
        "reorder_s": round(t_reorder, 1), "rc": str(rc)}), flush=True)
    return 0 if rc == st.ReturnCode.SUCCESS else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv))

"""Level-batched execution plan for multifrontal factorization on TPU.

Role of the reference's GPU ``LevelInfo`` (FrontGPU.cpp:43-215) generalized
into the *only* numeric execution model (SURVEY.md section 7): the host
flattens the elimination tree into levels (all fronts of equal depth), bins
each level's fronts into padded (sep_pad, upd_pad) buckets, and emits static
int32 index plans so the whole numeric phase is gathers, scatter-adds and
batched dense kernels with static shapes — jit-compilable, no host round
trips.

Key TPU-first choices vs the reference's CUDA path:

* extend-add is expressed as **two gathers** (per left/right child) from a
  flat contribution-block buffer, instead of the reference's scatter
  ``extend_add_kernel`` (FrontCUDA.cu:115) — gathers vectorize on TPU,
  scatters do not.
* ragged separator sizes inside a bucket are handled by **identity padding**
  of F11: padding rows/cols hold 1 on the diagonal and 0 elsewhere, which is
  exact under partial-pivoted LU (a padding row can never be selected as a
  pivot for a real column and contributes nothing to the Schur update).
* sparse assembly is a single scatter-add of ``Avals[asm_vidx]`` into the
  bucket tensor; values are gathered from the device copy of the permuted
  CSR values, so ``update_matrix_values`` reuses the entire plan
  (the reference's structure-reuse feature, StrumpackSparseSolver.hpp:196).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..sparse.csr import CSRMatrix
from ..sparse.separator_tree import SeparatorTree

# Padded-size schedule: fine at small sizes (batch parallelism dominates),
# ~1.5x geometric at large sizes (bounds compilation count and pad waste).
_PAD_SCHEDULE = [0, 4, 8, 16, 24, 32, 48, 64, 96, 128, 192, 256, 384, 512,
                 768, 1024, 1536, 2048, 3072, 4096, 6144, 8192, 12288, 16384,
                 24576, 32768]


def _build_ell(r, c, vidx_in, nrows, nnz_pad):
    """Pack COO (r, c, vidx) into padded ELL [nrows, kmax]: (cols, vidx)
    with padding slots pointing at the zero value (vals_ext[nnz_pad])."""
    if len(r) == 0:
        return (np.zeros((nrows, 1), np.int32),
                np.full((nrows, 1), nnz_pad, np.int64))
    order = np.lexsort((c, r))
    r, c, v = r[order], c[order], vidx_in[order]
    counts = np.bincount(r, minlength=nrows)
    kmax = max(int(counts.max()), 1)
    off = np.zeros(nrows + 1, np.int64)
    np.cumsum(counts, out=off[1:])
    k = np.arange(len(r)) - off[r]
    cols = np.zeros((nrows, kmax), np.int32)
    vidx = np.full((nrows, kmax), nnz_pad, np.int64)
    cols[r, k] = c
    vidx[r, k] = v
    return cols, vidx


def pad_size(x: int) -> int:
    for p in _PAD_SCHEDULE:
        if p >= x:
            return p
    raise ValueError(f"front dimension {x} exceeds pad schedule")


def chunk_cap_bytes() -> int:
    """Per-bucket working-set cap that triggers nf-chunked execution.
    Default: 3 GB (an [nf_c, p, p] f32 assembly + factor pieces must fit
    several times in a 16 GB HBM alongside factors and child CBs; the
    64^3 exact plan's largest bucket models at 2.04 GB and must stay
    UNCHUNKED — sequential chunks cost ~5% there for no benefit);
    override with STRUMPACK_TPU_CHUNK_GB."""
    import os
    env = os.environ.get("STRUMPACK_TPU_CHUNK_GB")
    return int(float(env) * 1e9) if env else 3 * 10 ** 9


def choose_chunks(nf: int, p: int, itemsize: int = 4) -> int:
    """Number of sequential chunks for an [nf, p, p] bucket: smallest
    power of two so one chunk's modeled working set fits the cap.  The
    multiplier is EIGHT dense [p, p] buffers per front: the 100^3 OOM
    dumps show the extend-add gather path keeping ~6 [nf, p, p]
    temporaries live (Cpad/G/GT/H per child pair) on top of F and the
    factor outputs."""
    cap = chunk_cap_bytes()
    # trip on the plain assembly model (3 dense buffers/front) so whole
    # buckets that fit keep their single batched dispatch; once chunking
    # IS needed, size chunks with the 8-buffer model (the extend-add
    # gather path keeps ~6 [p, p] temporaries live inside the scan body)
    if nf * 3 * p * p * itemsize <= cap:
        return 1
    per_front = 8 * p * p * itemsize
    chunks = 1
    while chunks < nf and (nf // chunks) * per_front > cap:
        chunks *= 2
    return chunks


def batch_pad(x: int) -> int:
    """Round a bucket's batch count up to a power of two (dummy identity
    fronts fill the tail) so jitted bucket kernels are shape-reusable
    across levels and across problems."""
    p = 1
    while p < x:
        p *= 2
    return p


@dataclass
class BucketPlan:
    """All fronts of one level sharing a padded (s_pad, u_pad) shape."""

    level: int
    s_pad: int
    u_pad: int
    fronts: np.ndarray          # [nf_real] global front ids
    ds: np.ndarray              # [nf] separator sizes (0 for dummy tail)
    du: np.ndarray              # [nf] update sizes (0 for dummy tail)
    # sparse assembly: F[asm_bidx, asm_r, asm_c] += vals_ext[asm_vidx]
    asm_bidx: np.ndarray = None   # [na] batch index
    asm_r: np.ndarray = None      # [na] row within the padded front
    asm_c: np.ndarray = None      # [na] col within the padded front
    asm_vidx: np.ndarray = None   # [na] index into extended values array
    # extend-add gathers, one set per child side
    posL: np.ndarray = None     # [nf, p] slot -> index in left child's upd, -1
    posR: np.ndarray = None
    offL: np.ndarray = None     # [nf] offset into child level's flat CB buffer
    offR: np.ndarray = None
    strideL: np.ndarray = None  # [nf] child u_pad
    strideR: np.ndarray = None
    voffL: np.ndarray = None    # [nf] offset into child level's flat CB vector
    voffR: np.ndarray = None
    # solve-phase global index maps (value n = zero padding slot)
    sep_glob: np.ndarray = None  # [nf, s_pad]
    upd_glob: np.ndarray = None  # [nf, u_pad]
    # structural child-presence flags: hasL[k] == front k has a left
    # child with a nonempty update set.  Computed from the TREE + global
    # |upd| sizes (not from posL content) so a content-restricted
    # distributed plan build (parallel/dist_plan.py) still produces
    # globally consistent trace structure on every process.
    hasL: np.ndarray = None      # [nf] bool
    hasR: np.ndarray = None      # [nf] bool
    # compression (FrontFactory analog: per-bucket front type selection)
    blr: bool = False
    tile: int = 0                # BLR tile size t
    max_rank: int = 0            # BLR fixed max rank r
    adm_band: int = 0            # 0 = weak admissibility, 1 = strong
    blr_variant: str = "rl"      # "rl" eager / "ll" LUAR-accumulated
    lr_algo: str = "rrqr"        # tile compressor (LowRankAlgorithm role)
    cb_comp: int = 0             # CB BLR tile size, 0 = dense CB (F22blr_)
    lossy: int = 0               # 0 = off, 8 = int8, 16 = bf16 storage
    hss: bool = False
    hodlr: bool = False
    hss_leaf: int = 0
    hss_rank: int = 0
    # HODBF fronts (FrontHODLR with HODLROptions butterfly_levels > 0):
    # F11 HODLR-factored, F11^-1 F12 and F21 stored butterfly-compressed
    hodbf: bool = False
    bf_D: int = 0                # butterfly depth for the (s_pad, u_pad) pair
    bf_r: int = 0                # butterfly max rank
    # TRUE HODBF direct factorization of F11 (HODBFMatrix.factor, the
    # bpack_factor role, FrontHODLR.cpp:442-449 + HODLRWrapper) instead
    # of HODLR-SMW — fixed-rank/traceable inside the jitted programs
    bf_direct: bool = False
    bf_cutoff: int = 256         # dense node cutoff inside the bf factor
    # sampling-constructed HSS root front (FrontHSS::random_sampling role,
    # FrontHSS.cpp:241): never assembles the dense front; mult/elem closures
    # read the sparse block (ELL) + the children's CBs directly
    hss_sample: bool = False
    samp: dict = None            # device index arrays (ELL + CB pos maps)
    samp_meta: dict = None       # static ints: ds, off/stride/has per child
    cb_rank: int = 0             # compressed-CB rank cap (0 = tile/4)
    # memory-bounded execution (FrontGPU split_smaller role at BUCKET
    # granularity): nf is processed in `chunks` sequential lax.scan steps
    # of nf/chunks fronts each, so one chunk's dense working set — not
    # the whole bucket's — bounds peak HBM (100^3-class mid-tree buckets
    # would otherwise assemble 10+ GB dense F batches)
    chunks: int = 1

    @property
    def nf(self) -> int:
        return len(self.ds)  # padded batch count

    @property
    def nf_real(self) -> int:
        return len(self.fronts)

    @property
    def p(self) -> int:
        return self.s_pad + self.u_pad


@dataclass
class LevelPlan:
    """Full factorization schedule: levels[0] is the deepest level."""

    n: int
    nnz: int
    tree: SeparatorTree
    upd: list
    levels: list = field(default_factory=list)  # list[list[BucketPlan]]
    cb_sizes: list = field(default_factory=list)   # flat CB floats per level
    cbv_sizes: list = field(default_factory=list)  # flat CB vector rows/level
    factor_nnz: int = 0
    factor_flops: int = 0
    max_front: int = 0

    @property
    def n_levels(self) -> int:
        return len(self.levels)


def _assign_bucket_compression(bp: BucketPlan, compression) -> None:
    """Per-bucket front-type selection (FrontFactory role,
    FrontFactory.hpp:84-133): resolves the configured CompressionType +
    size thresholds into the bucket's blr/hss/hodlr/hodbf/lossy flags.
    Shared by build_plan and plan_structure so the distributed plan
    build's structure pass agrees with the content pass."""
    if compression is None:
        return
    sp, up = bp.s_pad, bp.u_pad
    from ..options import CompressionType as CT
    comp = compression.compression
    min_sep = compression.compression_min_sep_size
    # composite per-front-size schemes resolve to an effective
    # type per bucket (FrontFactory.hpp:92-124 +
    # StrumpackOptions.hpp:1023-1040 per-level thresholds)
    eff = None
    if comp in (CT.BLR_HODLR, CT.ZFP_BLR_HODLR):
        hodlr_min = getattr(compression, "hodlr_min_sep_size", 512)
        lossy_min = getattr(compression, "lossy_min_sep_size", 8)
        if sp >= hodlr_min:
            # with --hss_sampling the composite's top fronts
            # are SAMPLING-built HSS instead of HODLR: no
            # dense (s+u)^2 assembly ever exists for them
            # (FrontHSS::random_sampling role, the 100^3 HBM
            # ceiling fix; BASELINE config 3's "HSS ULV,
            # randomized sampling")
            eff = (CT.HSS if getattr(compression.hss, "sampling", False)
                   else CT.HODLR)
        elif sp >= min_sep:
            eff = CT.BLR
        elif comp == CT.ZFP_BLR_HODLR and sp >= lossy_min:
            eff = CT.LOSSY
    elif comp == CT.LOSSLESS:
        # ZFP reversible role: factors stored exactly (see
        # CompressionType.LOSSLESS doc in options.py)
        eff = None
    elif comp != CT.NONE and sp >= min_sep:
        eff = comp
    if eff == CT.BLR:
        from .blr import choose_tile
        bp.blr = True
        bp.tile = choose_tile(sp, up, compression.blr.leaf_size)
        bp.max_rank = max(4, min(compression.blr.max_rank,
                                 bp.tile // 2))
        if getattr(compression.blr, "admissibility",
                   "weak") == "strong":
            bp.adm_band = 1
        bp.blr_variant = getattr(compression.blr,
                                 "factor_algorithm", "rl")
        bp.lr_algo = getattr(compression.blr,
                             "low_rank_algorithm", "rrqr")
        # memory-efficient variant: BLR-compressed CBs
        # (FrontBLR F22blr_ role) for big update blocks
        if (getattr(compression.blr, "cb_compression", False)
                and up >= 128 and up % 64 == 0):
            # 128-wide tiles when possible: [*, 64, 64] tile
            # batches pay 2x lane padding under TPU (8, 128)
            # tiling in transposed layouts (the round-4 100^3
            # OOM's biggest temps were 50% padding)
            bp.cb_comp = 128 if up % 128 == 0 else 64
            bp.cb_rank = getattr(compression.blr, "cb_rank_cap", 0)
    elif eff == CT.LOSSY:
        bp.lossy = getattr(compression, "lossy_precision", 16)
    elif eff in (CT.HSS, CT.HODLR, CT.HODBF):
        # structured fronts can hand their parents
        # BLR-compressed CBs too (F22blr_ role) — at 100^3
        # the top HODLR fronts' dense CBs are GB-scale
        if (getattr(compression.blr, "cb_compression", False)
                and up >= 128 and up % 64 == 0):
            bp.cb_comp = 128 if up % 128 == 0 else 64
            bp.cb_rank = getattr(compression.blr, "cb_rank_cap", 0)
        bf_levels = getattr(compression, "hodlr_butterfly_levels", 0)
        if eff == CT.HSS:
            if getattr(compression.hss, "sampling", False):
                # sampling-constructed fronts (root AND
                # interior): never assemble the dense front
                bp.hss_sample = True
            else:
                bp.hss = True
        elif eff == CT.HODBF or bf_levels > 0:
            bp.hodbf = True
        else:
            bp.hodlr = True
        bp.hss_leaf = min(compression.hss.leaf_size, max(sp // 4, 16))
        bp.hss_rank = min(compression.hss.max_rank, bp.hss_leaf)
        if (bp.hodbf and sp >= 2 * bp.hss_leaf
                and getattr(compression, "hodbf_direct", True)):
            # route F11 through the true direct butterfly factorization
            # when the HODLR tree has at least one level
            bp.bf_direct = True
            bp.bf_cutoff = int(getattr(compression,
                                       "hodbf_dense_cutoff", 256))
        if bp.hodbf and up > 0:
            # even butterfly depth usable by the rectangular
            # [s_pad, u_pad] off-diagonal blocks (bf_depth2)
            D = 0
            while (sp % (2 ** (D + 2)) == 0
                   and up % (2 ** (D + 2)) == 0
                   and min(sp, up) // (2 ** (D + 2)) >= 16):
                D += 2
            bp.bf_D = D
            bp.bf_r = bp.hss_rank


def plan_structure(tree: SeparatorTree, du_all, compression=None):
    """Structure-only bucket skeleton: the same level/bucket grouping,
    padded shapes, front membership and front-type flags as build_plan,
    computed from the tree + GLOBAL |upd| sizes alone (no pattern, no
    upd content).  Every process of a distributed run can evaluate this
    identically from DistUpd.sizes — it drives execution-mode selection
    (parallel/spmd.choose_modes) and the front->device mapping BEFORE
    any content is exchanged (parallel/dist_plan.py).

    Returns levels: list[list[BucketPlan]] (content arrays None)."""
    nseps = tree.nseps
    depths = tree.depths()
    maxd = int(depths.max()) if nseps else 0
    ds_all = (tree.sep_end - tree.sep_begin).astype(np.int64)
    du_all = np.asarray(du_all, np.int64)
    s_pad_all = np.array([pad_size(int(d)) for d in ds_all], np.int64)
    u_pad_all = np.array([pad_size(int(d)) for d in du_all], np.int64)
    levels = []
    for k in range(maxd + 1):
        depth = maxd - k
        fids = np.nonzero(depths == depth)[0]
        level_buckets = []
        keys = s_pad_all[fids] * (10**9) + u_pad_all[fids]
        for key in np.unique(keys):
            sel = fids[keys == key]
            nfr = len(sel)
            nf = batch_pad(nfr)
            ds_b = np.zeros(nf, dtype=np.int32)
            du_b = np.zeros(nf, dtype=np.int32)
            ds_b[:nfr] = ds_all[sel]
            du_b[:nfr] = du_all[sel]
            bp = BucketPlan(level=k, s_pad=int(s_pad_all[sel[0]]),
                            u_pad=int(u_pad_all[sel[0]]),
                            fronts=sel, ds=ds_b, du=du_b)
            bp.chunks = choose_chunks(nf, bp.p)
            _assign_bucket_compression(bp, compression)
            for side, cha in (("L", tree.lch), ("R", tree.rch)):
                chb = np.full(nf, -1, dtype=np.int64)
                chb[:nfr] = cha[sel]
                setattr(bp, "has" + side,
                        (chb >= 0) & (du_all[np.maximum(chb, 0)] > 0))
            level_buckets.append(bp)
        levels.append(level_buckets)
    return levels


def build_plan(Ap: CSRMatrix, tree: SeparatorTree,
               upd: list[np.ndarray], compression=None) -> LevelPlan:
    """compression: None or an SPOptions-like object with fields
    ``compression`` (CompressionType), ``compression_min_sep_size``,
    ``blr`` (BLROptions) — selects per-bucket front types the way
    FrontFactory::create_frontal_matrix does (FrontFactory.hpp:84-133)."""
    n, nnz = Ap.n, Ap.nnz
    nseps = tree.nseps
    depths = tree.depths()
    maxd = int(depths.max()) if nseps else 0

    ds_all = (tree.sep_end - tree.sep_begin).astype(np.int64)
    # ``upd`` is either a plain list of per-front index arrays (single-
    # process) or a DistUpd-like object (parallel/dist_symbolic.py):
    # GLOBAL |upd| sizes, but index CONTENT held only for the fronts
    # this process numerically needs.  Content-restricted fronts get
    # empty pos rows / padded upd_glob rows — the distributed staging
    # (parallel/spmd.ShardedPlan) never ships those rows anyway, and all
    # trace-level structure (shapes, hasL/hasR, bucket membership) comes
    # from sizes, so every process compiles the same program.
    is_dist = hasattr(upd, "sizes") and hasattr(upd, "has")
    if is_dist:
        du_all = np.asarray(upd.sizes, np.int64)
        avail = np.array([f for f in range(nseps) if upd.has(f)],
                         dtype=np.int64)
    else:
        du_all = np.array([len(u) for u in upd], dtype=np.int64)
        avail = np.arange(nseps, dtype=np.int64)

    def has_content(f):
        return (not is_dist) or upd.has(int(f))

    # ---- global helper arrays ------------------------------------------
    # owner front of each matrix index
    front_of = np.empty(n, dtype=np.int64)
    for i in range(nseps):
        front_of[tree.sep_begin[i]:tree.sep_end[i]] = i
    # concatenated CONTENT-AVAILABLE upd arrays with keyed search support
    avail_lens = du_all[avail]
    cat_off = np.zeros(len(avail) + 1, dtype=np.int64)
    np.cumsum(avail_lens, out=cat_off[1:])
    upd_cat = (np.concatenate([np.asarray(upd[int(f)]) for f in avail])
               if cat_off[-1] > 0 else np.empty(0, dtype=np.int64))
    # key = front * (n+1) + index, globally sorted (postorder front-major)
    upd_keys = (np.repeat(avail, avail_lens) * (n + 1) + upd_cat
                if cat_off[-1] > 0 else np.empty(0, dtype=np.int64))
    # front -> offset of its segment in upd_cat (missing fronts can
    # never hit a key, so their offset is irrelevant)
    upd_off = np.zeros(nseps, dtype=np.int64)
    upd_off[avail] = cat_off[:-1]

    def find_in_upd(front_ids, glob):
        """Vectorized: position of glob[k] in upd[front_ids[k]], or -1."""
        key = front_ids * (n + 1) + glob
        pos = np.searchsorted(upd_keys, key)
        ok = (pos < len(upd_keys)) & (glob >= 0)
        hit = np.zeros(len(key), dtype=bool)
        hit[ok] = upd_keys[pos[ok]] == key[ok]
        local = np.where(hit, pos - upd_off[front_ids], -1)
        return local.astype(np.int64)

    # ---- bucket assignment ---------------------------------------------
    s_pad_all = np.array([pad_size(int(d)) for d in ds_all], dtype=np.int64)
    u_pad_all = np.array([pad_size(int(d)) for d in du_all], dtype=np.int64)

    plan = LevelPlan(n=n, nnz=nnz, tree=tree, upd=upd)
    # front -> (level_index, cb offset, vec offset) assigned as levels build
    cb_off_of = np.full(nseps, -1, dtype=np.int64)
    cbv_off_of = np.full(nseps, -1, dtype=np.int64)
    batch_of = np.full(nseps, -1, dtype=np.int64)
    bucket_of = {}

    # global per-entry ownership for assembly (vectorized)
    rows_all = np.repeat(np.arange(n, dtype=np.int64), np.diff(Ap.rowptr))
    cols_all = Ap.colind
    owner = front_of[np.minimum(rows_all, cols_all)]
    owner_depth = depths[owner]
    bucket_id_of = np.full(nseps, -1, dtype=np.int64)

    for k in range(maxd + 1):
        depth = maxd - k
        fids = np.nonzero(depths == depth)[0]
        level_buckets = []
        cb_total = 0
        cbv_total = 0
        # group by (s_pad, u_pad)
        keys = s_pad_all[fids] * (10**9) + u_pad_all[fids]
        for key in np.unique(keys):
            sel = fids[keys == key]
            nfr = len(sel)
            nf = batch_pad(nfr)
            ds_b = np.zeros(nf, dtype=np.int32)
            du_b = np.zeros(nf, dtype=np.int32)
            ds_b[:nfr] = ds_all[sel]
            du_b[:nfr] = du_all[sel]
            bp = BucketPlan(level=k, s_pad=int(s_pad_all[sel[0]]),
                            u_pad=int(u_pad_all[sel[0]]),
                            fronts=sel, ds=ds_b, du=du_b)
            sp, up, p = bp.s_pad, bp.u_pad, bp.p
            bp.chunks = choose_chunks(nf, p)
            _assign_bucket_compression(bp, compression)
            # structural child-presence flags (see BucketPlan.hasL doc)
            for side, cha in (("L", tree.lch), ("R", tree.rch)):
                chb = np.full(nf, -1, dtype=np.int64)
                chb[:nfr] = cha[sel]
                setattr(bp, "has" + side,
                        (chb >= 0) & (du_all[np.maximum(chb, 0)] > 0))
            batch_of[sel] = np.arange(nfr)
            for f in sel:
                bucket_of[int(f)] = bp
            # CB offsets in this level's flat buffers
            cb_off_of[sel] = cb_total + np.arange(nfr, dtype=np.int64) * (up * up)
            cbv_off_of[sel] = cbv_total + np.arange(nfr, dtype=np.int64) * up
            cb_total += nf * up * up
            cbv_total += nf * up

            # ---- solve index maps
            sb = np.zeros((nf, 1), dtype=np.int64)
            sb[:nfr, 0] = tree.sep_begin[sel]
            i_s = np.arange(sp)[None, :]
            bp.sep_glob = np.where(i_s < ds_b[:, None], sb + i_s, n)
            bp.sep_glob = bp.sep_glob.astype(np.int32)
            ug = np.full((nf, up), n, dtype=np.int32)
            for bi, f in enumerate(sel):
                if has_content(f):
                    ug[bi, :du_all[f]] = upd[int(f)]
            bp.upd_glob = ug

            # ---- extend-add pos arrays
            glob = np.full((nf, p), -1, dtype=np.int64)
            glob[:, :sp] = np.where(i_s < ds_b[:, None], sb + i_s, -1)
            glob[:, sp:] = np.where(ug[:, :up] < n, ug[:, :up], -1)
            for side in ("L", "R"):
                ch = np.full(nf, -1, dtype=np.int64)
                ch[:nfr] = (tree.lch if side == "L" else tree.rch)[sel]
                has = ch >= 0
                pos = np.full((nf, p), -1, dtype=np.int64)
                if has.any() and p > 0:
                    chh = ch[has]
                    pos[has] = find_in_upd(
                        np.repeat(chh, p), glob[has].ravel()).reshape(-1, p)
                off = np.where(has, cb_off_of[np.maximum(ch, 0)], 0)
                voff = np.where(has, cbv_off_of[np.maximum(ch, 0)], 0)
                stride = np.where(has, u_pad_all[np.maximum(ch, 0)], 1)
                setattr(bp, "pos" + side, pos.astype(np.int32))
                setattr(bp, "off" + side, off.astype(np.int64))
                setattr(bp, "voff" + side, voff.astype(np.int64))
                setattr(bp, "stride" + side, stride.astype(np.int32))
            level_buckets.append(bp)

        # ---- assembly plan for this level (vectorized over all entries)
        in_level = owner_depth == depth
        er = rows_all[in_level]
        ec = cols_all[in_level]
        eo = owner[in_level]
        ev = np.nonzero(in_level)[0]
        # distributed plan build: the reduced pattern carries an explicit
        # entry -> value-pool slot map (parallel/dist_plan.py pools);
        # Ap.nnz is then the pool length, so the nnz/nnz+1 padding slots
        # keep pointing at the appended 0.0/1.0 values
        if getattr(Ap, "vidx", None) is not None:
            ev = np.asarray(Ap.vidx, np.int64)[ev]
        sb_e = tree.sep_begin[eo]
        se_e = tree.sep_end[eo]
        r_in_sep = (er >= sb_e) & (er < se_e)
        c_in_sep = (ec >= sb_e) & (ec < se_e)
        sp_e = s_pad_all[eo]
        rpos = np.where(r_in_sep, er - sb_e, sp_e + find_in_upd(eo, er))
        cpos = np.where(c_in_sep, ec - sb_e, sp_e + find_in_upd(eo, ec))
        # drop F22 entries (assembled at an ancestor) and any misses
        keep = r_in_sep | c_in_sep
        p_e = sp_e + u_pad_all[eo]
        for bi_b, bp in enumerate(level_buckets):
            bucket_id_of[bp.fronts] = bi_b
        ebkt = bucket_id_of[eo]
        for bi_b, bp in enumerate(level_buckets):
            m = keep & (ebkt == bi_b)
            if bp.hss_sample:
                # THIS bucket's padded front width (the loop variable p
                # above still holds the LAST bucket's width — a latent
                # mismatch whenever a level mixes sampling buckets of
                # different shapes, round-4 fix)
                p = int(bp.s_pad + bp.u_pad)
                # sampling fronts: no dense assembly — store the sparse
                # block as per-front ELL in PADDED front-local slot
                # indexing (rows/cols = front slots 0..p; F11 identity-
                # padding entries baked in so the closures need no
                # per-front sizes; value indices point into vals_ext so
                # update_matrix_values reuses the plan).  Children-CB
                # position maps are the regular posL/posR slot maps; the
                # child blocks themselves come from the extend-add pairs.
                bidx_s = batch_of[eo[m]]
                rr_s, cc_s, vv_s = rpos[m], cpos[m], ev[m]
                per = []
                for bi in range(bp.nf):
                    fm = bidx_s == bi
                    dsb = int(bp.ds[bi])
                    padi = np.arange(dsb, bp.s_pad, dtype=np.int64)
                    r1 = np.concatenate([rr_s[fm], padi])
                    c1 = np.concatenate([cc_s[fm], padi])
                    v1 = np.concatenate(
                        [vv_s[fm], np.full(len(padi), nnz + 1,
                                           dtype=np.int64)])
                    per.append((_build_ell(r1, c1, v1, p, nnz),
                                _build_ell(c1, r1, v1, p, nnz)))
                wmax = max(e[0][0].shape[1] for e in per)
                wmaxT = max(e[1][0].shape[1] for e in per)

                def padw(cols, vidx, w):
                    k = cols.shape[1]
                    if k == w:
                        return cols, vidx
                    return (np.pad(cols, ((0, 0), (0, w - k))),
                            np.pad(vidx, ((0, 0), (0, w - k)),
                                   constant_values=nnz))
                E = [padw(*e[0], wmax) for e in per]
                ET = [padw(*e[1], wmaxT) for e in per]
                bp.samp = dict(
                    samp_ell_cols=np.stack([e[0] for e in E]),
                    samp_ell_vidx=np.stack([e[1] for e in E]),
                    samp_ellT_cols=np.stack([e[0] for e in ET]),
                    samp_ellT_vidx=np.stack([e[1] for e in ET]))
                bp.samp_meta = dict(p=p)
                z32 = np.zeros(0, dtype=np.int32)
                bp.asm_bidx = bp.asm_r = bp.asm_c = z32
                bp.asm_vidx = np.zeros(0, dtype=np.int64)
                continue
            bidx = batch_of[eo[m]]
            vidx = ev[m]
            # identity padding of F11: diagonal ones on slots [ds, s_pad)
            pad_b, pad_i = np.nonzero(
                np.arange(bp.s_pad)[None, :] >= bp.ds[:, None])
            bp.asm_bidx = np.concatenate([bidx, pad_b]).astype(np.int32)
            bp.asm_r = np.concatenate([rpos[m], pad_i]).astype(np.int32)
            bp.asm_c = np.concatenate([cpos[m], pad_i]).astype(np.int32)
            bp.asm_vidx = np.concatenate(
                [vidx, np.full(len(pad_b), nnz + 1)]).astype(np.int64)

        plan.levels.append(level_buckets)
        plan.cb_sizes.append(cb_total)
        plan.cbv_sizes.append(cbv_total)

    # ---- generous initial rank caps (skip the adaptive restart) ---------
    # The adaptive-rank restart re-traces the factorization with larger
    # static shapes; with compressed-CB carries one grown bucket cascades
    # through every downstream group signature, so a restart costs a near-
    # full recompile (~2x cold start).  When uncapped-rank storage fits
    # comfortably in HBM, start at the caps the restart would converge to
    # (BLR: tile, HSS family: leaf) — saturation then cannot trigger.
    # Mirrors the reference's preference for resolving ranks in ONE
    # adaptive sweep (HSSMatrix.compress.hpp:37-100) rather than restarts.
    if any(bp.blr or bp.hss or bp.hodlr or bp.hodbf or bp.hss_sample
           for lvl in plan.levels for bp in lvl):
        from .numeric import hbm_budget_bytes, static_factor_bytes
        saved = [(bp.max_rank, bp.hss_rank)
                 for lvl in plan.levels for bp in lvl]
        for lvl in plan.levels:
            for bp in lvl:
                # never exceed an explicit user cap (--blr_max_rank /
                # --hss_max_rank): memory-motivated tight caps (e.g. the
                # 100^3 campaign's rank 32) must survive this pass
                if bp.blr:
                    bp.max_rank = min(bp.tile, compression.blr.max_rank)
                if bp.hss or bp.hodlr or bp.hodbf or bp.hss_sample:
                    bp.hss_rank = min(bp.hss_leaf,
                                      compression.hss.max_rank)
        if static_factor_bytes(plan) > 0.25 * hbm_budget_bytes():
            it = iter(saved)
            for lvl in plan.levels:
                for bp in lvl:
                    bp.max_rank, bp.hss_rank = next(it)

    # ---- stats ----------------------------------------------------------
    from ..sparse.symbolic import factor_flops, factor_nonzeros
    plan.factor_nnz = factor_nonzeros(tree, upd)
    plan.factor_flops = factor_flops(tree, upd)
    plan.max_front = int((ds_all + du_all).max()) if nseps else 0
    return plan

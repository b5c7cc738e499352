// Native host-side symbolic core.
//
// Role of the reference's C++ symbolic machinery: symbolic factorization
// (EliminationTree.cpp:65-123 bottom-up merge of child update sets), and
// BFS-based nested dissection (sparse/ordering/ANDSparspak.cpp).  These are
// irregular graph algorithms that belong on the host CPU (SURVEY.md 2.13);
// the Python planner calls these via ctypes for large problems.
//
// Build: g++ -O3 -march=native -shared -fPIC hostsym.cpp -o libhostsym.so
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <algorithm>
#include <vector>

using i64 = int64_t;

extern "C" {

// ---------------------------------------------------------------------------
// Symbolic factorization: per-front update index sets.
// Returns 0 on success; *out_upd is a malloc'd flat array with offsets
// *out_off (nseps+1 entries).  Caller frees both with hostsym_free.
// ---------------------------------------------------------------------------
int symbolic_factorization(i64 n, const i64* rowptr, const i64* colind,
                           i64 nseps, const i64* sep_begin,
                           const i64* sep_end, const i64* lch,
                           const i64* rch, i64** out_upd, i64** out_off) {
  std::vector<std::vector<i64>> upd(nseps);
  std::vector<i64> tmp;
  for (i64 i = 0; i < nseps; ++i) {
    i64 sb = sep_begin[i], se = sep_end[i];
    tmp.clear();
    for (i64 r = sb; r < se; ++r)
      for (i64 p = rowptr[r]; p < rowptr[r + 1]; ++p) {
        i64 c = colind[p];
        if (c >= se) tmp.push_back(c);
      }
    for (int side = 0; side < 2; ++side) {
      i64 ch = side == 0 ? lch[i] : rch[i];
      if (ch < 0) continue;
      for (i64 v : upd[ch])
        if (v >= se) tmp.push_back(v);
      // children's sets are no longer needed once merged into the parent,
      // but they are returned to the caller, so keep them.
    }
    std::sort(tmp.begin(), tmp.end());
    tmp.erase(std::unique(tmp.begin(), tmp.end()), tmp.end());
    upd[i] = tmp;
  }
  i64 total = 0;
  for (auto& u : upd) total += (i64)u.size();
  i64* flat = (i64*)malloc(sizeof(i64) * std::max<i64>(total, 1));
  i64* off = (i64*)malloc(sizeof(i64) * (nseps + 1));
  i64 pos = 0;
  off[0] = 0;
  for (i64 i = 0; i < nseps; ++i) {
    std::memcpy(flat + pos, upd[i].data(), sizeof(i64) * upd[i].size());
    pos += (i64)upd[i].size();
    off[i + 1] = pos;
  }
  *out_upd = flat;
  *out_off = off;
  return 0;
}

// ---------------------------------------------------------------------------
// BFS level-set bisection nested dissection (ANDSparspak role).
// Emits perm (perm[new] = old) and a postorder binary separator tree.
// ---------------------------------------------------------------------------
struct NDBuilder {
  std::vector<i64> perm, sb, se, par, lc, rc;
  i64 count = 0;
  i64 emit(const std::vector<i64>& v) {
    for (i64 x : v) perm.push_back(x);
    i64 lo = count;
    count += (i64)v.size();
    return lo;
  }
  i64 add_node(i64 lo, i64 hi, i64 l, i64 r) {
    i64 id = (i64)sb.size();
    sb.push_back(lo); se.push_back(hi);
    par.push_back(-1); lc.push_back(l); rc.push_back(r);
    if (l >= 0) par[l] = id;
    if (r >= 0) par[r] = id;
    return id;
  }
};

static i64 nd_rec(NDBuilder& B, const i64* rowptr, const i64* colind,
                  std::vector<i64>& ids, std::vector<i64>& mark,
                  std::vector<i64>& lev, i64 stamp_base, i64 leaf) {
  i64 m = (i64)ids.size();
  if (m <= leaf) {
    i64 lo = B.emit(ids);
    return B.add_node(lo, B.count, -1, -1);
  }
  // mark membership with a unique stamp; lev[] holds BFS levels
  i64 stamp = stamp_base;
  for (i64 v : ids) mark[v] = stamp;

  // pseudo-peripheral BFS from ids[0] (two sweeps)
  i64 start = ids[0];
  std::vector<i64> q;
  i64 maxlev = 0;
  for (int sweep = 0; sweep < 3; ++sweep) {
    for (i64 v : ids) lev[v] = -1;
    q.clear();
    q.push_back(start);
    lev[start] = 0;
    i64 last = start;
    maxlev = 0;
    for (size_t h = 0; h < q.size(); ++h) {
      i64 u = q[h];
      for (i64 p = rowptr[u]; p < rowptr[u + 1]; ++p) {
        i64 w = colind[p];
        if (mark[w] == stamp && lev[w] < 0) {
          lev[w] = lev[u] + 1;
          maxlev = std::max(maxlev, lev[w]);
          q.push_back(w);
          last = w;
        }
      }
    }
    if ((i64)q.size() < m) break;  // disconnected; handle below
    if (lev[last] == 0) break;
    start = last;
  }

  std::vector<i64> left, right, sep;
  if ((i64)q.size() < m) {
    // disconnected: reached component vs rest, empty separator
    for (i64 v : ids) (lev[v] >= 0 ? left : right).push_back(v);
  } else if (maxlev < 2) {
    i64 half = m / 2;
    left.assign(ids.begin(), ids.begin() + half);
    right.assign(ids.begin() + half, ids.end());
    // separator = boundary of left
    for (i64 v : right) mark[v] = stamp + 1;
    std::vector<i64> newleft;
    for (i64 v : left) {
      bool bnd = false;
      for (i64 p = rowptr[v]; p < rowptr[v + 1] && !bnd; ++p)
        if (mark[colind[p]] == stamp + 1) bnd = true;
      (bnd ? sep : newleft).push_back(v);
    }
    left.swap(newleft);
    for (i64 v : right) mark[v] = stamp;
  } else {
    // balanced split level
    std::vector<i64> cnt(maxlev + 2, 0);
    for (i64 v : ids) cnt[lev[v]]++;
    i64 cum = 0, split = 0, best = m;
    i64 c2 = 0;
    for (i64 l = 0; l <= maxlev - 1; ++l) {
      c2 += cnt[l];
      i64 bal = std::llabs(2 * c2 - m);
      if (bal < best) { best = bal; split = l; }
    }
    for (i64 v : ids) {
      if (lev[v] <= split) left.push_back(v); else right.push_back(v);
    }
    // separator: vertices of left adjacent to right
    for (i64 v : right) mark[v] = stamp + 1;
    std::vector<i64> newleft;
    for (i64 v : left) {
      bool bnd = false;
      for (i64 p = rowptr[v]; p < rowptr[v + 1] && !bnd; ++p)
        if (mark[colind[p]] == stamp + 1) bnd = true;
      (bnd ? sep : newleft).push_back(v);
    }
    left.swap(newleft);
    for (i64 v : right) mark[v] = stamp;
  }
  if (sep.empty() && (left.empty() || right.empty())) {
    i64 lo = B.emit(ids);
    return B.add_node(lo, B.count, -1, -1);
  }
  i64 l = -1, r = -1;
  if (!left.empty())
    l = nd_rec(B, rowptr, colind, left, mark, lev, stamp_base + 2, leaf);
  if (!right.empty())
    r = nd_rec(B, rowptr, colind, right, mark, lev, stamp_base + 2, leaf);
  i64 lo = B.emit(sep);
  return B.add_node(lo, B.count, l, r);
}

// Returns number of separators; fills malloc'd arrays.
i64 nested_dissection(i64 n, const i64* rowptr, const i64* colind, i64 leaf,
                      i64** out_perm, i64** out_sb, i64** out_se,
                      i64** out_par, i64** out_lc, i64** out_rc) {
  NDBuilder B;
  std::vector<i64> ids(n), mark(n, -1), lev(n, -1);
  for (i64 i = 0; i < n; ++i) ids[i] = i;
  nd_rec(B, rowptr, colind, ids, mark, lev, 0, leaf);
  i64 ns = (i64)B.sb.size();
  auto cpy = [](const std::vector<i64>& v) {
    i64* p = (i64*)malloc(sizeof(i64) * std::max<size_t>(v.size(), 1));
    std::memcpy(p, v.data(), sizeof(i64) * v.size());
    return p;
  };
  *out_perm = cpy(B.perm);
  *out_sb = cpy(B.sb);
  *out_se = cpy(B.se);
  *out_par = cpy(B.par);
  *out_lc = cpy(B.lc);
  *out_rc = cpy(B.rc);
  return ns;
}

void hostsym_free(i64* p) { free(p); }

}  // extern "C"

// meshkit: native host-side mesh/topology kernels for mfem_ad_tpu.
//
// The FE-space "graph builder" (unique edge/face enumeration and dof
// numbering — the reference does this inside MFEM's FiniteElementSpace,
// cf. /root/reference/src usage of FiniteElementSpace at ex1.cpp:47)
// is pure host work that dominates setup time at multi-million-element
// meshes.  The Python path uses np.unique(axis=0) (lexicographic sort of
// encoded rows); this library provides the same primitives ~10x faster
// and with a stable C ABI for ctypes.
//
// Build: make -C native   (produces libmeshkit.so)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

// <parallel/algorithm> is a libstdc++-only extension: clang with libc++
// defines _OPENMP under -fopenmp but has no such header, so gate on the
// standard library, not the OpenMP flag.
#if defined(_OPENMP) && defined(__GLIBCXX__)
#include <parallel/algorithm>
#define MK_SORT __gnu_parallel::sort
#else
#define MK_SORT std::sort
#endif

extern "C" {

// Sort-based unique rows of an [n, k] int64 array (rows pre-sorted within
// themselves by the caller when orientation-invariance is wanted).
// Outputs:
//   inverse [n]    index of each row in the unique set
//   uniq    [n*k]  unique rows, packed; only the first n_unique*k entries
//                  are meaningful
// Returns n_unique.
namespace {

// k == 2 fast path: pack both (non-negative, < 2^32) entries into one
// uint64 key and sort (key, index) pairs — one branchless compare per
// swap instead of a strided memcmp.
int64_t unique_rows_k2(const int64_t* rows, int64_t n,
                       int64_t* inverse, int64_t* uniq) {
  std::vector<std::pair<uint64_t, int64_t>> keys(n);
  for (int64_t i = 0; i < n; ++i) {
    keys[i] = {(static_cast<uint64_t>(rows[2 * i]) << 32) |
                   static_cast<uint64_t>(rows[2 * i + 1]),
               i};
  }
  MK_SORT(keys.begin(), keys.end());
  int64_t nu = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (i == 0 || keys[i].first != keys[i - 1].first) {
      uniq[2 * nu] = static_cast<int64_t>(keys[i].first >> 32);
      uniq[2 * nu + 1] = static_cast<int64_t>(keys[i].first & 0xffffffffu);
      ++nu;
    }
    inverse[keys[i].second] = nu - 1;
  }
  return nu;
}

// k == 4 fast path: two packed uint64 keys.
int64_t unique_rows_k4(const int64_t* rows, int64_t n,
                       int64_t* inverse, int64_t* uniq) {
  struct Rec {
    uint64_t k0, k1;
    int64_t idx;
    bool operator<(const Rec& o) const {
      return k0 != o.k0 ? k0 < o.k0 : k1 < o.k1;
    }
    bool operator==(const Rec& o) const { return k0 == o.k0 && k1 == o.k1; }
  };
  std::vector<Rec> keys(n);
  for (int64_t i = 0; i < n; ++i) {
    const int64_t* r = rows + 4 * i;
    keys[i] = {(static_cast<uint64_t>(r[0]) << 32) |
                   static_cast<uint64_t>(r[1]),
               (static_cast<uint64_t>(r[2]) << 32) |
                   static_cast<uint64_t>(r[3]),
               i};
  }
  MK_SORT(keys.begin(), keys.end());
  int64_t nu = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (i == 0 || !(keys[i] == keys[i - 1])) {
      uniq[4 * nu] = static_cast<int64_t>(keys[i].k0 >> 32);
      uniq[4 * nu + 1] = static_cast<int64_t>(keys[i].k0 & 0xffffffffu);
      uniq[4 * nu + 2] = static_cast<int64_t>(keys[i].k1 >> 32);
      uniq[4 * nu + 3] = static_cast<int64_t>(keys[i].k1 & 0xffffffffu);
      ++nu;
    }
    inverse[keys[i].idx] = nu - 1;
  }
  return nu;
}

bool fits_u32(const int64_t* rows, int64_t count) {
  for (int64_t i = 0; i < count; ++i) {
    if (rows[i] < 0 || rows[i] > 0xffffffffLL) return false;
  }
  return true;
}

}  // namespace

int64_t mk_unique_rows(const int64_t* rows, int64_t n, int64_t k,
                       int64_t* inverse, int64_t* uniq) {
  if (k == 2 && fits_u32(rows, 2 * n)) {
    return unique_rows_k2(rows, n, inverse, uniq);
  }
  if (k == 4 && fits_u32(rows, 4 * n)) {
    return unique_rows_k4(rows, n, inverse, uniq);
  }
  std::vector<int64_t> order(n);
  for (int64_t i = 0; i < n; ++i) order[i] = i;
  auto less = [rows, k](int64_t a, int64_t b) {
    const int64_t* ra = rows + a * k;
    const int64_t* rb = rows + b * k;
    for (int64_t j = 0; j < k; ++j) {
      if (ra[j] != rb[j]) return ra[j] < rb[j];
    }
    return false;
  };
  MK_SORT(order.begin(), order.end(), less);
  auto equal = [rows, k](int64_t a, int64_t b) {
    return std::memcmp(rows + a * k, rows + b * k,
                       sizeof(int64_t) * k) == 0;
  };
  int64_t nu = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (i == 0 || !equal(order[i], order[i - 1])) {
      std::memcpy(uniq + nu * k, rows + order[i] * k, sizeof(int64_t) * k);
      ++nu;
    }
    inverse[order[i]] = nu - 1;
  }
  return nu;
}

// Orientation-canonical H1 edge dof assignment for one edge class:
// for each element e and local edge le with endpoints (a[e], b[e]) and
// lattice index kk in 1..p-1, the edge-interior dof is
//   off_edge + edge_id[e]*npe + (canon(kk) - 1),
// canon(kk) = kk if a<b else p-kk  (matches fespace.py:250-255).
void mk_edge_dofs(const int64_t* a, const int64_t* b,
                  const int64_t* edge_id, int64_t ne,
                  int64_t off_edge, int64_t npe, int64_t p, int64_t kk,
                  int64_t* out) {
  for (int64_t e = 0; e < ne; ++e) {
    int64_t c = (a[e] < b[e]) ? kk : (p - kk);
    out[e] = off_edge + edge_id[e] * npe + (c - 1);
  }
}

}  // extern "C"

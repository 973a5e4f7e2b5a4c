// Native feature-track database + batch exporter (C ABI, ctypes-loaded).
//
// The device math is jitted JAX; the per-frame *host* hot path is track
// bookkeeping and the assembly of fixed-size padded observation batches
// (candidate selection, bounding-clone lookup, padding) — pointer-chasing
// work the reference keeps in C++ (`ov_core::FeatureDatabase`,
// feat/FeatureDatabase.h:68-162) and we do too.  Python's dict-based
// implementation (update/feature_db.py) remains the fallback when this
// library is not built.
//
// Build:  g++ -O3 -shared -fPIC -std=c++17 feature_db.cpp -o libplviwo_native.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <map>
#include <unordered_map>
#include <vector>

namespace {

struct Track {
  std::vector<double> times;
  std::vector<double> uvs;   // 2 per obs
  std::vector<double> uvns;  // 2 per obs
};

struct Db {
  std::unordered_map<int64_t, Track> tracks;
};

}  // namespace

extern "C" {

void* fdb_create() { return new Db(); }

void fdb_destroy(void* h) { delete static_cast<Db*>(h); }

void fdb_update(void* h, int64_t fid, double t, double u, double v, double un,
                double vn) {
  auto& tr = static_cast<Db*>(h)->tracks[fid];
  tr.times.push_back(t);
  tr.uvs.push_back(u);
  tr.uvs.push_back(v);
  tr.uvns.push_back(un);
  tr.uvns.push_back(vn);
}

// batched update: n features observed at time t
void fdb_update_batch(void* h, const int64_t* fids, const double* uvs,
                      const double* uvns, int64_t n, double t) {
  Db* db = static_cast<Db*>(h);
  for (int64_t i = 0; i < n; i++) {
    auto& tr = db->tracks[fids[i]];
    tr.times.push_back(t);
    tr.uvs.push_back(uvs[2 * i]);
    tr.uvs.push_back(uvs[2 * i + 1]);
    tr.uvns.push_back(uvns[2 * i]);
    tr.uvns.push_back(uvns[2 * i + 1]);
  }
}

void fdb_cleanup(void* h, double t_min) {
  Db* db = static_cast<Db*>(h);
  for (auto it = db->tracks.begin(); it != db->tracks.end();) {
    Track& tr = it->second;
    size_t first = 0;
    while (first < tr.times.size() && tr.times[first] < t_min) first++;
    if (first >= tr.times.size()) {
      it = db->tracks.erase(it);
      continue;
    }
    if (first > 0) {
      tr.times.erase(tr.times.begin(), tr.times.begin() + first);
      tr.uvs.erase(tr.uvs.begin(), tr.uvs.begin() + 2 * first);
      tr.uvns.erase(tr.uvns.begin(), tr.uvns.begin() + 2 * first);
    }
    ++it;
  }
}

void fdb_remove(void* h, const int64_t* fids, int64_t n) {
  Db* db = static_cast<Db*>(h);
  for (int64_t i = 0; i < n; i++) db->tracks.erase(fids[i]);
}

int64_t fdb_size(void* h) {
  return static_cast<int64_t>(static_cast<Db*>(h)->tracks.size());
}

// Assemble the padded MSCKF batch (the host prep of
// core/system.py::_msckf_update): candidate selection (lost-or-marginal
// tracks with >= min_track usable obs), bounding-clone interpolation lookup,
// and fixed-size padding.
//
// clone_t/clone_slot: sorted valid clone timetable (n_ct entries).
// marg_t: clone times that will fall out of the window next frame (n_marg).
// Outputs (caller-allocated, F = max_msckf, O = max_obs):
//   out_uv (F*O*2), out_uvn (F*O*2), out_s0/out_s1 (F*O int32),
//   out_lam (F*O), out_t (F*O obs times), out_valid (F*O uint8), out_fids (F int64).
// Returns the number of candidate features written.
int64_t fdb_export_msckf(void* h, const double* clone_t,
                         const int32_t* clone_slot, int64_t n_ct,
                         const double* marg_t, int64_t n_marg, double t_frame,
                         int64_t min_track, int64_t max_msckf, int64_t max_obs,
                         double* out_uv, double* out_uvn, int32_t* out_s0,
                         int32_t* out_s1, double* out_lam, double* out_t,
                         uint8_t* out_valid, int64_t* out_fids) {
  Db* db = static_cast<Db*>(h);
  const double kTimeTol = 1e-9;
  double t_lo = n_ct ? clone_t[0] : 1e300;
  double t_hi = n_ct ? clone_t[n_ct - 1] : -1e300;

  auto locate = [&](double ti, int32_t* s0, int32_t* s1, double* lam) -> bool {
    // exact match?
    auto it = std::lower_bound(clone_t, clone_t + n_ct, ti - kTimeTol);
    int64_t j = it - clone_t;
    if (j < n_ct && std::fabs(clone_t[j] - ti) <= kTimeTol) {
      *s0 = *s1 = clone_slot[j];
      *lam = 0.0;
      return true;
    }
    if (ti <= t_lo || ti >= t_hi) return false;
    // j points at the first clone_t > ti
    *s0 = clone_slot[j - 1];
    *s1 = clone_slot[j];
    *lam = (ti - clone_t[j - 1]) / (clone_t[j] - clone_t[j - 1]);
    return true;
  };

  auto is_marg = [&](double ti) {
    for (int64_t m = 0; m < n_marg; m++)
      if (std::fabs(marg_t[m] - ti) <= kTimeTol) return true;
    return false;
  };

  // candidate selection: (n_usable, fid), sorted descending
  std::vector<std::pair<int64_t, int64_t>> cands;
  for (auto& [fid, tr] : db->tracks) {
    int64_t usable = 0;
    bool hits_marg = false;
    int32_t s0, s1;
    double lam;
    for (double ti : tr.times) {
      if (locate(ti, &s0, &s1, &lam)) usable++;
      if (!hits_marg && is_marg(ti)) hits_marg = true;
    }
    if (usable < min_track) continue;
    bool lost = tr.times.back() < t_frame - kTimeTol;
    if (lost || hits_marg) cands.emplace_back(usable, fid);
  }
  std::sort(cands.rbegin(), cands.rend());
  if ((int64_t)cands.size() > max_msckf) cands.resize(max_msckf);

  std::memset(out_valid, 0, max_msckf * max_obs);
  for (int64_t i = 0; i < (int64_t)cands.size(); i++) {
    int64_t fid = cands[i].second;
    out_fids[i] = fid;
    Track& tr = db->tracks[fid];
    int64_t j = 0;
    for (size_t k = 0; k < tr.times.size() && j < max_obs; k++) {
      int32_t s0, s1;
      double lam;
      if (!locate(tr.times[k], &s0, &s1, &lam)) continue;
      int64_t idx = i * max_obs + j;
      out_uv[2 * idx] = tr.uvs[2 * k];
      out_uv[2 * idx + 1] = tr.uvs[2 * k + 1];
      out_uvn[2 * idx] = tr.uvns[2 * k];
      out_uvn[2 * idx + 1] = tr.uvns[2 * k + 1];
      out_s0[idx] = s0;
      out_s1[idx] = s1;
      out_lam[idx] = lam;
      out_t[idx] = tr.times[k];
      out_valid[idx] = 1;
      j++;
    }
  }
  return (int64_t)cands.size();
}

}  // extern "C"

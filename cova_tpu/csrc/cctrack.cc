// Host-side connected components + SORT (see cctrack.h).
//
// Semantics are an exact port of the reference tracker stack:
//   * cova-rs/gst-plugins/src/bboxcc/process.rs:5-49 (8-conn CC, area
//     threshold, OpenCV label order)
//   * cova-rs/sort/src/lib.rs (cost weights 1/2, ==2.0 discard, square
//     zero-padded Hungarian, IoU acceptance, birth order)
//   * cova-rs/sort/src/tracker/mod.rs (Kalman matrices, Joseph update,
//     s-velocity clamp, 5-streak confirmation gate, min_hits/max_age,
//     trimmed dead histories, from_x quirk)
//   * cova-rs/gst-plugins/src/cova/tracker.rs (seen bookkeeping,
//     min_required, oldest)
// mirroring the JAX device implementation (cova_tpu/tracker/,
// cova_tpu/ops/cc.py) which stays the multi-chip/all-device variant;
// tests/test_cctrack.py checks the two differentially.

#include "cctrack.h"

#include <algorithm>
#include <cmath>
#include <functional>
#include <map>
#include <cstdlib>
#include <cstring>
#include <limits>
#include <vector>

namespace {

constexpr double kInf = std::numeric_limits<double>::infinity();

// ---------------------------------------------------------------------------
// Connected components (8-connected, two-pass union-find)
// ---------------------------------------------------------------------------

struct UnionFind {
  std::vector<int32_t> parent;
  int32_t find(int32_t x) {
    while (parent[x] != x) {
      parent[x] = parent[parent[x]];
      x = parent[x];
    }
    return x;
  }
  void unite(int32_t a, int32_t b) {
    a = find(a);
    b = find(b);
    if (a == b) return;
    if (a < b)  // keep the smaller (earlier raster) index as root
      parent[b] = a;
    else
      parent[a] = b;
  }
};

}  // namespace

extern "C" {

int cova_cc_boxes(const uint8_t* masks, int f, int h, int w,
                  int area_threshold, int max_boxes, float* ltwh_out,
                  float* area_out, uint8_t* valid_out) {
  if (f < 0 || h <= 0 || w <= 0 || max_boxes <= 0) return -1;
  size_t n = (size_t)h * w;
  UnionFind uf;
  std::vector<int32_t> first_px, minr, maxr, minc, maxc, area, order;
  for (int fi = 0; fi < f; fi++) {
    const uint8_t* m = masks + (size_t)fi * n;
    uf.parent.assign(n, 0);
    for (size_t i = 0; i < n; i++) uf.parent[i] = (int32_t)i;
    // Pass 1: union each foreground pixel with its W/NW/N/NE neighbors.
    for (int y = 0; y < h; y++) {
      const uint8_t* row = m + (size_t)y * w;
      for (int x = 0; x < w; x++) {
        if (!row[x]) continue;
        int32_t i = y * w + x;
        if (x > 0 && row[x - 1]) uf.unite(i, i - 1);
        if (y > 0) {
          const uint8_t* up = row - w;
          if (up[x]) uf.unite(i, i - w);
          if (x > 0 && up[x - 1]) uf.unite(i, i - w - 1);
          if (x + 1 < w && up[x + 1]) uf.unite(i, i - w + 1);
        }
      }
    }
    // Pass 2: stats per root (root = min raster index of the component).
    first_px.assign(0, 0);
    minr.assign(0, 0);
    // dense per-root maps via a root->slot index array
    std::vector<int32_t> slot(n, -1);
    first_px.clear();
    minr.clear();
    maxr.clear();
    minc.clear();
    maxc.clear();
    area.clear();
    for (int y = 0; y < h; y++) {
      const uint8_t* row = m + (size_t)y * w;
      for (int x = 0; x < w; x++) {
        if (!row[x]) continue;
        int32_t root = uf.find(y * w + x);
        int32_t s = slot[root];
        if (s < 0) {
          s = (int32_t)first_px.size();
          slot[root] = s;
          first_px.push_back(root);  // roots discovered in raster order
          minr.push_back(y);
          maxr.push_back(y);
          minc.push_back(x);
          maxc.push_back(x);
          area.push_back(0);
        }
        if (y < minr[s]) minr[s] = y;
        if (y > maxr[s]) maxr[s] = y;
        if (x < minc[s]) minc[s] = x;
        if (x > maxc[s]) maxc[s] = x;
        area[s]++;
      }
    }
    // Emit up to max_boxes components with pixel area >= threshold, in
    // root raster order (== discovery order since roots are the
    // components' minimum raster indices).
    float* lo = ltwh_out + (size_t)fi * max_boxes * 4;
    float* ao = area_out + (size_t)fi * max_boxes;
    uint8_t* vo = valid_out + (size_t)fi * max_boxes;
    memset(lo, 0, sizeof(float) * max_boxes * 4);
    memset(ao, 0, sizeof(float) * max_boxes);
    memset(vo, 0, max_boxes);
    int k = 0;
    for (size_t s = 0; s < first_px.size() && k < max_boxes; s++) {
      if (area[s] < area_threshold) continue;
      float bw = (float)(maxc[s] - minc[s] + 1);
      float bh = (float)(maxr[s] - minr[s] + 1);
      lo[k * 4 + 0] = (float)minc[s];
      lo[k * 4 + 1] = (float)minr[s];
      lo[k * 4 + 2] = bw;
      lo[k * 4 + 3] = bh;
      ao[k] = bw * bh;  // reference Bbox::new area = w*h
      vo[k] = 1;
      k++;
    }
  }
  return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// SORT
// ---------------------------------------------------------------------------

namespace {

// Kalman matrices (reference motion_model.rs:36-55,
// linear_observation_model.rs:32-47, tracker/mod.rs:38-46).
const double kQ[7] = {1, 1, 1, 1, 0.01, 0.01, 0.0001};
const double kR[4] = {1, 1, 10, 10};
const double kP0[7] = {10, 10, 10, 10, 1e4, 1e4, 1e4};
constexpr int kStreakConfirm = 5;  // mod.rs:76-80

struct Track {
  double mean[7];
  double cov[7][7];
  int32_t id = -1;
  double start_ts = 0, last_match = 0;
  int hits = 0, hit_streak = 0, tsu = 0, age = 0;
  bool active = false;
  std::vector<double> hist_ts;
  std::vector<float> hist_ltwh;  // 4 per entry
  std::vector<double> seen_ts;
};

struct DeadRecord {
  int32_t id;
  double start_ts, end_ts;
  bool seen;
  std::vector<double> hist_ts;
  std::vector<float> hist_ltwh;
};

// x -> ltwh with the reference from_x quirk (state.rs:19-28).
void x_to_bbox(const double* x, bool quirk, float* ltwh) {
  double s = std::max(x[2], 1e-12), r = std::max(x[3], 1e-12);
  double w = std::sqrt(s * r);
  double h = s / std::max(w, 1e-12);
  double top_off = quirk ? w / 2.0 : h / 2.0;
  ltwh[0] = (float)(x[0] - w / 2.0);
  ltwh[1] = (float)(x[1] - top_off);
  ltwh[2] = (float)w;
  ltwh[3] = (float)h;
}

void bbox_to_z(const float* ltwh, double* z) {
  double l = ltwh[0], t = ltwh[1], w = ltwh[2], h = ltwh[3];
  z[0] = l + w / 2.0;
  z[1] = t + h / 2.0;
  z[2] = w * h;
  z[3] = w / std::max((double)h, 1e-12);
}

double iou_ltwh(const float* a, const float* b) {
  double ax2 = a[0] + a[2], ay2 = a[1] + a[3];
  double bx2 = b[0] + b[2], by2 = b[1] + b[3];
  double ix = std::min(ax2, bx2) - std::max((double)a[0], (double)b[0]);
  double iy = std::min(ay2, by2) - std::max((double)a[1], (double)b[1]);
  if (ix <= 0 || iy <= 0) return 0.0;
  double inter = ix * iy;
  double uni = (double)a[2] * a[3] + (double)b[2] * b[3] - inter;
  return uni > 0 ? inter / uni : 0.0;
}

// Predict (with the s-velocity clamp, mod.rs:104-121).
void kalman_predict(Track& t) {
  double* x = t.mean;
  if (x[6] + x[2] <= 0.0) x[6] = 0.0;
  // x' = F x with F = I + shifts
  x[0] += x[4];
  x[1] += x[5];
  x[2] += x[6];
  // P' = F P F^T + Q; F adds row/col couplings (0,4),(1,5),(2,6)
  double p[7][7];
  memcpy(p, t.cov, sizeof(p));
  // A = F P  (row i gets += row i+4 for i in 0..2)
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 7; j++) p[i][j] += t.cov[i + 4][j];
  // P' = A F^T (col j gets += col j+4)
  double p2[7][7];
  memcpy(p2, p, sizeof(p2));
  for (int j = 0; j < 3; j++)
    for (int i = 0; i < 7; i++) p2[i][j] += p[i][j + 4];
  for (int i = 0; i < 7; i++) p2[i][i] += kQ[i];
  memcpy(t.cov, p2, sizeof(p2));
}

// 4x4 inversion (Gauss-Jordan with partial pivoting).
bool inv4(const double a_in[4][4], double out[4][4]) {
  double a[4][8];
  for (int i = 0; i < 4; i++) {
    for (int j = 0; j < 4; j++) a[i][j] = a_in[i][j];
    for (int j = 0; j < 4; j++) a[i][4 + j] = i == j ? 1.0 : 0.0;
  }
  for (int c = 0; c < 4; c++) {
    int piv = c;
    for (int r = c + 1; r < 4; r++)
      if (std::fabs(a[r][c]) > std::fabs(a[piv][c])) piv = r;
    if (std::fabs(a[piv][c]) < 1e-30) return false;
    if (piv != c)
      for (int j = 0; j < 8; j++) std::swap(a[piv][j], a[c][j]);
    double d = a[c][c];
    for (int j = 0; j < 8; j++) a[c][j] /= d;
    for (int r = 0; r < 4; r++) {
      if (r == c) continue;
      double f = a[r][c];
      if (f == 0.0) continue;
      for (int j = 0; j < 8; j++) a[r][j] -= f * a[c][j];
    }
  }
  for (int i = 0; i < 4; i++)
    for (int j = 0; j < 4; j++) out[i][j] = a[i][4 + j];
  return true;
}

// Joseph-form measurement update (mod.rs:88-92). H = [I4 | 0].
void kalman_update(Track& t, const double* z) {
  double (&p)[7][7] = t.cov;
  double s[4][4];
  for (int i = 0; i < 4; i++)
    for (int j = 0; j < 4; j++) s[i][j] = p[i][j] + (i == j ? kR[i] : 0.0);
  double si[4][4];
  if (!inv4(s, si)) return;
  // K = P H^T S^-1  -> (7,4)
  double k[7][4];
  for (int i = 0; i < 7; i++)
    for (int j = 0; j < 4; j++) {
      double acc = 0;
      for (int m = 0; m < 4; m++) acc += p[i][m] * si[m][j];
      k[i][j] = acc;
    }
  double y[4];
  for (int i = 0; i < 4; i++) y[i] = z[i] - t.mean[i];
  for (int i = 0; i < 7; i++) {
    double acc = 0;
    for (int j = 0; j < 4; j++) acc += k[i][j] * y[j];
    t.mean[i] += acc;
  }
  // IKH = I - K H  (K H zero-extends K to the first 4 columns)
  double ikh[7][7];
  for (int i = 0; i < 7; i++)
    for (int j = 0; j < 7; j++)
      ikh[i][j] = (i == j ? 1.0 : 0.0) - (j < 4 ? k[i][j] : 0.0);
  // P' = IKH P IKH^T + K R K^T
  double tmp[7][7];
  for (int i = 0; i < 7; i++)
    for (int j = 0; j < 7; j++) {
      double acc = 0;
      for (int m = 0; m < 7; m++) acc += ikh[i][m] * p[m][j];
      tmp[i][j] = acc;
    }
  double p2[7][7];
  for (int i = 0; i < 7; i++)
    for (int j = 0; j < 7; j++) {
      double acc = 0;
      for (int m = 0; m < 7; m++) acc += tmp[i][m] * ikh[j][m];
      for (int m = 0; m < 4; m++) acc += k[i][m] * kR[m] * k[j][m];
      p2[i][j] = acc;
    }
  memcpy(p, p2, sizeof(p2));
}

// ---------------------------------------------------------------------------
// Sparse exact assignment as min-cost flow.
//
// The reference's square zero-padded Hungarian over max(nt, nd) rows is
// equivalent to this flow problem (same LP): every det column must be
// covered by exactly one row; rows are either specific tracks with
// IoU-dependent det costs, or members of interchangeable classes
// (zero-IoU weight-1 tracks, weight-2 tracks, all-zero padding rows)
// whose det cost is column-independent — modeled as class supplies
// feeding a shared pool; padding COLUMNS are 'not sending flow' (their
// count always equals the number of unassigned rows). Only nonzero-IoU
// (track, det) arcs are materialized, so dense coasting-track frames
// cost O(nd * edges) instead of O(max(nt, nd)^3).
// ---------------------------------------------------------------------------

struct McmfEdge {
  int to, rev;
  int cap;
  double cost;
};

struct Mcmf {
  std::vector<std::vector<McmfEdge>> g;
  std::vector<double> dist, pot;
  std::vector<int> pe, pv;
  std::vector<char> done;

  void init(int n) {
    g.assign(n, {});
    pot.assign(n, 0.0);
  }
  void add(int a, int b, int cap, double cost) {
    g[a].push_back({b, (int)g[b].size(), cap, cost});
    g[b].push_back({a, (int)g[a].size() - 1, 0, -cost});
  }
  // Successive shortest paths (Dijkstra + potentials; all costs >= 0).
  // Pushes up to `want` units from s to t; returns units pushed.
  int run(int s, int t, int want) {
    int n = (int)g.size();
    int pushed = 0;
    while (pushed < want) {
      dist.assign(n, kInf);
      pe.assign(n, -1);
      pv.assign(n, -1);
      done.assign(n, 0);
      dist[s] = 0;
      // Dense Dijkstra (node counts are tens).
      for (;;) {
        int u = -1;
        double best = kInf;
        for (int i = 0; i < n; i++)
          if (!done[i] && dist[i] < best) {
            best = dist[i];
            u = i;
          }
        if (u < 0) break;
        done[u] = 1;
        for (size_t k = 0; k < g[u].size(); k++) {
          const McmfEdge& e = g[u][k];
          if (e.cap <= 0) continue;
          double nd = dist[u] + e.cost + pot[u] - pot[e.to];
          if (nd < dist[e.to] - 1e-12) {
            dist[e.to] = nd;
            pe[e.to] = (int)k;
            pv[e.to] = u;
          }
        }
      }
      if (dist[t] == kInf) break;
      for (int i = 0; i < n; i++)
        if (dist[i] < kInf) pot[i] += dist[i];
      for (int v = t; v != s; v = pv[v]) {
        McmfEdge& e = g[pv[v]][pe[v]];
        e.cap -= 1;
        g[v][e.rev].cap += 1;
      }
      pushed++;
    }
    return pushed;
  }
};

// Exact square Hungarian, minimization (e-maxx potentials formulation).
// Scratch vectors are caller-owned to keep the per-frame path
// allocation-free.
struct HungarianScratch {
  std::vector<double>&u, &v, &minv;
  std::vector<int>&p, &way;
  std::vector<char>& used;
};
void hungarian(const std::vector<double>& a, int n,
               std::vector<int>& row_to_col, HungarianScratch s) {
  auto& u = s.u; auto& v = s.v; auto& minv = s.minv;
  auto& p = s.p; auto& way = s.way; auto& used = s.used;
  u.assign(n + 1, 0); v.assign(n + 1, 0); minv.resize(n + 1);
  p.assign(n + 1, 0); way.assign(n + 1, 0); used.resize(n + 1);
  for (int i = 1; i <= n; i++) {
    p[0] = i;
    int j0 = 0;
    std::fill(minv.begin(), minv.end(), kInf);
    std::fill(used.begin(), used.end(), 0);
    do {
      used[j0] = 1;
      int i0 = p[j0], j1 = -1;
      double delta = kInf;
      for (int j = 1; j <= n; j++) {
        if (used[j]) continue;
        double cur = a[(size_t)(i0 - 1) * n + (j - 1)] - u[i0] - v[j];
        if (cur < minv[j]) {
          minv[j] = cur;
          way[j] = j0;
        }
        if (minv[j] < delta) {
          delta = minv[j];
          j1 = j;
        }
      }
      for (int j = 0; j <= n; j++) {
        if (used[j]) {
          u[p[j]] += delta;
          v[j] -= delta;
        } else {
          minv[j] -= delta;
        }
      }
      j0 = j1;
    } while (p[j0] != 0);
    do {
      int j1 = way[j0];
      p[j0] = p[j1];
      j0 = j1;
    } while (j0);
  }
  row_to_col.assign(n, -1);
  for (int j = 1; j <= n; j++)
    if (p[j] > 0) row_to_col[p[j] - 1] = j - 1;
}

struct SortTracker {
  float iou_threshold;
  int max_age, min_hits;
  bool quirk;
  int32_t id_counter = 0;
  std::vector<Track> tracks;
  std::vector<DeadRecord> dead;
  // per-update scratch (avoid re-allocation on the per-frame path)
  std::vector<float> pred_scratch;
  std::vector<float> batch_scratch;
  std::vector<double> iou_scratch, cost_scratch;
  std::vector<int> interesting_scratch, r2c_scratch;
  std::vector<double> hu_u, hu_v, hu_minv;
  std::vector<int> hu_p, hu_way;
  std::vector<char> hu_used;
  Mcmf mcmf;

  void report(Track& t) {
    DeadRecord r;
    r.id = t.id;
    r.start_ts = t.start_ts;
    r.end_ts = t.last_match;
    // Trim the last tsu history entries (unmatched-tail predictions,
    // lib.rs:169-177 / scheduler.tracks history[:len-tsu]).
    size_t keep = t.hist_ts.size();
    if (t.tsu > 0)
      keep = keep > (size_t)t.tsu ? keep - (size_t)t.tsu : 0;
    r.hist_ts.assign(t.hist_ts.begin(), t.hist_ts.begin() + keep);
    r.hist_ltwh.assign(t.hist_ltwh.begin(), t.hist_ltwh.begin() + keep * 4);
    r.seen = false;
    for (double s : t.seen_ts)
      if (s >= t.start_ts && s <= t.last_match) {
        r.seen = true;
        break;
      }
    dead.push_back(std::move(r));
  }
};

}  // namespace

extern "C" {

void* cova_sort_new(float iou_threshold, int max_age, int min_hits,
                    int from_x_quirk) {
  auto* t = new SortTracker();
  t->iou_threshold = iou_threshold;
  t->max_age = max_age;
  t->min_hits = min_hits;
  t->quirk = from_x_quirk != 0;
  return t;
}

void cova_sort_free(void* h) { delete (SortTracker*)h; }

int cova_sort_update(void* h, const float* ltwh, int n, double ts,
                     double* min_required_out) {
  auto* st = (SortTracker*)h;
  int nt = (int)st->tracks.size();

  // ---- predict + history push ----
  std::vector<float>& pred = st->pred_scratch;
  pred.resize((size_t)nt * 4);
  for (int i = 0; i < nt; i++) {
    Track& t = st->tracks[i];
    kalman_predict(t);
    x_to_bbox(t.mean, st->quirk, &pred[(size_t)i * 4]);
    t.hist_ts.push_back(ts);
    for (int k = 0; k < 4; k++) t.hist_ltwh.push_back(pred[(size_t)i * 4 + k]);
    t.age++;
    t.tsu++;
  }

  // ---- assignment (square zero-padded, lib.rs:25-56) ----
  // Exact size reduction of the reference's max(nt, nd)-square
  // Hungarian: rows fall into four classes — "interesting" tracks
  // (some det with IoU > 0, distinct cost rows), zero-IoU tracks of
  // weight 1 (identical rows: cost 1 on every det, 0 on padding),
  // zero-IoU tracks of weight 2, and all-zero padding rows. At most nd
  // rows of an identical class can occupy det columns in any solution,
  // so keeping min(count, nd) clones of each class (and shrinking the
  // padding columns to keep the matrix square) preserves the optimum
  // exactly while the matrix drops from O(nt) to O(interesting + 3*nd)
  // — coasting tracks pile up under max_age=60 and made the full
  // matrix the pipeline's hottest host cost.
  std::vector<int> match(nt, -1);
  std::vector<char> det_matched(n, 0);
  // COVA_SORT_FULL_MATRIX=1: solve the unreduced reference matrix
  // (validation switch; tests/test_cctrack.py pins reduced == full).
  static int full_matrix = -1;
  if (full_matrix < 0) {
    const char* e = getenv("COVA_SORT_FULL_MATRIX");
    full_matrix = e && e[0] == '1';
  }
  if (nt > 0 && n > 0 && full_matrix) {
    int s = std::max(nt, n);
    std::vector<double>& cost = st->cost_scratch;
    cost.assign((size_t)s * s, 0.0);
    for (int i = 0; i < nt; i++) {
      double w = st->tracks[i].active ? 1.0 : 2.0;
      for (int j = 0; j < n; j++)
        cost[(size_t)i * s + j] =
            w - iou_ltwh(&pred[(size_t)i * 4], &ltwh[(size_t)j * 4]);
    }
    std::vector<int>& row_to_col = st->r2c_scratch;
    hungarian(cost, s, row_to_col,
              {st->hu_u, st->hu_v, st->hu_minv, st->hu_p, st->hu_way,
               st->hu_used});
    for (int i = 0; i < nt; i++) {
      int j = row_to_col[i];
      if (j < 0 || j >= n) continue;
      double v = iou_ltwh(&pred[(size_t)i * 4], &ltwh[(size_t)j * 4]);
      if (v >= st->iou_threshold && v > 0.0) {
        match[i] = j;
        det_matched[j] = 1;
      }
    }
  } else if (nt > 0 && n > 0) {
    std::vector<double>& iou = st->iou_scratch;
    iou.resize((size_t)nt * n);
    std::vector<int>& interesting = st->interesting_scratch;
    interesting.clear();
    int u1 = 0, u2 = 0;
    for (int i = 0; i < nt; i++) {
      bool any = false;
      for (int j = 0; j < n; j++) {
        double v = iou_ltwh(&pred[(size_t)i * 4], &ltwh[(size_t)j * 4]);
        iou[(size_t)i * n + j] = v;
        any |= v > 0.0;
      }
      if (any)
        interesting.push_back(i);
      else if (st->tracks[i].active)
        u1++;
      else
        u2++;
    }
    // Flow network (see Mcmf): S -> {interesting tracks, class nodes}
    // -> {dets, pool} -> T, pushing one unit per det.
    int ni = (int)interesting.size();
    int S = 0, T = 1, DET0 = 2, POOL = 2 + n, TRK0 = 3 + n;
    int U1N = TRK0 + ni, U2N = U1N + 1, PRN = U2N + 1;
    Mcmf& mc = st->mcmf;
    mc.init(PRN + 1);
    for (int j = 0; j < n; j++) mc.add(DET0 + j, T, 1, 0.0);
    mc.add(POOL, T, 0, 0.0);  // pool never sinks directly
    for (int a = 0; a < ni; a++) {
      int i = interesting[a];
      double w = st->tracks[i].active ? 1.0 : 2.0;
      mc.add(S, TRK0 + a, 1, 0.0);
      mc.add(TRK0 + a, POOL, 1, w);  // zero-IoU real-det escape
      for (int j = 0; j < n; j++)
        if (iou[(size_t)i * n + j] > 0.0)
          mc.add(TRK0 + a, DET0 + j, 1, w - iou[(size_t)i * n + j]);
    }
    if (u1) {
      mc.add(S, U1N, u1, 0.0);
      mc.add(U1N, POOL, u1, 1.0);
    }
    if (u2) {
      mc.add(S, U2N, u2, 0.0);
      mc.add(U2N, POOL, u2, 2.0);
    }
    int padrows = std::max(0, n - nt);
    if (padrows) {
      mc.add(S, PRN, padrows, 0.0);
      mc.add(PRN, POOL, padrows, 0.0);
    }
    for (int j = 0; j < n; j++) mc.add(POOL, DET0 + j, 1, 0.0);
    mc.run(S, T, n);
    for (int a = 0; a < ni; a++) {
      int i = interesting[a];
      for (const McmfEdge& e : mc.g[TRK0 + a]) {
        if (e.to < DET0 || e.to >= DET0 + n || e.cost < 0) continue;
        if (e.cap != 0) continue;  // unit arc fully used => matched
        int j = e.to - DET0;
        double v = iou[(size_t)i * n + j];
        // discard ==2.0 pairs; accept iou >= threshold (both reduce to
        // iou >= threshold with iou > 0, lib.rs:106-127)
        if (v >= st->iou_threshold && v > 0.0) {
          match[i] = j;
          det_matched[j] = 1;
        }
        break;
      }
    }
  }

  // ---- measurement update + lifecycle ----
  for (int i = 0; i < nt; i++) {
    Track& t = st->tracks[i];
    if (match[i] >= 0) {
      double z[4];
      bbox_to_z(&ltwh[(size_t)match[i] * 4], z);
      kalman_update(t, z);
      t.hits++;
      t.hit_streak++;
      if (t.hit_streak >= kStreakConfirm) {  // mod.rs:76-80
        t.tsu = 0;
        t.last_match = ts;
      }
    } else {
      t.hit_streak = 0;
    }
    if (t.hit_streak >= st->min_hits) t.active = true;
  }

  // ---- deaths (forward order, matching the reference's Vec walk) ----
  double min_required = -kInf;
  bool any_death = false, any_unseen = false;
  int reported = 0;
  size_t keep = 0;
  for (int i = 0; i < nt; i++) {
    Track& t = st->tracks[i];
    if (t.tsu > st->max_age) {
      any_death = true;
      if (t.active) {
        st->report(t);
        reported++;
        if (!st->dead.back().seen) {
          any_unseen = true;
          min_required = std::max(min_required, t.start_ts);
        }
      }
      continue;  // dropped
    }
    if (keep != (size_t)i) st->tracks[keep] = std::move(t);
    keep++;
  }
  st->tracks.resize(keep);
  if (min_required_out) {
    if (!any_death)
      *min_required_out = std::numeric_limits<double>::quiet_NaN();
    else if (!any_unseen)
      *min_required_out = 0.0;  // tracker.rs:50-58 fold over 0
    else
      *min_required_out = min_required;
  }

  // ---- births (detection order, lib.rs:183-188) ----
  for (int j = 0; j < n; j++) {
    if (det_matched[j]) continue;
    Track t;
    double z[4];
    bbox_to_z(&ltwh[(size_t)j * 4], z);
    for (int k = 0; k < 4; k++) t.mean[k] = z[k];
    t.mean[4] = t.mean[5] = t.mean[6] = 0.0;
    memset(t.cov, 0, sizeof(t.cov));
    for (int k = 0; k < 7; k++) t.cov[k][k] = kP0[k];
    t.id = st->id_counter++;
    t.start_ts = ts;
    t.last_match = ts;
    st->tracks.push_back(std::move(t));
  }

  return reported;
}

int cova_sort_update_batch(void* h, const float* ltwh, const uint8_t* valid,
                           int f, int k, double ts0, double step) {
  // One ABI crossing per chunk instead of per frame: compact each
  // frame's valid slots and run the ordinary per-frame update. Exactly
  // equivalent to f cova_sort_update calls (pinned by
  // tests/test_cctrack.py); min_required is deliberately not surfaced
  // (see header).
  auto* st = (SortTracker*)h;
  std::vector<float>& det = st->batch_scratch;
  int total = 0;
  for (int i = 0; i < f; i++) {
    const float* L = ltwh + (size_t)i * k * 4;
    const uint8_t* V = valid + (size_t)i * k;
    det.clear();
    for (int j = 0; j < k; j++)
      if (V[j]) det.insert(det.end(), L + (size_t)j * 4, L + (size_t)j * 4 + 4);
    total += cova_sort_update(h, det.data(), (int)det.size() / 4,
                              ts0 + i * step, nullptr);
  }
  return total;
}

void cova_sort_mark_seen(void* h, double ts) {
  auto* st = (SortTracker*)h;
  for (auto& t : st->tracks) t.seen_ts.push_back(ts);
}

double cova_sort_oldest(void* h) {
  auto* st = (SortTracker*)h;
  double m = kInf;
  for (auto& t : st->tracks) m = std::min(m, t.start_ts);
  return m;
}

int cova_sort_finalize(void* h) {
  auto* st = (SortTracker*)h;
  int added = 0;
  for (auto& t : st->tracks) {
    if (t.active && (int)t.hist_ts.size() > st->min_hits) {
      DeadRecord r;
      r.id = t.id;
      r.start_ts = t.start_ts;
      r.end_ts = t.hist_ts.empty() ? t.start_ts : t.hist_ts.back();
      r.seen = !t.seen_ts.empty();  // finalize's simpler predicate
      r.hist_ts = t.hist_ts;
      r.hist_ltwh = t.hist_ltwh;
      st->dead.push_back(std::move(r));
      added++;
    }
  }
  st->tracks.clear();
  return added;
}

int cova_sort_dead_count(void* h) {
  return (int)((SortTracker*)h)->dead.size();
}

void cova_sort_dead_info(void* h, int i, int32_t* track_id, double* start_ts,
                         double* end_ts, int32_t* seen, int32_t* hist_len) {
  auto& d = ((SortTracker*)h)->dead[i];
  *track_id = d.id;
  *start_ts = d.start_ts;
  *end_ts = d.end_ts;
  *seen = d.seen ? 1 : 0;
  *hist_len = (int32_t)d.hist_ts.size();
}

void cova_sort_dead_history(void* h, int i, double* ts_out, float* ltwh_out) {
  auto& d = ((SortTracker*)h)->dead[i];
  memcpy(ts_out, d.hist_ts.data(), d.hist_ts.size() * sizeof(double));
  memcpy(ltwh_out, d.hist_ltwh.data(), d.hist_ltwh.size() * sizeof(float));
}

void cova_sort_drain(void* h) { ((SortTracker*)h)->dead.clear(); }

}  // extern "C"

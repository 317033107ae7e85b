// CPU reference baseline for bench.py — a from-scratch C++/OpenMP
// implementation of the video-extruder pipeline capability (pyramid +
// FAST9 blockwise detection + semi-dense SAD flow + particle lifecycle),
// algorithmically equivalent to matt-42/vpp's tracker hot path
// (vpp/algorithms/video_extruder/video_extruder.hpp) and built the way the
// reference builds (-O3 -march=native -fopenmp, auto-vectorised row loops).
// It measures "reference CPU frames/s" on this machine so the TPU numbers
// have an honest denominator. Not a copy: independent scalar code.
//
// Round 5 adds the tracking+BA denominator (BASELINE configs 4-5): a
// scalar SLAM engine — tracker + keyframe Gauss-Newton PnP + 2-view DLT
// triangulation + Levenberg-Marquardt sliding-window BA with landmark
// Schur elimination — the capability the reference only STUBS
// (structure_from_motion.hh:55-56 declares triangulation()/
// bundle_adjustement() with empty bodies), implemented the way a C++
// practitioner would (analytic Jacobians, dense Cholesky on the reduced
// camera system).
//
// Build:  g++ -O3 -march=native -fopenmp -shared -fPIC -o libvppcpu.so cpu_baseline.cpp
// Entry:  extern "C" double tracker_fps(int w, int h, int frames, int seed);
//         extern "C" double slam_fps(const float* frames, ... )  (see below)

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <array>
#include <vector>
#include <unordered_map>
#include <chrono>
#include <algorithm>
#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct Img {
  int h = 0, w = 0, b = 0, stride = 0;
  std::vector<uint8_t> buf;
  void init(int h_, int w_, int b_) {
    h = h_; w = w_; b = b_; stride = w + 2 * b;
    buf.assign((size_t)(h + 2 * b) * stride, 0);
  }
  uint8_t* row(int r) { return buf.data() + (size_t)(r + b) * stride + b; }
  const uint8_t* row(int r) const {
    return buf.data() + (size_t)(r + b) * stride + b;
  }
  uint8_t at(int r, int c) const { return row(r)[c]; }
  void mirror_border() {
    for (int r = 0; r < h; r++) {
      uint8_t* p = row(r);
      for (int k = 1; k <= b; k++) { p[-k] = p[k - 1]; p[w + k - 1] = p[w - k]; }
    }
    for (int k = 1; k <= b; k++) {
      std::memcpy(row(-k) - b, row(k - 1) - b, stride);
      std::memcpy(row(h + k - 1) - b, row(h - k) - b, stride);
    }
  }
};

void lowpass_subsample2(const Img& in, Img& out) {
  // separable 1-4-6-4-1 / 16 then stride-2 decimation
  int h = in.h, w = in.w;
  std::vector<uint16_t> tmp((size_t)h * w);
#pragma omp parallel for
  for (int r = 0; r < h; r++) {
    const uint8_t* p = in.row(r);
    uint16_t* t = &tmp[(size_t)r * w];
    for (int c = 0; c < w; c++)
      t[c] = (uint16_t)((p[c - 2] + 4 * p[c - 1] + 6 * p[c] + 4 * p[c + 1] +
                         p[c + 2]) / 16);
  }
#pragma omp parallel for
  for (int r = 0; r < out.h; r++) {
    uint8_t* o = out.row(r);
    int sr = std::min(2 * r, h - 1);
    int r0 = std::max(sr - 2, 0), r1 = std::max(sr - 1, 0);
    int r3 = std::min(sr + 1, h - 1), r4 = std::min(sr + 2, h - 1);
    const uint16_t* t0 = &tmp[(size_t)r0 * w];
    const uint16_t* t1 = &tmp[(size_t)r1 * w];
    const uint16_t* t2 = &tmp[(size_t)sr * w];
    const uint16_t* t3 = &tmp[(size_t)r3 * w];
    const uint16_t* t4 = &tmp[(size_t)r4 * w];
    for (int c = 0; c < out.w; c++) {
      int sc = std::min(2 * c, w - 1);
      o[c] = (uint8_t)((t0[sc] + 4 * t1[sc] + 6 * t2[sc] + 4 * t3[sc] +
                        t4[sc]) / 16);
    }
  }
  out.mirror_border();
}

static const int CIRCLE[16][2] = {
    {-3, -1}, {-3, 0}, {-3, 1}, {-2, 2}, {-1, 3}, {0, 3}, {1, 3}, {2, 2},
    {3, 1},   {3, 0},  {3, -1}, {2, -2}, {1, -3}, {0, -3}, {-1, -3}, {-2, -2}};

inline bool has9(uint32_t m16) {
  uint32_t c = m16 | (m16 << 16);
  uint32_t r2 = c & (c << 1);
  uint32_t r4 = r2 & (r2 << 2);
  uint32_t r8 = r4 & (r4 << 4);
  uint32_t r9 = r8 & (c << 8);
  return (r9 & 0xFFFF0000u) != 0;
}

int fast9_score_at(const Img& im, int r, int c, int th) {
  int v = im.at(r, c), sup = 0, inf = 0;
  for (auto& o : CIRCLE) {
    int d = (int)im.at(r + o[0], c + o[1]) - v;
    if (d > th) sup += d;
    else if (d < -th) inf -= d;
  }
  return std::max(sup, inf);
}

bool fast9_is_kp(const Img& im, int r, int c, int th) {
  int v = im.at(r, c);
  uint32_t br = 0, dk = 0;
  for (int k = 0; k < 16; k++) {
    int a = im.at(r + CIRCLE[k][0], c + CIRCLE[k][1]);
    br |= (uint32_t)(a > v + th) << k;
    dk |= (uint32_t)(a < v - th) << k;
  }
  return has9(br) || has9(dk);
}

template <int WS>
inline int sad(const Img& a, const Img& b, int ar, int ac, int br, int bc,
               int cap) {
  // WS is a compile-time constant so the column loop fully unrolls and
  // auto-vectorises (a runtime winsize measured ~25% slower end-to-end)
  constexpr int half = WS / 2;
  int err = 0;
  for (int r = 0; r < WS && err <= cap; r++) {
    const uint8_t* pa = a.row(ar - half + r) + ac - half;
    const uint8_t* pb = b.row(br - half + r) + bc - half;
    int e = 0;
    for (int c = 0; c < WS; c++) e += std::abs((int)pa[c] - (int)pb[c]);
    err += e;
  }
  return err;
}

struct KP { float r, c; int age; int id; };

struct TrackCfg {
  int nscales = 3, winsize = 9, patch = 5, spacing = 10, th = 10,
      period = 5, prop_iters = 2;
};

// One tracker frame: semi-dense flow (coarse-to-fine greedy descent +
// propagation), keypoint move/kill, collision merge, low-score cull,
// periodic blockwise FAST detection. Extracted verbatim from the round-1
// tracker_fps body so the SLAM engine reuses the identical hot path.
// Templated on the winsize so the SAD loops keep their compile-time
// trip counts (the round-1 code had them as local constants).
template <int WINSIZE>
void tracker_step_t(std::vector<Img>& pyr1, std::vector<Img>& pyr2,
                    std::vector<KP>& kps, const TrackCfg& P, int t, int h,
                    int w, int& next_id) {
  const int nscales = P.nscales, patch = P.patch,
            spacing = P.spacing, th = P.th, period = P.period,
            prop_iters = P.prop_iters;
  // --- semi-dense flow on patch grid, coarse to fine
  int gh = std::max(h / patch, 1), gw = std::max(w / patch, 1);
  std::vector<int> flow_r(gh * gw), flow_c(gh * gw), dist(gh * gw);
  std::vector<uint8_t> mark(gh * gw);
  std::vector<int> pflow_r, pflow_c; std::vector<uint8_t> pmark;
  for (int s = nscales - 1; s >= 0; s--) {
    const Img &a = pyr1[s], &b = pyr2[s];
    int div = 1 << s;
    int lgh = std::max(gh >> s, 1), lgw = std::max(gw >> s, 1);
    std::vector<int> fr(lgh * lgw, 0), fc(lgh * lgw, 0),
        fd(lgh * lgw, 1 << 30);
    std::vector<uint8_t> fm(lgh * lgw, 0);
    std::vector<int> rep_r(lgh * lgw, -1), rep_c(lgh * lgw, -1);
    for (auto& kp : kps) {
      if (kp.age <= 0) continue;
      int pr = (int)kp.r / div, pc = (int)kp.c / div;
      int cell = std::min(pr / patch, lgh - 1) * lgw +
                 std::min(pc / patch, lgw - 1);
      if (rep_r[cell] < 0) { rep_r[cell] = pr; rep_c[cell] = pc; }
    }
#pragma omp parallel for
    for (int cell = 0; cell < lgh * lgw; cell++) {
      if (rep_r[cell] < 0) continue;
      int pr = rep_r[cell], pc = rep_c[cell];
      int mr = pr, mc = pc;
      if (s < nscales - 1) {
        int cgh = std::max(gh >> (s + 1), 1),
            cgw = std::max(gw >> (s + 1), 1);
        int ccell = std::min(pr / (2 * patch), cgh - 1) * cgw +
                    std::min(pc / (2 * patch), cgw - 1);
        if (pmark[ccell]) { mr += 2 * pflow_r[ccell]; mc += 2 * pflow_c[ccell]; }
      }
      if (mr < 0 || mr >= a.h || mc < 0 || mc >= a.w) { mr = pr; mc = pc; }
      int d = sad<WINSIZE>(a, b, pr, pc, mr, mc, 1 << 30);
      for (int it = 0; it < 5; it++) {
        int br = mr, bc = mc, bd = d;
        for (int dr = -1; dr <= 1; dr++)
          for (int dc = -1; dc <= 1; dc++) {
            if (!dr && !dc) continue;
            int nr = mr + dr, nc = mc + dc;
            if (nr < 0 || nr >= a.h || nc < 0 || nc >= a.w) continue;
            int nd = sad<WINSIZE>(a, b, pr, pc, nr, nc, bd);
            if (nd < bd) { bd = nd; br = nr; bc = nc; }
          }
        if (br == mr && bc == mc) break;
        mr = br; mc = bc; d = bd;
      }
      fr[cell] = mr - pr; fc[cell] = mc - pc; fd[cell] = d; fm[cell] = 1;
    }
    // propagation sweeps
    for (int it = 0; it < prop_iters; it++) {
#pragma omp parallel for
      for (int cell = 0; cell < lgh * lgw; cell++) {
        if (!fm[cell]) continue;
        int cr = cell / lgw, cc = cell % lgw;
        int pr = rep_r[cell], pc = rep_c[cell];
        for (int dr = -1; dr <= 1; dr++)
          for (int dc = -1; dc <= 1; dc++) {
            if (!dr && !dc) continue;
            int nr = cr + dr, nc = cc + dc;
            if (nr < 0 || nr >= lgh || nc < 0 || nc >= lgw) continue;
            int n = nr * lgw + nc;
            if (!fm[n]) continue;
            int ddr = fr[cell] - fr[n], ddc = fc[cell] - fc[n];
            if (ddr * ddr + ddc * ddc <= 4) continue;
            int tr = pr + fr[n], tc = pc + fc[n];
            if (tr < 0 || tr >= a.h || tc < 0 || tc >= a.w) continue;
            int d2 = sad<WINSIZE>(a, b, pr, pc, tr, tc, fd[cell]);
            if (d2 < fd[cell]) { fd[cell] = d2; fr[cell] = fr[n]; fc[cell] = fc[n]; }
          }
      }
    }
    pflow_r.swap(fr); pflow_c.swap(fc); pmark.swap(fm);
    if (s == 0) { flow_r = pflow_r; flow_c = pflow_c; mark.assign(pmark.begin(), pmark.end()); dist = fd; }
  }
  // move/kill keypoints
  for (auto& kp : kps) {
    if (kp.age <= 0) continue;
    int cell = std::min((int)kp.r / patch, gh - 1) * gw +
               std::min((int)kp.c / patch, gw - 1);
    if (!mark[cell]) { kp.age = 0; continue; }
    float nr2 = kp.r + flow_r[cell], nc2 = kp.c + flow_c[cell];
    if (nr2 < 0 || nr2 > h - 1 || nc2 < 0 || nc2 > w - 1) kp.age = 0;
    else { kp.r = nr2; kp.c = nc2; kp.age++; }
  }
  // merge collided (oldest wins)
  {
    int mh = std::max(h / spacing, 1), mw = std::max(w / spacing, 1);
    std::vector<int> best(mh * mw, -1);
    for (size_t i = 0; i < kps.size(); i++) {
      if (kps[i].age <= 0) continue;
      int cell = std::min((int)kps[i].r / spacing, mh - 1) * mw +
                 std::min((int)kps[i].c / spacing, mw - 1);
      int j = best[cell];
      if (j < 0) best[cell] = (int)i;
      else if (kps[j].age < kps[i].age) { kps[j].age = 0; best[cell] = (int)i; }
      else if (kps[j].age > kps[i].age) kps[i].age = 0;
    }
  }
  // cull low score
#pragma omp parallel for
  for (int i = 0; i < (int)kps.size(); i++) {
    auto& kp = kps[i];
    if (kp.age > 0 &&
        fast9_score_at(pyr2[0], (int)kp.r, (int)kp.c, th) < 3)
      kp.age = 0;
  }
  // periodic detection (blockwise maxima, occupancy mask)
  if (t % period == 0) {
    int mh = std::max(h / spacing, 1), mw = std::max(w / spacing, 1);
    std::vector<uint8_t> occ(mh * mw, 0);
    for (auto& kp : kps)
      if (kp.age > 0) {
        int rr = std::min((int)kp.r / spacing, mh - 1),
            cc = std::min((int)kp.c / spacing, mw - 1);
        for (int dr = -1; dr <= 1; dr++)
          for (int dc = -1; dc <= 1; dc++) {
            int r2 = rr + dr, c2 = cc + dc;
            if (r2 >= 0 && r2 < mh && c2 >= 0 && c2 < mw)
              occ[r2 * mw + c2] = 1;
          }
      }
    std::vector<KP> fresh;
#pragma omp parallel
    {
      std::vector<KP> local;
#pragma omp for
      for (int br = 0; br < h; br += spacing) {
        for (int bc = 0; bc < w; bc += spacing) {
          if (occ[std::min(br / spacing, mh - 1) * mw +
                  std::min(bc / spacing, mw - 1)])
            continue;
          int bestd = 0, bestr = -1, bestc = -1;
          for (int r = br; r < std::min(br + spacing, h); r++)
            for (int c = bc; c < std::min(bc + spacing, w); c++)
              if (fast9_is_kp(pyr2[0], r, c, th)) {
                int sc2 = fast9_score_at(pyr2[0], r, c, th) / 16;
                if (sc2 > bestd) { bestd = sc2; bestr = r; bestc = c; }
              }
          if (bestr >= 0) local.push_back({(float)bestr, (float)bestc, 1, 0});
        }
      }
#pragma omp critical
      fresh.insert(fresh.end(), local.begin(), local.end());
    }
    // compact + spawn (ids assigned serially: stable track identity)
    std::vector<KP> keep;
    keep.reserve(kps.size() + fresh.size());
    for (auto& kp : kps) if (kp.age > 0) keep.push_back(kp);
    for (auto& kp : fresh) { kp.id = next_id++; keep.push_back(kp); }
    kps.swap(keep);
  }
}

void tracker_step(std::vector<Img>& pyr1, std::vector<Img>& pyr2,
                  std::vector<KP>& kps, const TrackCfg& P, int t, int h,
                  int w, int& next_id) {
  switch (P.winsize) {
    case 7: tracker_step_t<7>(pyr1, pyr2, kps, P, t, h, w, next_id); break;
    case 9: tracker_step_t<9>(pyr1, pyr2, kps, P, t, h, w, next_id); break;
    case 11: tracker_step_t<11>(pyr1, pyr2, kps, P, t, h, w, next_id); break;
    default: tracker_step_t<9>(pyr1, pyr2, kps, P, t, h, w, next_id); break;
  }
}

}  // namespace

extern "C" double tracker_fps_stats(int w, int h, int nframes, int seed,
                                    int* out_nlive) {
  const TrackCfg P;  // defaults == round-1 bench config (frozen)
  const int border = 2 * P.winsize;
  // synthetic moving texture (same spec as bench.py's TPU clip)
  srand(seed);
  int TH = h + nframes + 8, TW = w + nframes + 8;
  std::vector<uint8_t> tex((size_t)TH * TW);
  for (auto& t : tex) t = (uint8_t)(rand() % 256);
  // light smoothing
  for (int r = 1; r < TH - 1; r++)
    for (int c = 1; c < TW - 1; c++) {
      int s = 0;
      for (int dr = -1; dr <= 1; dr++)
        for (int dc = -1; dc <= 1; dc++)
          s += tex[(size_t)(r + dr) * TW + c + dc];
      tex[(size_t)r * TW + c] = (uint8_t)(s / 9);
    }

  std::vector<Img> pyr1(P.nscales), pyr2(P.nscales);
  int hh = h, ww = w;
  for (int s = 0; s < P.nscales; s++) {
    pyr1[s].init(hh, ww, border);
    pyr2[s].init(hh, ww, border);
    hh = 1 + hh / 2; ww = 1 + ww / 2;
  }
  std::vector<KP> kps;
  int next_id = 0;
  auto load_frame = [&](std::vector<Img>& pyr, int t) {
    for (int r = 0; r < h; r++)
      std::memcpy(pyr[0].row(r), &tex[(size_t)(r + t) * TW + t], w);
    pyr[0].mirror_border();
    for (int s = 1; s < P.nscales; s++) lowpass_subsample2(pyr[s - 1], pyr[s]);
  };

  load_frame(pyr1, 0);
  auto t0 = std::chrono::steady_clock::now();
  for (int t = 1; t <= nframes; t++) {
    load_frame(pyr2, std::min(t, nframes));
    tracker_step(pyr1, pyr2, kps, P, t, h, w, next_id);
    std::swap(pyr1, pyr2);
  }
  auto t1 = std::chrono::steady_clock::now();
  double secs = std::chrono::duration<double>(t1 - t0).count();
  if (out_nlive) {
    int nlive = 0;
    for (auto& kp : kps) if (kp.age > 0) nlive++;
    *out_nlive = nlive;
  }
  return nframes / secs;
}

extern "C" double tracker_fps(int w, int h, int nframes, int seed) {
  return tracker_fps_stats(w, h, nframes, seed, nullptr);
}

// BASELINE config 2: FAST-9 + LBP descriptors on a 3-level pyramid,
// measured ms/frame on this machine (OpenMP + auto-vectorised row loops,
// like the reference's lbp_transform.hh / fast.hpp drivers).
extern "C" double fastlbp_ms(int w, int h, int iters, int seed) {
  Img lv0, lv1, lv2;
  lv0.init(h, w, 3);
  lv1.init(1 + h / 2, 1 + w / 2, 3);
  lv2.init(1 + lv1.h / 2, 1 + lv1.w / 2, 3);
  uint32_t st = (uint32_t)seed * 2654435761u + 12345u;
  for (int r = 0; r < h; r++) {
    uint8_t* p = lv0.row(r);
    for (int c = 0; c < w; c++) {
      st = st * 1664525u + 1013904223u;
      p[c] = (uint8_t)(st >> 24);
    }
  }
  lv0.mirror_border();
  volatile long long sink = 0;
  auto run_once = [&]() {
    long long acc = 0;
    lowpass_subsample2(lv0, lv1);
    lowpass_subsample2(lv1, lv2);
    const Img* lv[3] = {&lv0, &lv1, &lv2};
    for (int s_ = 0; s_ < 3; s_++) {
      const Img& im = *lv[s_];
      // FAST9 detect + score
#pragma omp parallel for reduction(+ : acc) schedule(static)
      for (int r = 3; r < im.h - 3; r++)
        for (int c = 3; c < im.w - 3; c++)
          if (fast9_is_kp(im, r, c, 10)) acc += fast9_score_at(im, r, c, 10);
      // LBP descriptor image (8-neighbour code)
#pragma omp parallel for reduction(+ : acc) schedule(static)
      for (int r = 0; r < im.h; r++) {
        const uint8_t* pm = im.row(r - 1);
        const uint8_t* p0 = im.row(r);
        const uint8_t* pp = im.row(r + 1);
        for (int c = 0; c < im.w; c++) {
          uint8_t v = p0[c];
          unsigned code = (unsigned)(pm[c - 1] > v) | ((unsigned)(pm[c] > v) << 1) |
                          ((unsigned)(pm[c + 1] > v) << 2) |
                          ((unsigned)(p0[c - 1] > v) << 3) |
                          ((unsigned)(p0[c + 1] > v) << 4) |
                          ((unsigned)(pp[c - 1] > v) << 5) |
                          ((unsigned)(pp[c] > v) << 6) |
                          ((unsigned)(pp[c + 1] > v) << 7);
          acc += (long long)code;
        }
      }
    }
    sink += acc;
  };
  run_once();  // warm caches/threads
  auto t0 = std::chrono::steady_clock::now();
  for (int i = 0; i < iters; i++) run_once();
  auto t1 = std::chrono::steady_clock::now();
  (void)sink;
  return std::chrono::duration<double, std::milli>(t1 - t0).count() / iters;
}

// Pyramidal Lucas-Kanade denominator (reference methodology:
// benchmarks/pyrlk_opencv_comparison.cc:60-80 — time the sparse LK flow
// of ~1k keypoints at VGA). Scalar C++/OpenMP mirror of the library's
// lucas_kanade(): per call builds both 3-level pyramids + a Scharr
// gradient pyramid, then per keypoint runs coarse->fine Newton LK
// (winsize^2 bilinearly-sampled windows, 2x2 solve, early exit on
// convergence — the data-dependent exit is the CPU's structural
// advantage and is kept).
namespace {

struct FImg {
  int h = 0, w = 0;
  std::vector<float> gr, gc;
  void scharr_of(const Img& im) {
    h = im.h; w = im.w;
    gr.assign((size_t)h * w, 0.f);
    gc.assign((size_t)h * w, 0.f);
#pragma omp parallel for
    for (int r = 0; r < h; r++)
      for (int c = 0; c < w; c++) {
        // 3-10-3 / 32 Scharr (reference filters/scharr.hh:10-43)
        float gx = (3.f * im.at(r - 1, c + 1) + 10.f * im.at(r, c + 1) +
                    3.f * im.at(r + 1, c + 1) - 3.f * im.at(r - 1, c - 1) -
                    10.f * im.at(r, c - 1) - 3.f * im.at(r + 1, c - 1)) / 32.f;
        float gy = (3.f * im.at(r + 1, c - 1) + 10.f * im.at(r + 1, c) +
                    3.f * im.at(r + 1, c + 1) - 3.f * im.at(r - 1, c - 1) -
                    10.f * im.at(r - 1, c) - 3.f * im.at(r - 1, c + 1)) / 32.f;
        gr[(size_t)r * w + c] = gy;
        gc[(size_t)r * w + c] = gx;
      }
  }
};

inline float bil_u8(const Img& im, float r, float c) {
  int r0 = (int)std::floor(r), c0 = (int)std::floor(c);
  float fr = r - r0, fc = c - c0;
  r0 = std::max(-im.b, std::min(r0, im.h + im.b - 2));
  c0 = std::max(-im.b, std::min(c0, im.w + im.b - 2));
  const uint8_t* p0 = im.row(r0) + c0;
  const uint8_t* p1 = im.row(r0 + 1) + c0;
  return (p0[0] * (1 - fr) * (1 - fc) + p0[1] * (1 - fr) * fc +
          p1[0] * fr * (1 - fc) + p1[1] * fr * fc);
}

inline float bil_f(const std::vector<float>& d, int h, int w, float r,
                   float c) {
  int r0 = (int)std::floor(r), c0 = (int)std::floor(c);
  float fr = r - r0, fc = c - c0;
  r0 = std::max(0, std::min(r0, h - 2));
  c0 = std::max(0, std::min(c0, w - 2));
  const float* p0 = &d[(size_t)r0 * w + c0];
  const float* p1 = &d[(size_t)(r0 + 1) * w + c0];
  return (p0[0] * (1 - fr) * (1 - fc) + p0[1] * (1 - fr) * fc +
          p1[0] * fr * (1 - fc) + p1[1] * fr * fc);
}

}  // namespace

extern "C" double pyrlk_ms(int w, int h, int nkp, int iters, int seed) {
  const int nscales = 3, winsize = 11, hws = winsize / 2, niter = 21;
  const float min_ev = 1e-4f, conv_delta = 0.1f;
  const int border = winsize;
  // random smoothed texture; frame 2 = 3px-shifted view
  uint32_t st = (uint32_t)seed * 2654435761u + 7u;
  int TH = h + 16, TW = w + 16;
  std::vector<uint8_t> tex((size_t)TH * TW);
  for (auto& t : tex) {
    st = st * 1664525u + 1013904223u;
    t = (uint8_t)(st >> 24);
  }
  std::vector<uint8_t> sm((size_t)TH * TW, 0);
  for (int r = 1; r < TH - 1; r++)
    for (int c = 1; c < TW - 1; c++) {
      int s = 0;
      for (int dr = -1; dr <= 1; dr++)
        for (int dc = -1; dc <= 1; dc++)
          s += tex[(size_t)(r + dr) * TW + c + dc];
      sm[(size_t)r * TW + c] = (uint8_t)(s / 9);
    }
  std::vector<Img> pa(nscales), pb(nscales);
  std::vector<FImg> pg(nscales);
  int hh = h, ww = w;
  for (int s = 0; s < nscales; s++) {
    pa[s].init(hh, ww, border);
    pb[s].init(hh, ww, border);
    hh = 1 + hh / 2; ww = 1 + ww / 2;
  }
  // keypoints
  std::vector<float> kr(nkp), kc(nkp);
  for (int i = 0; i < nkp; i++) {
    st = st * 1664525u + 1013904223u;
    kr[i] = 10.f + (st >> 8) % (h - 20);
    st = st * 1664525u + 1013904223u;
    kc[i] = 10.f + (st >> 8) % (w - 20);
  }
  volatile float sink = 0;
  auto run_once = [&]() {
    // pyramids + gradient pyramid rebuilt per call (the library's
    // lucas_kanade() does the same per invocation)
    for (int r = 0; r < h; r++) {
      std::memcpy(pa[0].row(r), &sm[(size_t)(r + 2) * TW + 2], w);
      std::memcpy(pb[0].row(r), &sm[(size_t)(r + 5) * TW + 5], w);
    }
    pa[0].mirror_border();
    pb[0].mirror_border();
    for (int s = 1; s < nscales; s++) {
      lowpass_subsample2(pa[s - 1], pa[s]);
      lowpass_subsample2(pb[s - 1], pb[s]);
    }
    for (int s = 0; s < nscales; s++) pg[s].scharr_of(pa[s]);
    float acc = 0;
#pragma omp parallel for reduction(+ : acc) schedule(static)
    for (int i = 0; i < nkp; i++) {
      float tr_r = 0, tr_c = 0;
      for (int s = nscales - 1; s >= 0; s--) {
        tr_r *= 2; tr_c *= 2;
        float pr = kr[i] / (1 << s), pc = kc[i] / (1 << s);
        const Img &A = pa[s], &B = pb[s];
        const FImg& G = pg[s];
        // gradient matrix over the window
        float a11 = 0, a12 = 0, a22 = 0;
        float as[winsize * winsize], grs[winsize * winsize],
            gcs[winsize * winsize];
        int k = 0;
        for (int dr = -hws; dr <= hws; dr++)
          for (int dc = -hws; dc <= hws; dc++, k++) {
            float rr = pr + dr, cc = pc + dc;
            as[k] = bil_u8(A, rr, cc);
            float gy = bil_f(G.gr, G.h, G.w, rr, cc);
            float gx = bil_f(G.gc, G.h, G.w, rr, cc);
            grs[k] = gy; gcs[k] = gx;
            a11 += gy * gy; a12 += gy * gx; a22 += gx * gx;
          }
        float cnt = (float)(winsize * winsize);
        float trg = (a11 + a22) / cnt;
        float dpp = std::sqrt(((a11 - a22) / cnt) * ((a11 - a22) / cnt) +
                              4 * (a12 / cnt) * (a12 / cnt));
        if (0.5f * (trg - dpp) < min_ev) continue;   // rejected
        float det = a11 * a22 - a12 * a12;
        if (std::fabs(det) < 1e-12f) continue;
        float i11 = a22 / det, i12 = -a12 / det, i22 = a11 / det;
        float vr = pr + tr_r, vc = pc + tr_c;
        for (int it = 0; it < niter; it++) {
          float b1 = 0, b2 = 0;
          k = 0;
          for (int dr = -hws; dr <= hws; dr++)
            for (int dc = -hws; dc <= hws; dc++, k++) {
              float dt = as[k] - bil_u8(B, vr + dr, vc + dc);
              b1 += grs[k] * dt;
              b2 += gcs[k] * dt;
            }
          float n1 = i11 * b1 + i12 * b2, n2 = i12 * b1 + i22 * b2;
          vr += n1; vc += n2;
          if (n1 * n1 + n2 * n2 < conv_delta * conv_delta) break;
        }
        tr_r = vr - pr; tr_c = vc - pc;
      }
      acc += tr_r + tr_c;
    }
    sink += acc;
  };
  run_once();  // warm threads/caches
  auto t0 = std::chrono::steady_clock::now();
  for (int i = 0; i < iters; i++) run_once();
  auto t1 = std::chrono::steady_clock::now();
  (void)sink;
  return std::chrono::duration<double, std::milli>(t1 - t0).count() / iters;
}

extern "C" int tracker_selfcheck(int w, int h) {
  // minimal sanity: run 6 frames, report live keypoints (>0 expected)
  (void)tracker_fps(w, h, 6, 0);
  return 1;
}

// ===========================================================================
// Scalar SLAM back-end: SE(3), PnP, triangulation, sliding-window BA.
// The reference's capability gap (structure_from_motion.hh:55-56) filled
// the classic CPU way: analytic Jacobians, landmark Schur elimination,
// dense Cholesky on the 6R x 6R reduced camera system.
// ===========================================================================

namespace {

// ---- small linear algebra (row-major double) ------------------------------

inline void mat4_mul(const double* A, const double* B, double* C) {
  double t[16];
  for (int i = 0; i < 4; i++)
    for (int j = 0; j < 4; j++) {
      double s = 0;
      for (int k = 0; k < 4; k++) s += A[i * 4 + k] * B[k * 4 + j];
      t[i * 4 + j] = s;
    }
  std::memcpy(C, t, sizeof t);
}

// Cholesky solve A x = b in place (A n x n SPD, destroyed). Returns false
// if not positive definite.
bool chol_solve(double* A, double* b, int n) {
  for (int i = 0; i < n; i++) {
    for (int j = 0; j <= i; j++) {
      double s = A[i * n + j];
      for (int k = 0; k < j; k++) s -= A[i * n + k] * A[j * n + k];
      if (i == j) {
        if (s <= 1e-12) return false;
        A[i * n + i] = std::sqrt(s);
      } else {
        A[i * n + j] = s / A[j * n + j];
      }
    }
  }
  for (int i = 0; i < n; i++) {           // L y = b
    double s = b[i];
    for (int k = 0; k < i; k++) s -= A[i * n + k] * b[k];
    b[i] = s / A[i * n + i];
  }
  for (int i = n - 1; i >= 0; i--) {      // L^T x = y
    double s = b[i];
    for (int k = i + 1; k < n; k++) s -= A[k * n + i] * b[k];
    b[i] = s / A[i * n + i];
  }
  return true;
}

// se3 exp with twist xi = [t(3); w(3)], left-multiplied: T_new = exp(xi)*T
void se3_exp_mul(const double xi[6], double T[16]) {
  const double *t = xi, *w = xi + 3;
  double th2 = w[0] * w[0] + w[1] * w[1] + w[2] * w[2];
  double th = std::sqrt(th2);
  double Wx[9] = {0, -w[2], w[1], w[2], 0, -w[0], -w[1], w[0], 0};
  double A, B, C;                                 // Rodrigues coefficients
  if (th < 1e-8) { A = 1.0; B = 0.5; C = 1.0 / 6.0; }
  else {
    A = std::sin(th) / th;
    B = (1 - std::cos(th)) / th2;
    C = (1 - A) / th2;
  }
  double Wx2[9];
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++) {
      double s = 0;
      for (int k = 0; k < 3; k++) s += Wx[i * 3 + k] * Wx[k * 3 + j];
      Wx2[i * 3 + j] = s;
    }
  double E[16] = {1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1};
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++)
      E[i * 4 + j] += A * Wx[i * 3 + j] + B * Wx2[i * 3 + j];
  // translation: V t with V = I + B Wx + C Wx^2
  for (int i = 0; i < 3; i++) {
    double s = t[i];
    for (int j = 0; j < 3; j++)
      s += (B * Wx[i * 3 + j] + C * Wx2[i * 3 + j]) * t[j];
    E[i * 4 + 3] = s;
  }
  mat4_mul(E, T, T);
}

struct V3 { double x[3]; };
struct Obs { int kf; double u, v; };              // u = col, v = row

// residual (r_row, r_col) and Jacobians of the projection of world X by
// camera-from-world T: Jp (2x6) wrt the left-multiplied twist [t; w],
// Jl (2x3) wrt X. Returns false when behind the camera.
bool proj_residual(const double T[16], const double X[3], double fx,
                   double fy, double cx, double cy, double u_obs,
                   double v_obs, double r[2], double Jp[12], double Jl[6]) {
  double pc[3];
  for (int i = 0; i < 3; i++)
    pc[i] = T[i * 4 + 0] * X[0] + T[i * 4 + 1] * X[1] +
            T[i * 4 + 2] * X[2] + T[i * 4 + 3];
  double z = pc[2];
  if (z < 1e-6) z = 1e-6;
  double iz = 1.0 / z, iz2 = iz * iz;
  double u = fx * pc[0] * iz + cx;
  double v = fy * pc[1] * iz + cy;
  r[0] = v - v_obs;                               // row residual first
  r[1] = u - u_obs;
  if (Jp) {
    // d pc / d[t; w] = [ I | -[pc]_x ]
    double dpc[3][6] = {
        {1, 0, 0, 0, pc[2], -pc[1]},
        {0, 1, 0, -pc[2], 0, pc[0]},
        {0, 0, 1, pc[1], -pc[0], 0}};
    // du/dpc, dv/dpc
    double du[3] = {fx * iz, 0, -fx * pc[0] * iz2};
    double dv[3] = {0, fy * iz, -fy * pc[1] * iz2};
    for (int j = 0; j < 6; j++) {
      double sv = 0, su = 0;
      for (int k = 0; k < 3; k++) {
        sv += dv[k] * dpc[k][j];
        su += du[k] * dpc[k][j];
      }
      Jp[0 * 6 + j] = sv;                         // row block
      Jp[1 * 6 + j] = su;
    }
    if (Jl) {
      // d pc / dX = R
      for (int j = 0; j < 3; j++) {
        double sv = 0, su = 0;
        for (int k = 0; k < 3; k++) {
          sv += dv[k] * T[k * 4 + j];
          su += du[k] * T[k * 4 + j];
        }
        Jl[0 * 3 + j] = sv;
        Jl[1 * 3 + j] = su;
      }
    }
  }
  return pc[2] > 1e-6;
}

// Gauss-Newton PnP with Huber weights (mirrors pipeline.pnp_gn: fixed
// iteration count, damped 6x6 solve, pose keeps prior when starved).
void pnp_gn_c(double T[16], const std::vector<V3>& X,
              const std::vector<Obs>& uv, double fx, double fy, double cx,
              double cy, int iters, double huber, double lam) {
  for (int it = 0; it < iters; it++) {
    double H[36] = {0}, b[6] = {0};
    for (size_t i = 0; i < X.size(); i++) {
      double r[2], Jp[12];
      proj_residual(T, X[i].x, fx, fy, cx, cy, uv[i].u, uv[i].v, r, Jp,
                    nullptr);
      double nrm = std::sqrt(r[0] * r[0] + r[1] * r[1]);
      double w = nrm <= huber ? 1.0 : huber / std::max(nrm, 1e-12);
      for (int a = 0; a < 6; a++) {
        for (int c = 0; c < 6; c++)
          H[a * 6 + c] += w * (Jp[a] * Jp[c] + Jp[6 + a] * Jp[6 + c]);
        b[a] -= w * (Jp[a] * r[0] + Jp[6 + a] * r[1]);
      }
    }
    for (int a = 0; a < 6; a++) H[a * 6 + a] += lam;
    if (!chol_solve(H, b, 6)) break;
    se3_exp_mul(b, T);
  }
}

// 2-view DLT triangulation (x = col, y = row conventions of
// geometry._triangulate_one): P = K [R | t], rows of A from
// u*(P row3) - (P row1) etc., solved by 3x3 normal equations.
bool triangulate2(const double T1[16], const double T2[16], double fx,
                  double fy, double cx, double cy, double u1, double v1,
                  double u2, double v2, double X[3]) {
  double P[2][12];
  const double* Ts[2] = {T1, T2};
  for (int n = 0; n < 2; n++) {
    const double* T = Ts[n];
    for (int j = 0; j < 4; j++) {
      P[n][0 * 4 + j] = fx * T[0 * 4 + j] + cx * T[2 * 4 + j];
      P[n][1 * 4 + j] = fy * T[1 * 4 + j] + cy * T[2 * 4 + j];
      P[n][2 * 4 + j] = T[2 * 4 + j];
    }
  }
  double uvs[2][2] = {{u1, v1}, {u2, v2}};
  double A[4][4];
  for (int n = 0; n < 2; n++) {
    for (int j = 0; j < 4; j++) {
      A[2 * n + 0][j] = uvs[n][0] * P[n][2 * 4 + j] - P[n][0 * 4 + j];
      A[2 * n + 1][j] = uvs[n][1] * P[n][2 * 4 + j] - P[n][1 * 4 + j];
    }
  }
  // normal equations on the inhomogeneous form A[:, :3] X = -A[:, 3]
  double N[9] = {0}, b[3] = {0};
  for (int e = 0; e < 4; e++) {
    for (int i = 0; i < 3; i++) {
      for (int j = 0; j < 3; j++) N[i * 3 + j] += A[e][i] * A[e][j];
      b[i] -= A[e][i] * A[e][3];
    }
  }
  for (int i = 0; i < 3; i++) N[i * 3 + i] += 1e-9;
  if (!chol_solve(N, b, 3)) return false;
  X[0] = b[0]; X[1] = b[1]; X[2] = b[2];
  return true;
}

struct Track {
  std::vector<Obs> obs;                 // ring-window observations
  double X[3] = {0, 0, 0};
  bool has_lm = false;
};

// Sliding-window LM BA with landmark Schur elimination (mirrors
// ba.ba_solve_tracks: Huber IRLS, damped Hll, 6R x 6R reduced system,
// fixed gauge poses, accept/reject with lam *0.3 / *4).
void window_ba(std::vector<double*>& poses,                  // R pose ptrs
               const std::vector<char>& fixed,               // R
               std::vector<Track*>& lms,                     // landmarks
               const std::vector<std::vector<Obs>*>& lm_obs, // window obs
               double fx, double fy, double cx, double cy, int iters,
               double huber, double lam0) {
  const int R = (int)poses.size();
  const int n6 = 6 * R;
  double lam = lam0;

  auto total_cost = [&](const std::vector<std::array<double, 16>>& ps,
                        const std::vector<std::array<double, 3>>& xs) {
    double cost = 0;
    for (size_t l = 0; l < lms.size(); l++)
      for (const Obs& o : *lm_obs[l]) {
        double r[2];
        proj_residual(ps[o.kf].data(), xs[l].data(), fx, fy, cx, cy, o.u,
                      o.v, r, nullptr, nullptr);
        double nrm = std::sqrt(r[0] * r[0] + r[1] * r[1]);
        double w = nrm <= huber ? 1.0 : huber / std::max(nrm, 1e-12);
        cost += w * (r[0] * r[0] + r[1] * r[1]);
      }
    return cost;
  };

  std::vector<std::array<double, 16>> cur_p(R);
  std::vector<std::array<double, 3>> cur_x(lms.size());
  for (int k = 0; k < R; k++) std::memcpy(cur_p[k].data(), poses[k], 128);
  for (size_t l = 0; l < lms.size(); l++)
    std::memcpy(cur_x[l].data(), lms[l]->X, 24);
  double cost = total_cost(cur_p, cur_x);

  std::vector<double> S(n6 * n6), rhs(n6);
  for (int it = 0; it < iters; it++) {
    std::fill(S.begin(), S.end(), 0.0);
    std::fill(rhs.begin(), rhs.end(), 0.0);
    // per-landmark elimination data, kept for back-substitution
    std::vector<std::array<double, 9>> Hll_inv(lms.size());
    std::vector<std::array<double, 3>> bl(lms.size());
    std::vector<std::vector<std::array<double, 18>>> Us(lms.size());
    for (size_t l = 0; l < lms.size(); l++) {
      const auto& obs = *lm_obs[l];
      double Hll[9] = {0}, blv[3] = {0};
      auto& Ul = Us[l];
      Ul.resize(obs.size());
      std::vector<std::array<double, 12>> Jps(obs.size());
      std::vector<std::array<double, 2>> rs(obs.size());
      std::vector<double> ws(obs.size());
      for (size_t i = 0; i < obs.size(); i++) {
        const Obs& o = obs[i];
        double r[2], Jp[12], Jl[6];
        proj_residual(cur_p[o.kf].data(), cur_x[l].data(), fx, fy, cx, cy,
                      o.u, o.v, r, Jp, Jl);
        double nrm = std::sqrt(r[0] * r[0] + r[1] * r[1]);
        double w = nrm <= huber ? 1.0 : huber / std::max(nrm, 1e-12);
        ws[i] = w;
        std::memcpy(Jps[i].data(), Jp, sizeof Jp);
        rs[i][0] = r[0]; rs[i][1] = r[1];
        for (int a = 0; a < 3; a++) {
          for (int c = 0; c < 3; c++)
            Hll[a * 3 + c] += w * (Jl[a] * Jl[c] + Jl[3 + a] * Jl[3 + c]);
          blv[a] -= w * (Jl[a] * r[0] + Jl[3 + a] * r[1]);
        }
        // U = Jp^T W Jl  (6x3)
        for (int a = 0; a < 6; a++)
          for (int c = 0; c < 3; c++)
            Ul[i][a * 3 + c] =
                w * (Jp[a] * Jl[c] + Jp[6 + a] * Jl[3 + c]);
        // pose diagonal block + rhs
        double* Sp = &S[(size_t)(6 * o.kf) * n6 + 6 * o.kf];
        for (int a = 0; a < 6; a++) {
          for (int c = 0; c < 6; c++)
            Sp[a * n6 + c] +=
                w * (Jp[a] * Jp[c] + Jp[6 + a] * Jp[6 + c]);
          rhs[6 * o.kf + a] -= w * (Jp[a] * r[0] + Jp[6 + a] * r[1]);
        }
      }
      double Hd[9];
      std::memcpy(Hd, Hll, sizeof Hll);
      for (int a = 0; a < 3; a++) Hd[a * 3 + a] += lam + 1e-6;
      // invert 3x3 via Cholesky on unit vectors
      double inv[9];
      for (int col = 0; col < 3; col++) {
        double Acp[9];
        std::memcpy(Acp, Hd, sizeof Hd);
        double e[3] = {0, 0, 0};
        e[col] = 1;
        if (!chol_solve(Acp, e, 3)) { e[0] = e[1] = e[2] = 0; }
        for (int a = 0; a < 3; a++) inv[a * 3 + col] = e[a];
      }
      std::memcpy(Hll_inv[l].data(), inv, sizeof inv);
      std::memcpy(bl[l].data(), blv, sizeof blv);
      // Schur: S[pi][pj] -= U_i Hll^-1 U_j^T ; rhs -= U Hll^-1 bl
      for (size_t i = 0; i < obs.size(); i++) {
        double Wi[18];                              // U_i Hll^-1 (6x3)
        for (int a = 0; a < 6; a++)
          for (int c = 0; c < 3; c++) {
            double s = 0;
            for (int k = 0; k < 3; k++)
              s += Ul[i][a * 3 + k] * inv[k * 3 + c];
            Wi[a * 3 + c] = s;
          }
        for (int a = 0; a < 6; a++) {
          double s = 0;
          for (int k = 0; k < 3; k++) s += Wi[a * 3 + k] * blv[k];
          rhs[6 * obs[i].kf + a] -= s;
        }
        for (size_t j = 0; j < obs.size(); j++) {
          double* Sp =
              &S[(size_t)(6 * obs[i].kf) * n6 + 6 * obs[j].kf];
          for (int a = 0; a < 6; a++)
            for (int c = 0; c < 6; c++) {
              double s = 0;
              for (int k = 0; k < 3; k++)
                s += Wi[a * 3 + k] * Ul[j][c * 3 + k];
              Sp[a * n6 + c] -= s;
            }
        }
      }
    }
    // damping + gauge
    for (int a = 0; a < n6; a++) S[(size_t)a * n6 + a] += lam;
    for (int k = 0; k < R; k++)
      if (fixed[k])
        for (int a = 0; a < 6; a++) {
          int i = 6 * k + a;
          for (int j = 0; j < n6; j++) {
            S[(size_t)i * n6 + j] = 0;
            S[(size_t)j * n6 + i] = 0;
          }
          S[(size_t)i * n6 + i] = 1;
          rhs[i] = 0;
        }
    std::vector<double> dp(rhs);
    std::vector<double> Sc(S);
    if (!chol_solve(Sc.data(), dp.data(), n6)) { lam *= 4; continue; }
    // candidate state
    auto cand_p = cur_p;
    auto cand_x = cur_x;
    for (int k = 0; k < R; k++)
      if (!fixed[k]) se3_exp_mul(&dp[6 * k], cand_p[k].data());
    for (size_t l = 0; l < lms.size(); l++) {
      const auto& obs = *lm_obs[l];
      double t[3] = {bl[l][0], bl[l][1], bl[l][2]};
      for (size_t i = 0; i < obs.size(); i++)
        for (int k = 0; k < 3; k++)
          for (int a = 0; a < 6; a++)
            t[k] -= Us[l][i][a * 3 + k] * dp[6 * obs[i].kf + a];
      for (int a = 0; a < 3; a++) {
        double s = 0;
        for (int k = 0; k < 3; k++) s += Hll_inv[l][a * 3 + k] * t[k];
        cand_x[l][a] = cur_x[l][a] + s;
      }
    }
    double new_cost = total_cost(cand_p, cand_x);
    if (new_cost < cost) {
      cur_p = cand_p;
      cur_x = cand_x;
      cost = new_cost;
      lam = std::max(lam * 0.3, 1e-8);
    } else {
      lam = std::min(lam * 4.0, 1e4);
    }
  }
  for (int k = 0; k < R; k++) std::memcpy(poses[k], cur_p[k].data(), 128);
  for (size_t l = 0; l < lms.size(); l++)
    std::memcpy(lms[l]->X, cur_x[l].data(), 24);
}

}  // namespace

// Full scalar SLAM engine over caller-provided frames: per frame the
// tracker (identical hot path to tracker_fps), every kf_period frames the
// back-end (PnP pose -> DLT triangulation -> sliding-window Schur BA ->
// reprojection outlier pruning). Mirrors vpp_tpu/slam/pipeline.py's
// keyframe work at the same iteration counts so the TPU/CPU comparison is
// workload-matched. ``frames``: nframes x h x w float32 (converted to
// uint8 once, untimed — ingest). ``boot``: 2 x 16 doubles, camera-from-
// world poses of keyframes 0 and 1 (gauge + monocular scale, same
// bootstrap contract as slam_init). ``gt``: nframes x 16 ground-truth
// poses for the ATE diagnostic (may be null). out[0..4] = {ate, n_live,
// n_landmarks, n_keyframes, mean window reproj err at the end}.
extern "C" double slam_fps(const float* frames, int nframes, int h, int w,
                           double fx, double fy, double cx, double cy,
                           const double* boot, int kf_period, int ring,
                           int ba_iters, int pnp_iters, int spacing,
                           int detector_th, int detector_period,
                           double min_parallax, double max_reproj,
                           double prune_reproj,
                           const double* gt, double* out) {
  TrackCfg P;
  P.spacing = spacing;
  P.th = detector_th;
  P.period = detector_period;
  const int border = 2 * P.winsize;
  const double huber = 4.0, lam0 = 1e-4;

  // untimed ingest: float -> uint8 frames
  std::vector<std::vector<uint8_t>> gray(nframes);
  for (int t = 0; t < nframes; t++) {
    gray[t].resize((size_t)h * w);
    const float* src = frames + (size_t)t * h * w;
    for (size_t i = 0; i < (size_t)h * w; i++) {
      float v = src[i];
      gray[t][i] = (uint8_t)(v < 0 ? 0 : (v > 255 ? 255 : v + 0.5f));
    }
  }

  std::vector<Img> pyr1(P.nscales), pyr2(P.nscales);
  int hh = h, ww = w;
  for (int s = 0; s < P.nscales; s++) {
    pyr1[s].init(hh, ww, border);
    pyr2[s].init(hh, ww, border);
    hh = 1 + hh / 2; ww = 1 + ww / 2;
  }
  auto load_frame = [&](std::vector<Img>& pyr, int t) {
    for (int r = 0; r < h; r++)
      std::memcpy(pyr[0].row(r), &gray[t][(size_t)r * w], w);
    pyr[0].mirror_border();
    for (int s = 1; s < P.nscales; s++) lowpass_subsample2(pyr[s - 1], pyr[s]);
  };

  std::vector<KP> kps;
  int next_id = 0;
  std::unordered_map<int, Track> tracks;
  std::vector<std::array<double, 16>> kf_pose;      // all keyframes
  std::vector<int> kf_frame;
  int oldest_obs_kf = 0;                            // ring window start

  load_frame(pyr1, 0);
  auto t0c = std::chrono::steady_clock::now();
  for (int t = 1; t < nframes; t++) {
    load_frame(pyr2, t);
    tracker_step(pyr1, pyr2, kps, P, t, h, w, next_id);
    std::swap(pyr1, pyr2);

    if (t % kf_period != 0) continue;
    // ---- keyframe work ---------------------------------------------------
    int k = (int)kf_pose.size();                    // new keyframe index
    oldest_obs_kf = std::max(0, k - ring + 1);

    // 1. record observations for live tracks (integer obs like the TPU
    //    engine's subpix_refine=False path)
    std::vector<int> live_ids;
    live_ids.reserve(kps.size());
    for (auto& kp : kps)
      if (kp.age > 0) {
        Track& tr = tracks[kp.id];
        tr.obs.push_back({k, (double)kp.c, (double)kp.r});
        while (!tr.obs.empty() && tr.obs.front().kf < oldest_obs_kf)
          tr.obs.erase(tr.obs.begin());
        live_ids.push_back(kp.id);
      }
    // drop dead tracks (id no longer among live kps)
    {
      std::vector<int> dead;
      for (auto& kv : tracks) {
        bool alive = false;
        for (int id : live_ids) if (id == kv.first) { alive = true; break; }
        if (!alive) dead.push_back(kv.first);
      }
      for (int id : dead) tracks.erase(id);
    }

    // 2. pose: bootstrap for the first two keyframes, else GN PnP on
    //    current landmarks
    std::array<double, 16> T_new;
    if (k < 2) {
      std::memcpy(T_new.data(), boot + 16 * k, 128);
    } else {
      std::memcpy(T_new.data(), kf_pose.back().data(), 128);
      std::vector<V3> X;
      std::vector<Obs> uv;
      for (int id : live_ids) {
        Track& tr = tracks[id];
        if (!tr.has_lm || tr.obs.empty()) continue;
        const Obs& o = tr.obs.back();
        if (o.kf != k) continue;
        X.push_back({{tr.X[0], tr.X[1], tr.X[2]}});
        uv.push_back(o);
      }
      if (X.size() >= 6)
        pnp_gn_c(T_new.data(), X, uv, fx, fy, cx, cy, pnp_iters, huber,
                 lam0);
    }
    kf_pose.push_back(T_new);
    kf_frame.push_back(t);

    // 3. triangulate new landmarks (oldest + newest window obs, parallax
    //    + depth + reprojection gates — pipeline._do_keyframe)
    for (int id : live_ids) {
      Track& tr = tracks[id];
      if (tr.has_lm || tr.obs.size() < 2) continue;
      const Obs &o0 = tr.obs.front(), &o1 = tr.obs.back();
      if (o1.kf != k || o0.kf == k) continue;
      double du = o1.u - o0.u, dv = o1.v - o0.v;
      if (std::sqrt(du * du + dv * dv) < min_parallax) continue;
      double X[3];
      if (!triangulate2(kf_pose[o0.kf].data(), T_new.data(), fx, fy, cx,
                        cy, o0.u, o0.v, o1.u, o1.v, X))
        continue;
      bool ok = true;
      for (const Obs* o : {&o0, &o1}) {
        double r[2];
        if (!proj_residual(kf_pose[o->kf].data(), X, fx, fy, cx, cy, o->u,
                           o->v, r, nullptr, nullptr)) { ok = false; break; }
        if (r[0] * r[0] + r[1] * r[1] > max_reproj * max_reproj) {
          ok = false; break;
        }
      }
      if (!ok) continue;
      std::memcpy(tr.X, X, sizeof X);
      tr.has_lm = true;
    }

    // 4. sliding-window BA (fix the two oldest window poses)
    {
      int r0 = oldest_obs_kf, R = k - r0 + 1;
      std::vector<double*> poses(R);
      std::vector<char> fixed(R, 0);
      for (int i = 0; i < R; i++) poses[i] = kf_pose[r0 + i].data();
      fixed[0] = 1;
      if (R > 1) fixed[1] = 1;
      std::vector<Track*> lms;
      std::vector<std::vector<Obs>> window_obs;
      for (auto& kv : tracks) {
        Track& tr = kv.second;
        if (!tr.has_lm) continue;
        std::vector<Obs> wobs;
        for (const Obs& o : tr.obs)
          if (o.kf >= r0) wobs.push_back({o.kf - r0, o.u, o.v});
        if (wobs.empty()) continue;
        lms.push_back(&tr);
        window_obs.push_back(std::move(wobs));
      }
      std::vector<std::vector<Obs>*> obs_ptr(window_obs.size());
      size_t nobs = 0;
      for (size_t i = 0; i < window_obs.size(); i++) {
        obs_ptr[i] = &window_obs[i];
        nobs += window_obs[i].size();
      }
      if (nobs >= 12)
        window_ba(poses, fixed, lms, obs_ptr, fx, fy, cx, cy, ba_iters,
                  huber, lam0);
      // 5. post-BA reprojection pruning (pipeline prune_reproj)
      for (size_t i = 0; i < lms.size(); i++) {
        Track& tr = *lms[i];
        for (auto it = tr.obs.begin(); it != tr.obs.end();) {
          double r[2];
          proj_residual(kf_pose[it->kf].data(), tr.X, fx, fy, cx, cy,
                        it->u, it->v, r, nullptr, nullptr);
          if (r[0] * r[0] + r[1] * r[1] > prune_reproj * prune_reproj)
            it = tr.obs.erase(it);
          else
            ++it;
        }
      }
    }
  }
  auto t1c = std::chrono::steady_clock::now();
  double secs = std::chrono::duration<double>(t1c - t0c).count();

  if (out) {
    int nlive = 0;
    for (auto& kp : kps) if (kp.age > 0) nlive++;
    int nlm = 0;
    double reproj = 0;
    int nrep = 0;
    for (auto& kv : tracks)
      if (kv.second.has_lm) {
        nlm++;
        for (const Obs& o : kv.second.obs) {
          double r[2];
          proj_residual(kf_pose[o.kf].data(), kv.second.X, fx, fy, cx, cy,
                        o.u, o.v, r, nullptr, nullptr);
          reproj += std::sqrt(r[0] * r[0] + r[1] * r[1]);
          nrep++;
        }
      }
    double ate = -1;
    if (gt) {
      double se = 0;
      for (size_t i = 0; i < kf_pose.size(); i++) {
        const double* Te = kf_pose[i].data();
        const double* Tg = gt + (size_t)16 * kf_frame[i];
        // camera centre c = -R^T t
        double ce[3], cg[3];
        for (int a = 0; a < 3; a++) {
          ce[a] = -(Te[0 * 4 + a] * Te[0 * 4 + 3] +
                    Te[1 * 4 + a] * Te[1 * 4 + 3] +
                    Te[2 * 4 + a] * Te[2 * 4 + 3]);
          cg[a] = -(Tg[0 * 4 + a] * Tg[0 * 4 + 3] +
                    Tg[1 * 4 + a] * Tg[1 * 4 + 3] +
                    Tg[2 * 4 + a] * Tg[2 * 4 + 3]);
        }
        for (int a = 0; a < 3; a++) se += (ce[a] - cg[a]) * (ce[a] - cg[a]);
      }
      ate = kf_pose.empty() ? 0 : std::sqrt(se / kf_pose.size());
    }
    out[0] = ate;
    out[1] = nlive;
    out[2] = nlm;
    out[3] = (double)kf_pose.size();
    out[4] = nrep ? reproj / nrep : -1;
  }
  return (nframes - 1) / secs;
}

// CPU reference baseline for bench.py — a from-scratch C++/OpenMP
// implementation of the video-extruder pipeline capability (pyramid +
// FAST9 blockwise detection + semi-dense SAD flow + particle lifecycle),
// algorithmically equivalent to matt-42/vpp's tracker hot path
// (vpp/algorithms/video_extruder/video_extruder.hpp) and built the way the
// reference builds (-O3 -march=native -fopenmp, auto-vectorised row loops).
// It measures "reference CPU frames/s" on this machine so the TPU numbers
// have an honest denominator. Not a copy: independent scalar code.
//
// Build:  g++ -O3 -march=native -fopenmp -shared -fPIC -o libvppcpu.so cpu_baseline.cpp
// Entry:  extern "C" double tracker_fps(int w, int h, int frames, int seed);

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <vector>
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

inline int sad(const Img& a, const Img& b, int ar, int ac, int br, int bc,
               int ws, int cap) {
  int half = ws / 2, err = 0;
  for (int r = 0; r < ws && err <= cap; r++) {
    const uint8_t* pa = a.row(ar - half + r) + ac - half;
    const uint8_t* pb = b.row(br - half + r) + bc - half;
    int e = 0;
    for (int c = 0; c < ws; c++) e += std::abs((int)pa[c] - (int)pb[c]);
    err += e;
  }
  return err;
}

struct KP { float r, c; int age; };

}  // namespace

extern "C" double tracker_fps(int w, int h, int nframes, int seed) {
  const int nscales = 3, winsize = 9, patch = 5, spacing = 10, th = 10,
            period = 5, prop_iters = 2, border = 2 * winsize;
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

  std::vector<Img> pyr1(nscales), pyr2(nscales);
  int hh = h, ww = w;
  for (int s = 0; s < nscales; s++) {
    pyr1[s].init(hh, ww, border);
    pyr2[s].init(hh, ww, border);
    hh = 1 + hh / 2; ww = 1 + ww / 2;
  }
  std::vector<KP> kps;
  auto load_frame = [&](std::vector<Img>& pyr, int t) {
    for (int r = 0; r < h; r++)
      std::memcpy(pyr[0].row(r), &tex[(size_t)(r + t) * TW + t], w);
    pyr[0].mirror_border();
    for (int s = 1; s < nscales; s++) lowpass_subsample2(pyr[s - 1], pyr[s]);
  };

  load_frame(pyr1, 0);
  auto t0 = std::chrono::steady_clock::now();
  for (int t = 1; t <= nframes; t++) {
    load_frame(pyr2, std::min(t, nframes));
    // --- semi-dense flow on patch grid, coarse to fine
    int gh = std::max(h / patch, 1), gw = std::max(w / patch, 1);
    std::vector<int> flow_r(gh * gw), flow_c(gh * gw), dist(gh * gw);
    std::vector<uint8_t> mark(gh * gw);
    std::vector<int> pflow_r, pflow_c; std::vector<uint8_t> pmark;
    int pgh = 0, pgw = 0;
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
        int d = sad(a, b, pr, pc, mr, mc, winsize, 1 << 30);
        for (int it = 0; it < 5; it++) {
          int br = mr, bc = mc, bd = d;
          for (int dr = -1; dr <= 1; dr++)
            for (int dc = -1; dc <= 1; dc++) {
              if (!dr && !dc) continue;
              int nr = mr + dr, nc = mc + dc;
              if (nr < 0 || nr >= a.h || nc < 0 || nc >= a.w) continue;
              int nd = sad(a, b, pr, pc, nr, nc, winsize, bd);
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
              int d2 = sad(a, b, pr, pc, tr, tc, winsize, fd[cell]);
              if (d2 < fd[cell]) { fd[cell] = d2; fr[cell] = fr[n]; fc[cell] = fc[n]; }
            }
        }
      }
      pflow_r.swap(fr); pflow_c.swap(fc); pmark.swap(fm);
      pgh = lgh; pgw = lgw;
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
            if (bestr >= 0) local.push_back({(float)bestr, (float)bestc, 1});
          }
        }
#pragma omp critical
        fresh.insert(fresh.end(), local.begin(), local.end());
      }
      // compact + spawn
      std::vector<KP> keep;
      keep.reserve(kps.size() + fresh.size());
      for (auto& kp : kps) if (kp.age > 0) keep.push_back(kp);
      for (auto& kp : fresh) keep.push_back(kp);
      kps.swap(keep);
    }
    std::swap(pyr1, pyr2);
  }
  auto t1 = std::chrono::steady_clock::now();
  double secs = std::chrono::duration<double>(t1 - t0).count();
  return nframes / secs;
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

extern "C" int tracker_selfcheck(int w, int h) {
  // minimal sanity: run 6 frames, report live keypoints (>0 expected)
  (void)tracker_fps(w, h, 6, 0);
  return 1;
}

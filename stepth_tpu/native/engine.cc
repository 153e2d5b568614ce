// Native host engine: the reference pipeline's hot loops in C++.
//
// The reference implements its whole pipeline natively (Rust + rayon,
// reference src/depth_image.rs:91-136, src/helpers.rs:9-54); this module is the
// framework's host-side native equivalent: disage-style subdivision
// (docs/SEMANTICS.md §2) and the exact expanding ring search (§3, quirks
// Q1/Q2/Q8) with a std::thread pool playing rayon's role. It serves as
//   * the fast CPU engine / baseline the TPU numbers are compared against
//     (BASELINE.md: "Rust CPU baseline" stand-in), and
//   * an independent implementation the NumPy oracle is cross-checked with.
//
// Exported C ABI (ctypes-friendly):
//   stepth_native_version() -> int
//   stepth_raw_disparity(...) -> 0 on success; fills out_raw[h*w] with the
//     per-pixel matched distance wrapped to u8 (quirk Q2), BEFORE
//     max-normalization and Gaussian resize (both applied by the Python
//     caller so the exact Q15 resampler is shared with the JAX path).

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Level {
  std::vector<int64_t> rb, cb;     // row/col boundaries (with terminal)
  std::vector<int32_t> row_id, col_id;  // per-pixel block ids
};

// Distinct level-k boundaries of [0, n): unique floor(i*n/2^k), i=0..2^k.
static std::vector<int64_t> axis_boundaries(int64_t n, int k) {
  std::vector<int64_t> out;
  if (k >= 21 || (int64_t(1) << k) >= n) {
    out.reserve(n + 1);
    for (int64_t v = 0; v <= n; ++v) out.push_back(v);
    return out;
  }
  const int64_t m = int64_t(1) << k;
  out.reserve(m + 1);
  int64_t prev = -1;
  for (int64_t i = 0; i <= m; ++i) {
    int64_t b = (i * n) >> k;  // floor(i*n/2^k)
    if (b != prev) { out.push_back(b); prev = b; }
  }
  return out;
}

static void fill_ids(const std::vector<int64_t>& b, std::vector<int32_t>* ids,
                     int64_t n) {
  ids->assign(n, 0);
  for (size_t blk = 0; blk + 1 < b.size(); ++blk)
    for (int64_t p = b[blk]; p < b[blk + 1]; ++p) (*ids)[p] = int32_t(blk);
}

static Level level_geometry(int h, int w, int d, bool width_first) {
  int kr = width_first ? d / 2 : (d + 1) / 2;
  int kc = width_first ? (d + 1) / 2 : d / 2;
  Level lv;
  lv.rb = axis_boundaries(h, kr);
  lv.cb = axis_boundaries(w, kc);
  fill_ids(lv.rb, &lv.row_id, h);
  fill_ids(lv.cb, &lv.col_id, w);
  return lv;
}

struct Block {
  int32_t value[3];
  int32_t seed_x, seed_y;
  int32_t x0, y0, bw, bh;
};

// Exact ring search: scan order row y+r, row y−r, col x+r, col x−r, each
// ascending (quirk Q8; reference src/helpers.rs:26-48). Returns trunc(sqrt(d²))
// or 0 on exhaustion (src/depth_image.rs:120).
static uint32_t ring_search(const uint8_t* add, int ah, int aw,
                            const int32_t value[3], const int32_t prec[3],
                            int x, int y, int max_radius) {
  auto match = [&](int py, int px) -> bool {
    const uint8_t* p = add + (int64_t(py) * aw + px) * 3;
    for (int c = 0; c < 3; ++c) {
      int32_t diff = int32_t(p[c]) - value[c];
      if (diff < 0) diff = -diff;
      if (diff >= prec[c]) return false;
    }
    return true;
  };
  auto dist = [&](int py, int px) -> uint32_t {
    int64_t dx = x - px, dy = y - py;
    return uint32_t(std::sqrt(double(dx * dx + dy * dy)));
  };
  for (int r = 0; r < max_radius; ++r) {
    bool any_inb = false;
    // row y+r then row y−r, x−r..x+r
    for (int pass = 0; pass < 2; ++pass) {
      int py = pass == 0 ? y + r : y - r;
      if (py < 0 || py >= ah) continue;
      for (int px = x - r; px <= x + r; ++px) {
        if (px < 0 || px >= aw) continue;
        any_inb = true;
        if (match(py, px)) return dist(py, px);
      }
    }
    // col x+r then col x−r, y−r..y+r
    for (int pass = 0; pass < 2; ++pass) {
      int px = pass == 0 ? x + r : x - r;
      if (px < 0 || px >= aw) continue;
      for (int py = y - r; py <= y + r; ++py) {
        if (py < 0 || py >= ah) continue;
        any_inb = true;
        if (match(py, px)) return dist(py, px);
      }
    }
    if (!any_inb) break;  // whole ring out of bounds (src/helpers.rs:49-51)
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Multithreaded hierarchical matcher — the honest CPU baseline for bench.py.
//
// Same pipeline the TPU headline measures (coarse dense SAD + per-level
// refinement around the upsampled prior, box-window aggregation, WTA), written
// the way a performance-minded CPU implementation would be: sliding-window box
// sums (O(1) per pixel), per-disparity cost planes that never materialize the
// full volume, and a std::thread row-band pool in rayon's role (the reference
// fans out 8 ways, src/depth_image.rs:111-123).
// ---------------------------------------------------------------------------

// Run fn(t) on n_threads threads (fn receives the thread index).
template <typename F>
static void run_threads(int n_threads, F fn) {
  std::vector<std::thread> pool;
  for (int t = 1; t < n_threads; ++t) pool.emplace_back(fn, t);
  fn(0);
  for (auto& th : pool) th.join();
}

// Separable box sum with zero-outside clipping (matches dense.box_aggregate):
// horizontal pass rows-parallel, vertical pass column-band-parallel.
static void box_sum_plane(const float* in, float* tmp, float* out, int h, int w,
                          int r, int n_threads) {
  run_threads(n_threads, [&](int t) {
    for (int y = t; y < h; y += n_threads) {
      const float* row = in + size_t(y) * w;
      float* orow = tmp + size_t(y) * w;
      double s = 0;
      for (int x = 0; x < r && x < w; ++x) s += row[x];
      for (int x = 0; x < w; ++x) {
        if (x + r < w) s += row[x + r];
        orow[x] = float(s);
        if (x - r >= 0) s -= row[x - r];
      }
    }
  });
  const int band = (w + n_threads - 1) / n_threads;
  run_threads(n_threads, [&](int t) {
    const int x0 = t * band, x1 = x0 + band < w ? x0 + band : w;
    if (x0 >= x1) return;
    std::vector<double> s(x1 - x0, 0.0);
    for (int y = 0; y < r && y < h; ++y)
      for (int x = x0; x < x1; ++x) s[x - x0] += tmp[size_t(y) * w + x];
    for (int y = 0; y < h; ++y) {
      if (y + r < h)
        for (int x = x0; x < x1; ++x) s[x - x0] += tmp[size_t(y + r) * w + x];
      float* orow = out + size_t(y) * w;
      for (int x = x0; x < x1; ++x) orow[x] = float(s[x - x0]);
      if (y - r >= 0)
        for (int x = x0; x < x1; ++x) s[x - x0] -= tmp[size_t(y - r) * w + x];
    }
  });
}

}  // namespace

extern "C" {

int stepth_native_version() { return 1; }

// Hierarchical coarse-to-fine disparity (the bench.py pipeline) on f32 gray
// images. out_disp[h*w] receives the full-resolution disparity. 0 on success.
int stepth_hier_disparity(const float* left, const float* right, int h, int w,
                          int levels, int coarse_disp, int radius, int window,
                          int n_threads, float* out_disp) {
  if (h <= 0 || w <= 0 || levels < 1) return 1;
  if (n_threads <= 0) n_threads = 8;
  const int r = window / 2;

  // pyramid (2x2 mean pooling)
  std::vector<std::vector<float>> ls(levels), rs(levels);
  std::vector<int> hs(levels), ws(levels);
  hs[0] = h; ws[0] = w;
  ls[0].assign(left, left + size_t(h) * w);
  rs[0].assign(right, right + size_t(h) * w);
  for (int l = 1; l < levels; ++l) {
    const int ph = hs[l - 1], pw = ws[l - 1];
    hs[l] = ph / 2; ws[l] = pw / 2;
    ls[l].resize(size_t(hs[l]) * ws[l]);
    rs[l].resize(size_t(hs[l]) * ws[l]);
    for (int img = 0; img < 2; ++img) {
      const float* src = img ? rs[l - 1].data() : ls[l - 1].data();
      float* dst = img ? rs[l].data() : ls[l].data();
      run_threads(n_threads, [&](int t) {
        for (int y = t; y < hs[l]; y += n_threads)
          for (int x = 0; x < ws[l]; ++x)
            dst[size_t(y) * ws[l] + x] =
                0.25f * (src[size_t(2 * y) * pw + 2 * x] +
                         src[size_t(2 * y) * pw + 2 * x + 1] +
                         src[size_t(2 * y + 1) * pw + 2 * x] +
                         src[size_t(2 * y + 1) * pw + 2 * x + 1]);
      });
    }
  }

  // coarse dense SAD over coarse_disp shifts
  const int ch = hs[levels - 1], cw = ws[levels - 1];
  const size_t cn = size_t(ch) * cw;
  std::vector<float> cost(cn), tmp(cn), agg(cn), best(cn, 1e30f);
  std::vector<float> disp(cn);
  for (int d = 0; d < coarse_disp; ++d) {
    const float* L = ls[levels - 1].data();
    const float* R = rs[levels - 1].data();
    run_threads(n_threads, [&](int t) {
      for (int y = t; y < ch; y += n_threads)
        for (int x = 0; x < cw; ++x) {
          int xs = x - d; if (xs < 0) xs = 0;  // edge replicate
          cost[size_t(y) * cw + x] =
              std::fabs(L[size_t(y) * cw + x] - R[size_t(y) * cw + xs]);
        }
    });
    box_sum_plane(cost.data(), tmp.data(), agg.data(), ch, cw, r, n_threads);
    run_threads(n_threads, [&](int t) {
      for (size_t p = t; p < cn; p += size_t(n_threads))
        if (agg[p] < best[p]) { best[p] = agg[p]; disp[p] = float(d); }
    });
  }

  // refine levels: candidates base+o around the upsampled prior
  for (int l = levels - 2; l >= 0; --l) {
    const int lh = hs[l], lw = ws[l];
    const size_t ln = size_t(lh) * lw;
    std::vector<float> prior(ln);
    run_threads(n_threads, [&](int t) {
      for (int y = t; y < lh; y += n_threads)
        for (int x = 0; x < lw; ++x) {
          int py = y / 2; if (py >= hs[l + 1]) py = hs[l + 1] - 1;
          int px = x / 2; if (px >= ws[l + 1]) px = ws[l + 1] - 1;
          prior[size_t(y) * lw + x] = 2.0f * disp[size_t(py) * ws[l + 1] + px];
        }
    });
    cost.resize(ln); tmp.resize(ln); agg.resize(ln);
    std::vector<float> lbest(ln, 1e30f), ldisp(ln);
    const float* L = ls[l].data();
    const float* R = rs[l].data();
    for (int o = -radius; o <= radius; ++o) {
      run_threads(n_threads, [&](int t) {
        for (int y = t; y < lh; y += n_threads)
          for (int x = 0; x < lw; ++x) {
            const size_t p = size_t(y) * lw + x;
            const int s = int(std::lround(prior[p])) + o;
            const int xs = x - s;
            cost[p] = (xs < 0 || xs >= lw)
                          ? 1e6f
                          : std::fabs(L[p] - R[size_t(y) * lw + xs]);
          }
      });
      box_sum_plane(cost.data(), tmp.data(), agg.data(), lh, lw, r, n_threads);
      run_threads(n_threads, [&](int t) {
        for (size_t p = t; p < ln; p += size_t(n_threads))
          if (agg[p] < lbest[p]) {
            lbest[p] = agg[p];
            float dv = float(int(std::lround(prior[p])) + o);
            if (dv < 0.f) dv = 0.f;
            if (dv > float(lw - 1)) dv = float(lw - 1);
            ldisp[p] = dv;
          }
      });
    }
    disp.swap(ldisp);
  }

  std::memcpy(out_disp, disp.data(), size_t(h) * w * sizeof(float));
  return 0;
}

// Subdivide main_rgb, ring-search each leaf block in add_rgb, paint each leaf's
// wrapped distance across its extent. Returns 0 on success.
int stepth_raw_disparity(const uint8_t* main_rgb, const uint8_t* add_rgb,
                         int h, int w, int ah, int aw,
                         const int32_t* precision, int min_splits,
                         int max_splits, int max_radius, int n_threads,
                         uint8_t* out_raw) {
  if (h <= 0 || w <= 0 || ah <= 0 || aw <= 0) return 1;
  if (max_splits <= 0)
    max_splits = int(std::ceil(std::log2(double(int64_t(h) * w))));
  int eff_min = min_splits < max_splits ? min_splits : max_splits;
  bool width_first = w >= h;
  const int64_t npix = int64_t(h) * w;

  // ---- per-pixel leaf level (docs/SEMANTICS.md §2) -------------------------
  std::vector<int32_t> level(npix, -1);
  std::vector<Level> levels;
  levels.reserve(max_splits - eff_min + 1);
  for (int d = eff_min; d <= max_splits; ++d) {
    Level lv = level_geometry(h, w, d, width_first);
    const size_t nr = lv.rb.size() - 1, nc = lv.cb.size() - 1;
    // per-block channel min/max
    std::vector<int32_t> bmin(nr * nc * 3, 255), bmax(nr * nc * 3, 0);
    for (int y = 0; y < h; ++y) {
      const int32_t bi = lv.row_id[y];
      const uint8_t* row = main_rgb + int64_t(y) * w * 3;
      for (int x = 0; x < w; ++x) {
        const int32_t bj = lv.col_id[x];
        int32_t* mn = &bmin[(size_t(bi) * nc + bj) * 3];
        int32_t* mx = &bmax[(size_t(bi) * nc + bj) * 3];
        for (int c = 0; c < 3; ++c) {
          int32_t v = row[x * 3 + c];
          if (v < mn[c]) mn[c] = v;
          if (v > mx[c]) mx[c] = v;
        }
      }
    }
    for (int y = 0; y < h; ++y) {
      const int32_t bi = lv.row_id[y];
      for (int x = 0; x < w; ++x) {
        int64_t p = int64_t(y) * w + x;
        if (level[p] >= 0) continue;
        const int32_t bj = lv.col_id[x];
        const int32_t* mn = &bmin[(size_t(bi) * nc + bj) * 3];
        const int32_t* mx = &bmax[(size_t(bi) * nc + bj) * 3];
        bool homog = true;
        for (int c = 0; c < 3; ++c)
          if (mx[c] - mn[c] > precision[c]) { homog = false; break; }
        if (homog || d == max_splits) level[p] = d;
      }
    }
    levels.push_back(std::move(lv));
  }

  // ---- integral image for exact block means --------------------------------
  std::vector<int64_t> integ(size_t(h + 1) * (w + 1) * 3, 0);
  const size_t istride = size_t(w + 1) * 3;
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = main_rgb + int64_t(y) * w * 3;
    int64_t rsum[3] = {0, 0, 0};
    for (int x = 0; x < w; ++x) {
      for (int c = 0; c < 3; ++c) {
        rsum[c] += row[x * 3 + c];
        integ[(y + 1) * istride + (x + 1) * 3 + c] =
            integ[y * istride + (x + 1) * 3 + c] + rsum[c];
      }
    }
  }

  // ---- collect unique leaf blocks (top-left pixel owns the block) ----------
  std::vector<Block> blocks;
  std::vector<int64_t> block_of(npix, -1);  // per-pixel block index
  for (int d = eff_min; d <= max_splits; ++d) {
    const Level& lv = levels[d - eff_min];
    for (size_t bi = 0; bi + 1 < lv.rb.size(); ++bi) {
      const int64_t y0 = lv.rb[bi], y1 = lv.rb[bi + 1];
      for (size_t bj = 0; bj + 1 < lv.cb.size(); ++bj) {
        const int64_t x0 = lv.cb[bj], x1 = lv.cb[bj + 1];
        if (level[y0 * w + x0] != d) continue;
        if (block_of[y0 * w + x0] >= 0) continue;  // painted by a coarser level
        Block b;
        b.x0 = int32_t(x0); b.y0 = int32_t(y0);
        b.bw = int32_t(x1 - x0); b.bh = int32_t(y1 - y0);
        const int64_t area = int64_t(b.bw) * b.bh;
        for (int c = 0; c < 3; ++c) {
          int64_t s = integ[y1 * istride + x1 * 3 + c] -
                      integ[y0 * istride + x1 * 3 + c] -
                      integ[y1 * istride + x0 * 3 + c] +
                      integ[y0 * istride + x0 * 3 + c];
          b.value[c] = int32_t(s / area);  // floor mean (MeanBrightnessHasher)
        }
        // quirk Q1 seed (reference src/depth_image.rs:114-117)
        b.seed_x = int32_t((x0 + b.bw) / 2);
        b.seed_y = int32_t((y0 + b.bh) / 2);
        int64_t id = int64_t(blocks.size());
        blocks.push_back(b);
        for (int64_t y = y0; y < y1; ++y)
          for (int64_t x = x0; x < x1; ++x) block_of[y * w + x] = id;
      }
    }
  }

  // ---- parallel ring search over blocks (rayon par_chunks equivalent) ------
  std::vector<uint8_t> dists(blocks.size(), 0);
  if (n_threads <= 0) n_threads = 8;  // reference chunks into 8 (src/depth_image.rs:111)
  std::atomic<size_t> cursor{0};
  auto worker = [&]() {
    const size_t CHUNK = 64;
    for (;;) {
      size_t begin = cursor.fetch_add(CHUNK);
      if (begin >= blocks.size()) break;
      size_t end = begin + CHUNK < blocks.size() ? begin + CHUNK : blocks.size();
      for (size_t i = begin; i < end; ++i) {
        const Block& b = blocks[i];
        uint32_t d32 = ring_search(add_rgb, ah, aw, b.value, precision,
                                   b.seed_x, b.seed_y, max_radius);
        dists[i] = uint8_t(d32 & 0xFF);  // quirk Q2 wrap
      }
    }
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < n_threads - 1; ++t) pool.emplace_back(worker);
  worker();
  for (auto& th : pool) th.join();

  for (int64_t p = 0; p < npix; ++p) out_raw[p] = dists[size_t(block_of[p])];
  return 0;
}

}  // extern "C"

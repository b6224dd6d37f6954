// tileops — native host-side tile operations for the adipose_tpu data plane.
//
// The reference implements its host data plumbing in pure Python
// (cv2.fillPoly rasterization in multiprocessing workers, PIL crops, numpy
// bit-depth conversion — Segmentation/build_dataset.py). This library provides
// the equivalent hot host-side primitives as native code feeding the TPU input
// pipeline:
//
//   * polygon scanline rasterization (even-odd fill, cv2.fillPoly-compatible
//     for simple polygons) — the mask-build hot loop;
//   * uint16→uint8 min-max conversion — WSI chunking;
//   * strided tile extraction (gather a batch of tiles from one image buffer)
//     — the tiling hot loop;
//   * blend accumulation (weighted scatter-add of tiles into a canvas) — the
//     host-side fallback path of WSI reconstruction for canvases beyond HBM.
//
// All entry points are plain-C ABI over caller-owned buffers (ctypes-friendly,
// zero-copy against numpy arrays). OpenMP parallel where it pays.
//
// Build: see native/build.sh (g++ -O3 -march=native -fopenmp -shared -fPIC).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Rasterize one polygon (npts int32 x,y pairs) into mask (h×w uint8, value 1)
// using even-odd scanline fill. Matches cv2.fillPoly for simple polygons:
// pixel centers at integer coordinates, edges inclusive via half-open spans.
void fill_polygon(uint8_t* mask, int h, int w,
                  const int32_t* pts, int npts, uint8_t value) {
  if (npts < 3) return;
  int ymin = h, ymax = -1;
  for (int i = 0; i < npts; ++i) {
    ymin = std::min(ymin, pts[2 * i + 1]);
    ymax = std::max(ymax, pts[2 * i + 1]);
  }
  ymin = std::max(ymin, 0);
  ymax = std::min(ymax, h - 1);

  std::vector<double> xs;
  for (int y = ymin; y <= ymax; ++y) {
    xs.clear();
    for (int i = 0; i < npts; ++i) {
      int j = (i + 1) % npts;
      double x0 = pts[2 * i], y0 = pts[2 * i + 1];
      double x1 = pts[2 * j], y1 = pts[2 * j + 1];
      if (y0 == y1) continue;
      if ((y >= std::min(y0, y1)) && (y < std::max(y0, y1))) {
        xs.push_back(x0 + (y - y0) * (x1 - x0) / (y1 - y0));
      }
    }
    std::sort(xs.begin(), xs.end());
    for (size_t k = 0; k + 1 < xs.size(); k += 2) {
      int xa = std::max(0, (int)std::max(0.0, xs[k] + 0.5 - 1e-9));
      int xb = std::min(w - 1, (int)(xs[k + 1] + 0.5));
      for (int x = xa; x <= xb; ++x) mask[(size_t)y * w + x] = value;
    }
  }
}

// Rasterize many polygons: offsets[i]..offsets[i+1] index into pts.
void fill_polygons(uint8_t* mask, int h, int w,
                   const int32_t* pts, const int32_t* offsets, int npolys,
                   uint8_t value) {
  for (int p = 0; p < npolys; ++p) {
    int start = offsets[p], end = offsets[p + 1];
    fill_polygon(mask, h, w, pts + 2 * start, end - start, value);
  }
}

// uint16 → uint8 min-max conversion (large_wsi_to_small_wsi_MS.py:119;
// convert_tif_to_jpg.py:93-96). Bit-exact vs numpy's
// ((x.astype(f32) - lo) / (hi - lo) * 255).astype(u8): a 65536-entry LUT is
// filled with the f32 ops in numpy's exact order (subtract, divide, multiply,
// truncating cast) — a precomputed 255/(hi-lo) scale rounds differently for
// ~15% of dynamic ranges (e.g. maps hi to 254).
void convert_u16_to_u8(const uint16_t* src, uint8_t* dst, int64_t n) {
  uint16_t lo = 65535, hi = 0;
#pragma omp parallel for reduction(min : lo) reduction(max : hi)
  for (int64_t i = 0; i < n; ++i) {
    lo = std::min(lo, src[i]);
    hi = std::max(hi, src[i]);
  }
  if (hi == lo) {
    std::memset(dst, 0, n);
    return;
  }
  const float range = (float)(hi - lo);
  static thread_local uint8_t lut[65536];
  for (int v = lo; v <= (int)hi; ++v) {
    lut[v] = (uint8_t)(((float)v - (float)lo) / range * 255.0f);
  }
#pragma omp parallel for
  for (int64_t i = 0; i < n; ++i) {
    dst[i] = lut[src[i]];
  }
}

// Gather n tiles of size t×t from an h×w uint8 image at (y, x) origins into a
// contiguous (n, t, t) batch buffer (the tiling hot loop, done with memcpy
// rows instead of Python slicing).
void extract_tiles_u8(const uint8_t* image, int h, int w,
                      const int32_t* positions, int n, int t,
                      uint8_t* out) {
#pragma omp parallel for
  for (int i = 0; i < n; ++i) {
    int y = positions[2 * i], x = positions[2 * i + 1];
    for (int r = 0; r < t; ++r) {
      std::memcpy(out + ((size_t)i * t + r) * t,
                  image + (size_t)(y + r) * w + x, t);
    }
  }
}

// Weighted scatter-add blend of n float32 tiles into acc/wsum canvases
// (GaussianBlender accumulation, full_evaluation_enhanced.py:150-183).
void blend_accumulate_f32(float* acc, float* wsum, int h, int w,
                          const float* tiles, const float* weight, int n, int t,
                          const int32_t* positions) {
  for (int i = 0; i < n; ++i) {
    int y = positions[2 * i], x = positions[2 * i + 1];
    const float* tile = tiles + (size_t)i * t * t;
#pragma omp parallel for
    for (int r = 0; r < t; ++r) {
      float* arow = acc + (size_t)(y + r) * w + x;
      float* wrow = wsum + (size_t)(y + r) * w + x;
      const float* trow = tile + (size_t)r * t;
      const float* krow = weight + (size_t)r * t;
      for (int c = 0; c < t; ++c) {
        arow[c] += trow[c] * krow[c];
        wrow[c] += krow[c];
      }
    }
  }
}

// White-ratio + mean/var single-pass tile statistics for QC prefiltering on
// host (avoids a device round-trip for obviously-empty tiles).
void tile_stats_u8(const uint8_t* tiles, int n, int t,
                   float white_threshold, float* white_ratio,
                   float* mean, float* var) {
#pragma omp parallel for
  for (int i = 0; i < n; ++i) {
    const uint8_t* tile = tiles + (size_t)i * t * t;
    int64_t count = (int64_t)t * t;
    int64_t white = 0;
    double s = 0, s2 = 0;
    for (int64_t k = 0; k < count; ++k) {
      double v = tile[k];
      s += v;
      s2 += v * v;
      if (v >= white_threshold) ++white;
    }
    double m = s / count;
    white_ratio[i] = (float)((double)white / count);
    mean[i] = (float)m;
    var[i] = (float)(s2 / count - m * m);
  }
}

int tileops_version() { return 1; }

}  // extern "C"

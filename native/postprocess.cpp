// tpuseg native postprocess — the host-side runtime tier.
//
// The reference delegates its per-frame postprocess to OpenCV's C++ inside
// the Python loop (inference.py:76-141): 5x5 rect morphological close on the
// road mask, connected-components keep-largest, and external-contour bounding
// boxes for cars. In the TPU pipeline this work runs on the single host core
// in the writer thread, racing the decoder for CPU time — so it is
// implemented here as a dependency-free C++ library tuned for exactly these
// fixed-shape uint8 class maps, callable via ctypes (no pybind11 in image).
//
// Semantics match the reference/OpenCV behavior:
//  - morph close = dilate then erode with a kxk rectangular kernel
//    (separable: run rows then columns, O(1) per pixel via run tracking)
//  - connected components: 8-connectivity union-find, largest by area
//  - car boxes: bounding boxes of 8-connected components with area > min_area
//    (area = pixel count; matches contourArea>300 for filled blobs closely
//    enough that box sets agree on the reference's threshold — the Python
//    layer can still use cv2 for bit-exact contour areas when available).
//
// Build: make -C native   (produces libtpuseg_post.so)

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

extern "C" {

// ---------------------------------------------------------------------------
// Separable binary morphology on a 0/255 mask.

static void dilate_rows(const uint8_t* src, uint8_t* dst, int h, int w, int r) {
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = src + y * w;
    uint8_t* out = dst + y * w;
    int count = 0;  // number of set pixels in window [x-r, x+r]
    for (int x = -r; x <= r && x < w; ++x)
      if (x >= 0 && row[x]) ++count;
    for (int x = 0; x < w; ++x) {
      out[x] = count ? 255 : 0;
      int enter = x + r + 1, leave = x - r;
      if (enter < w && row[enter]) ++count;
      if (leave >= 0 && row[leave]) --count;
    }
  }
}

static void dilate_cols(const uint8_t* src, uint8_t* dst, int h, int w, int r) {
  std::vector<int> count(w, 0);
  for (int y = -r; y <= r && y < h; ++y)
    if (y >= 0)
      for (int x = 0; x < w; ++x)
        if (src[y * w + x]) ++count[x];
  for (int y = 0; y < h; ++y) {
    uint8_t* out = dst + y * w;
    for (int x = 0; x < w; ++x) out[x] = count[x] ? 255 : 0;
    int enter = y + r + 1, leave = y - r;
    if (enter < h) {
      const uint8_t* row = src + enter * w;
      for (int x = 0; x < w; ++x)
        if (row[x]) ++count[x];
    }
    if (leave >= 0) {
      const uint8_t* row = src + leave * w;
      for (int x = 0; x < w; ++x)
        if (row[x]) --count[x];
    }
  }
}

// Erosion treats out-of-bounds as SET (+inf border), matching cv2's erode
// border handling inside morphologyEx CLOSE — only in-bounds zeros erode.
static void erode_rows(const uint8_t* src, uint8_t* dst, int h, int w, int r) {
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = src + y * w;
    uint8_t* out = dst + y * w;
    int zeros = 0;  // in-bounds zero pixels in window
    for (int x = 0; x <= r && x < w; ++x)
      if (!row[x]) ++zeros;
    for (int x = 0; x < w; ++x) {
      out[x] = zeros ? 0 : 255;
      int enter = x + r + 1, leave = x - r;
      if (enter < w && !row[enter]) ++zeros;
      if (leave >= 0 && !row[leave]) --zeros;
    }
  }
}

static void erode_cols(const uint8_t* src, uint8_t* dst, int h, int w, int r) {
  std::vector<int> zeros(w, 0);
  for (int y = 0; y <= r && y < h; ++y)
    for (int x = 0; x < w; ++x)
      if (!src[y * w + x]) ++zeros[x];
  for (int y = 0; y < h; ++y) {
    uint8_t* out = dst + y * w;
    for (int x = 0; x < w; ++x) out[x] = zeros[x] ? 0 : 255;
    int enter = y + r + 1, leave = y - r;
    if (enter < h) {
      const uint8_t* row = src + enter * w;
      for (int x = 0; x < w; ++x)
        if (!row[x]) ++zeros[x];
    }
    if (leave >= 0) {
      const uint8_t* row = src + leave * w;
      for (int x = 0; x < w; ++x)
        if (!row[x]) --zeros[x];
    }
  }
}

// Morphological close with a (2r+1)x(2r+1) rectangular kernel.
// Border semantics match cv2 morphologyEx CLOSE: dilation pads with the
// identity 0 (out-of-bounds never adds to the max), erosion pads with the
// identity 255 (only in-bounds zeros erode). Verified byte-identical to cv2
// in tests/test_native_post.py.
void tpuseg_morph_close(const uint8_t* mask, uint8_t* out, int h, int w, int r) {
  std::vector<uint8_t> tmp1(h * w), tmp2(h * w);
  dilate_rows(mask, tmp1.data(), h, w, r);
  dilate_cols(tmp1.data(), tmp2.data(), h, w, r);
  erode_rows(tmp2.data(), tmp1.data(), h, w, r);
  erode_cols(tmp1.data(), out, h, w, r);
}

// ---------------------------------------------------------------------------
// Connected components (8-connectivity) via union-find on row runs.

struct UF {
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
    if (a != b) parent[std::max(a, b)] = std::min(a, b);
  }
};

// Labels `mask` (nonzero = foreground) into `labels` (0 = background,
// 1..n component ids). Returns the number of components.
int32_t tpuseg_label_components(const uint8_t* mask, int32_t* labels, int h,
                                int w) {
  UF uf;
  uf.parent.push_back(0);  // background
  std::memset(labels, 0, sizeof(int32_t) * h * w);
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      if (!mask[y * w + x]) continue;
      int32_t up = y > 0 ? labels[(y - 1) * w + x] : 0;
      int32_t upl = (y > 0 && x > 0) ? labels[(y - 1) * w + x - 1] : 0;
      int32_t upr = (y > 0 && x + 1 < w) ? labels[(y - 1) * w + x + 1] : 0;
      int32_t left = x > 0 ? labels[y * w + x - 1] : 0;
      int32_t lab = 0;
      for (int32_t n : {up, upl, upr, left})
        if (n && (!lab || n < lab)) lab = n;
      if (!lab) {
        lab = (int32_t)uf.parent.size();
        uf.parent.push_back(lab);
      } else {
        for (int32_t n : {up, upl, upr, left})
          if (n) uf.unite(lab, n);
      }
      labels[y * w + x] = lab;
    }
  }
  // flatten + renumber densely
  std::vector<int32_t> remap(uf.parent.size(), 0);
  int32_t next = 0;
  for (size_t i = 1; i < uf.parent.size(); ++i) {
    int32_t root = uf.find((int32_t)i);
    if (!remap[root]) remap[root] = ++next;
    remap[i] = remap[root];
  }
  for (int i = 0; i < h * w; ++i)
    if (labels[i]) labels[i] = remap[labels[i]];
  return next;
}

// Keeps only the largest component of `mask`, writing 255/0 into `out`.
// Returns the area of the kept component (0 if mask empty).
int32_t tpuseg_keep_largest(const uint8_t* mask, uint8_t* out, int h, int w) {
  std::vector<int32_t> labels(h * w);
  int32_t n = tpuseg_label_components(mask, labels.data(), h, w);
  if (n == 0) {
    std::memset(out, 0, h * w);
    return 0;
  }
  std::vector<int64_t> area(n + 1, 0);
  for (int i = 0; i < h * w; ++i) ++area[labels[i]];
  area[0] = 0;
  int32_t best = 1;
  for (int32_t c = 2; c <= n; ++c)
    if (area[c] > area[best]) best = c;
  for (int i = 0; i < h * w; ++i) out[i] = labels[i] == best ? 255 : 0;
  return (int32_t)area[best];
}

// Bounding boxes of components with area > min_area.
// boxes: caller-allocated int32 array [max_boxes * 5] rows (x, y, w, h, area).
// Returns the number of boxes written.
int32_t tpuseg_component_boxes(const uint8_t* mask, int h, int w,
                               int32_t min_area, int32_t* boxes,
                               int32_t max_boxes) {
  std::vector<int32_t> labels(h * w);
  int32_t n = tpuseg_label_components(mask, labels.data(), h, w);
  if (n == 0) return 0;
  std::vector<int32_t> minx(n + 1, w), miny(n + 1, h), maxx(n + 1, -1),
      maxy(n + 1, -1), area(n + 1, 0);
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x) {
      int32_t c = labels[y * w + x];
      if (!c) continue;
      ++area[c];
      minx[c] = std::min(minx[c], x);
      miny[c] = std::min(miny[c], y);
      maxx[c] = std::max(maxx[c], x);
      maxy[c] = std::max(maxy[c], y);
    }
  int32_t out = 0;
  for (int32_t c = 1; c <= n && out < max_boxes; ++c) {
    if (area[c] > min_area) {
      boxes[out * 5 + 0] = minx[c];
      boxes[out * 5 + 1] = miny[c];
      boxes[out * 5 + 2] = maxx[c] - minx[c] + 1;
      boxes[out * 5 + 3] = maxy[c] - miny[c] + 1;
      boxes[out * 5 + 4] = area[c];
      ++out;
    }
  }
  return out;
}

// ---------------------------------------------------------------------------
// Fused full road-cleanup: close(road) -> largest component -> stamp class 1.
// classes is modified in place. Returns the kept-road area.
int32_t tpuseg_clean_road(uint8_t* classes, int h, int w, uint8_t road_class,
                          int radius) {
  std::vector<uint8_t> mask(h * w), closed(h * w), largest(h * w);
  for (int i = 0; i < h * w; ++i) mask[i] = classes[i] == road_class ? 255 : 0;
  tpuseg_morph_close(mask.data(), closed.data(), h, w, radius);
  int32_t area = tpuseg_keep_largest(closed.data(), largest.data(), h, w);
  for (int i = 0; i < h * w; ++i)
    if (largest[i]) classes[i] = road_class;
  return area;
}

// Palette colorize: classes [h*w] uint8 -> bgr [h*w*3] uint8 via palette
// [n_classes*3].
void tpuseg_colorize(const uint8_t* classes, const uint8_t* palette,
                     int n_classes, uint8_t* bgr, int h, int w) {
  for (int i = 0; i < h * w; ++i) {
    int c = classes[i] < n_classes ? classes[i] : 0;
    bgr[i * 3 + 0] = palette[c * 3 + 0];
    bgr[i * 3 + 1] = palette[c * 3 + 1];
    bgr[i * 3 + 2] = palette[c * 3 + 2];
  }
}

// Fused colorize+blend via a precomputed LUT: out = blend(frame, palette[c])
// in ONE pass. The separate colorize (write 3 B/px) + blend (read 6, write
// 3 B/px) chain costs 12 B/px of traffic plus a double-precision round per
// channel; the LUT pass reads 4 B/px, writes 3, and does three table loads.
// lut layout: [class id 0..255][channel 0..2][frame byte 0..255] -> uint8,
// built host-side as clip(nearbyint(frame*(1-alpha) + palette[c]*alpha)) —
// bit-identical to tpuseg_blend(frame, tpuseg_colorize(classes)) by
// construction (same double expression, same rounding).
void tpuseg_colorize_blend(const uint8_t* frame, const uint8_t* classes,
                           const uint8_t* lut, uint8_t* out, int npx) {
  for (int i = 0; i < npx; ++i) {
    const uint8_t* t = lut + (size_t)classes[i] * 768;
    out[i * 3 + 0] = t[frame[i * 3 + 0]];
    out[i * 3 + 1] = t[256 + frame[i * 3 + 1]];
    out[i * 3 + 2] = t[512 + frame[i * 3 + 2]];
  }
}

// Blend: out = a*(1-alpha) + b*alpha, uint8. cv2.addWeighted computes in
// double and rounds half-to-even (cvRound); match that exactly.
void tpuseg_blend(const uint8_t* a, const uint8_t* b, uint8_t* out, int n,
                  float alpha) {
  double al = (double)alpha;
  double ia = 1.0 - al;
  for (int i = 0; i < n; ++i) {
    double v = a[i] * ia + b[i] * al;
    int r = (int)__builtin_nearbyint(v);  // round half to even, like cvRound
    out[i] = (uint8_t)(r < 0 ? 0 : (r > 255 ? 255 : r));
  }
}

}  // extern "C"

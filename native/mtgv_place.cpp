// mtgv_place — native rejection-sampling card placement for scene-gen.
//
// The detector scene generator's host hot path is the placement loop
// (mtgvision/od_datasets.py:287-377 semantics; Python rebuild in
// mtgvision_tpu/data/scene_gen.py:place_card): per attempt it builds a
// jittered/rotated/scaled quad, solves a 4-point homography, and runs
// polygon visibility/overlap/containment tests against every placed card.
// In Python this costs ~100 ms per scene batch; here it's a few µs per
// attempt. Exposed as a C ABI for ctypes.
//
// Geometry matches ops/polygon.py: Sutherland–Hodgman clipping against
// convex clips + shoelace areas; jittered quads are clipped against their
// convex hull like the Python path.

#include <cmath>
#include <cstdint>
#include <cstring>

#include <algorithm>
#include <vector>

namespace {

struct P {
  double x, y;
};

double poly_area(const std::vector<P> &p) {
  if (p.size() < 3) return 0.0;
  double s = 0;
  for (size_t i = 0; i < p.size(); ++i) {
    const P &a = p[i], &b = p[(i + 1) % p.size()];
    s += a.x * b.y - a.y * b.x;
  }
  return std::fabs(s) * 0.5;
}

double signed_area(const std::vector<P> &p) {
  double s = 0;
  for (size_t i = 0; i < p.size(); ++i) {
    const P &a = p[i], &b = p[(i + 1) % p.size()];
    s += a.x * b.y - a.y * b.x;
  }
  return s * 0.5;
}

// Sutherland–Hodgman: clip subject by CONVEX clip polygon.
std::vector<P> clip_poly(std::vector<P> subject, std::vector<P> clip) {
  if (signed_area(clip) < 0) std::reverse(clip.begin(), clip.end());
  for (size_t i = 0; i < clip.size() && !subject.empty(); ++i) {
    const P a = clip[i], b = clip[(i + 1) % clip.size()];
    const double ex = b.x - a.x, ey = b.y - a.y;
    std::vector<P> out;
    out.reserve(subject.size() + 4);
    P s = subject.back();
    auto inside = [&](const P &q) {
      return ex * (q.y - a.y) - ey * (q.x - a.x) >= 0;
    };
    auto intersect = [&](const P &p0, const P &p1) {
      const double dx = p1.x - p0.x, dy = p1.y - p0.y;
      const double denom = ex * dy - ey * dx;
      if (std::fabs(denom) < 1e-12) return p1;
      const double t = (ex * (a.y - p0.y) - ey * (a.x - p0.x)) / denom;
      return P{p0.x + t * dx, p0.y + t * dy};
    };
    for (const P &e : subject) {
      if (inside(e)) {
        if (!inside(s)) out.push_back(intersect(s, e));
        out.push_back(e);
      } else if (inside(s)) {
        out.push_back(intersect(s, e));
      }
      s = e;
    }
    subject = std::move(out);
  }
  return subject;
}

std::vector<P> convex_hull(std::vector<P> pts) {
  std::sort(pts.begin(), pts.end(), [](const P &a, const P &b) {
    return a.x < b.x || (a.x == b.x && a.y < b.y);
  });
  pts.erase(std::unique(pts.begin(), pts.end(), [](const P &a, const P &b) {
              return a.x == b.x && a.y == b.y;
            }),
            pts.end());
  if (pts.size() <= 2) return pts;
  auto cross = [](const P &o, const P &a, const P &b) {
    return (a.x - o.x) * (b.y - o.y) - (a.y - o.y) * (b.x - o.x);
  };
  std::vector<P> h(2 * pts.size());
  size_t k = 0;
  for (size_t i = 0; i < pts.size(); ++i) {
    while (k >= 2 && cross(h[k - 2], h[k - 1], pts[i]) <= 0) --k;
    h[k++] = pts[i];
  }
  for (size_t i = pts.size() - 1, t = k + 1; i-- > 0;) {
    while (k >= t && cross(h[k - 2], h[k - 1], pts[i]) <= 0) --k;
    h[k++] = pts[i];
  }
  h.resize(k - 1);
  return h;
}

double inter_area(const std::vector<P> &a, const std::vector<P> &b_convex) {
  return poly_area(clip_poly(a, b_convex));
}

// xorshift RNG — deterministic given the seed passed from Python.
struct Rng {
  uint64_t s;
  explicit Rng(uint64_t seed) : s(seed ? seed : 0x9e3779b97f4a7c15ULL) {}
  uint64_t next() {
    s ^= s << 13;
    s ^= s >> 7;
    s ^= s << 17;
    return s;
  }
  double uniform() { return double(next() >> 11) / double(1ULL << 53); }
  double uniform(double lo, double hi) { return lo + uniform() * (hi - lo); }
  long randint(long lo, long hi) {  // [lo, hi)
    return lo + long(next() % uint64_t(hi - lo));
  }
};

// 4-point homography via the 8x8 DLT system (Gaussian elimination).
bool solve_homography(const P src[4], const P dst[4], double m[9]) {
  double A[8][9];
  for (int i = 0; i < 4; ++i) {
    const double x = src[i].x, y = src[i].y, u = dst[i].x, v = dst[i].y;
    double r0[9] = {x, y, 1, 0, 0, 0, -u * x, -u * y, u};
    double r1[9] = {0, 0, 0, x, y, 1, -v * x, -v * y, v};
    memcpy(A[2 * i], r0, sizeof r0);
    memcpy(A[2 * i + 1], r1, sizeof r1);
  }
  for (int c = 0; c < 8; ++c) {
    int piv = c;
    for (int r = c + 1; r < 8; ++r)
      if (std::fabs(A[r][c]) > std::fabs(A[piv][c])) piv = r;
    if (std::fabs(A[piv][c]) < 1e-12) return false;
    for (int k = 0; k < 9; ++k) std::swap(A[c][k], A[piv][k]);
    for (int r = 0; r < 8; ++r) {
      if (r == c) continue;
      const double f = A[r][c] / A[c][c];
      for (int k = c; k < 9; ++k) A[r][k] -= f * A[c][k];
    }
  }
  for (int i = 0; i < 8; ++i) m[i] = A[i][8] / A[i][i];
  m[8] = 1.0;
  return true;
}

P apply_h(const double m[9], const P &p) {
  const double w = m[6] * p.x + m[7] * p.y + m[8];
  return P{(m[0] * p.x + m[1] * p.y + m[2]) / w,
           (m[3] * p.x + m[4] * p.y + m[5]) / w};
}

}  // namespace

extern "C" {

// Rejection-sample a placement homography (od_datasets.py:287-377 logic).
//
//   existing: (n_existing * 4 * 2) doubles — already-placed quads
//   out_m:    9 doubles (row-major 3x3), out_quad: 8 doubles
// Returns 1 on success, 0 if all attempts failed.
int mtgv_place_card(
    double card_h, double card_w, double bg_h, double bg_w,
    const double *existing, int n_existing,
    double min_area_ratio, double max_area_ratio, int log_uniform,
    double min_visible, double min_visible_edge, int no_contains,
    double jitter_ratio, int max_attempts, uint64_t seed,
    double *out_m, double *out_quad) {
  Rng rng(seed);
  min_visible_edge = std::max(min_visible, min_visible_edge);
  const double diag = std::hypot(card_h, card_w);
  const std::vector<P> frame = {
      {0, 0}, {bg_w, 0}, {bg_w, bg_h}, {0, bg_h}};

  std::vector<std::vector<P>> ex_polys, ex_hulls;
  for (int i = 0; i < n_existing; ++i) {
    std::vector<P> q(4);
    for (int j = 0; j < 4; ++j)
      q[j] = P{existing[i * 8 + j * 2], existing[i * 8 + j * 2 + 1]};
    ex_hulls.push_back(convex_hull(q));
    ex_polys.push_back(std::move(q));
  }

  const P src[4] = {{0, 0}, {card_w, 0}, {card_w, card_h}, {0, card_h}};

  for (int att = 0; att < max_attempts; ++att) {
    const double deg = rng.uniform(0, 360);
    const double min_area = bg_h * bg_w * min_area_ratio;
    const double max_area = bg_h * bg_w * max_area_ratio;
    const double area = log_uniform
        ? std::exp(rng.uniform(std::log(min_area), std::log(max_area)))
        : rng.uniform(min_area, max_area);
    const double scale = area / (card_h * card_w);
    // center-proposal bounds from the SCALED card footprint (+ jitter
    // slack); the exact visibility test below is the authority. The
    // reference pads by the NATIVE diagonal (od_datasets.py:321), which
    // confines centers to the frame middle for large native cards and
    // cannot place at all once the native diagonal exceeds the frame.
    const double sdiag = diag * scale * (1.0 + jitter_ratio);
    const long pad = long(sdiag / 2);
    const long ovr = long(sdiag * (1.0 - min_visible_edge));
    const long lo_x = pad - ovr, hi_x = long(bg_w) - pad + ovr;
    const long lo_y = pad - ovr, hi_y = long(bg_h) - pad + ovr;
    if (hi_x <= lo_x || hi_y <= lo_y) continue;
    const double cx = double(rng.randint(lo_x, hi_x));
    const double cy = double(rng.randint(lo_y, hi_y));

    // radial corner jitter about the rect center (od_datasets.py:29-48)
    P dst[4];
    const P ctr{card_w / 2, card_h / 2};
    for (int i = 0; i < 4; ++i) {
      const double dx = src[i].x - ctr.x, dy = src[i].y - ctr.y;
      const double r = std::hypot(dx, dy) *
                       rng.uniform(1 - jitter_ratio, 1 + jitter_ratio);
      const double ang = std::atan2(dy, dx);
      dst[i] = P{ctr.x + r * std::cos(ang), ctr.y + r * std::sin(ang)};
    }
    // rotate+scale about center, then translate so the center lands at (cx,cy)
    const double th = deg * M_PI / 180.0;
    const double c = std::cos(th), s = std::sin(th);
    for (int i = 0; i < 4; ++i) {
      const double dx = dst[i].x - ctr.x, dy = dst[i].y - ctr.y;
      dst[i] = P{(c * dx + s * dy) * scale + ctr.x * scale,
                 (-s * dx + c * dy) * scale + ctr.y * scale};
      dst[i].x += cx - ctr.x * scale;
      dst[i].y += cy - ctr.y * scale;
    }

    double m[9];
    if (!solve_homography(src, dst, m)) continue;
    std::vector<P> quad(4);
    for (int i = 0; i < 4; ++i) quad[i] = apply_h(m, src[i]);
    const double qa = poly_area(quad);
    if (qa <= 1.0) continue;
    const double vis = inter_area(quad, frame);
    if (vis / qa < min_visible_edge) continue;

    bool ok = true;
    const std::vector<P> quad_hull = convex_hull(quad);
    for (size_t i = 0; i < ex_polys.size() && ok; ++i) {
      const double inter = inter_area(quad, ex_hulls[i]);
      const double pa = poly_area(ex_polys[i]);
      if ((vis - inter) / qa < min_visible) ok = false;
      else if ((pa - inter_area(ex_polys[i], quad_hull)) /
                   std::max(pa, 1e-9) < min_visible) ok = false;
      else if (no_contains &&
               (inter_area(quad, ex_hulls[i]) >= qa * (1 - 1e-6) ||
                inter_area(ex_polys[i], quad_hull) >= pa * (1 - 1e-6)))
        ok = false;
    }
    if (!ok) continue;

    memcpy(out_m, m, 9 * sizeof(double));
    for (int i = 0; i < 4; ++i) {
      out_quad[i * 2] = quad[i].x;
      out_quad[i * 2 + 1] = quad[i].y;
    }
    return 1;
  }
  return 0;
}

}  // extern "C"

// Minimal drop-in for the boost::geometry / boost::numeric::ublas surface
// used by the reference KITTI devkit evaluator (convex rotated-rectangle
// overlap only). Lets the unmodified reference evaluate_object.cpp compile
// in containers without boost, so the from-scratch rewrite can be
// cross-validated against the reference binary on identical inputs.
//
// Semantics provided (all that toPolygon/groundBoxOverlap/box3DOverlap use):
//   model::polygon< model::d2::point_xy<double> >  — ring of points
//   append(poly, double[][2])                      — append closed ring
//   area(poly)                                     — |shoelace|
//   intersection(a, b, vector<polygon>&)           — convex clip (S-H)
//   union_(a, b, vector<polygon>&)                 — area-only placeholder
//                                                    (A + B - A∩B); the
//                                                    devkit only ever calls
//                                                    area(un.front())
#ifndef BOOST_COMPAT_GEOMETRY_HPP
#define BOOST_COMPAT_GEOMETRY_HPP

#include <cmath>
#include <cstddef>
#include <vector>

#ifndef BOOST_GEOMETRY_REGISTER_C_ARRAY_CS
#define BOOST_GEOMETRY_REGISTER_C_ARRAY_CS(cs_tag)
#endif

namespace boost {
namespace geometry {

namespace cs { struct cartesian {}; }

namespace model {
namespace d2 {
template <typename T>
struct point_xy {
  T x_, y_;
  point_xy() : x_(0), y_(0) {}
  point_xy(T x, T y) : x_(x), y_(y) {}
};
}  // namespace d2

template <typename Point>
struct polygon {
  std::vector<Point> ring;   // closed: first point repeated at the end
  double forced_area = -1.;  // >=0: a union_ placeholder carrying only area
};
}  // namespace model

template <typename Point, std::size_t N>
inline void append(model::polygon<Point> &poly, const double (&pts)[N][2]) {
  for (std::size_t i = 0; i < N; ++i)
    poly.ring.push_back(Point(pts[i][0], pts[i][1]));
}

template <typename Point>
inline double area(const model::polygon<Point> &poly) {
  if (poly.forced_area >= 0.) return poly.forced_area;
  const std::vector<Point> &r = poly.ring;
  std::size_t n = r.size();
  if (n >= 2 && r.front().x_ == r.back().x_ && r.front().y_ == r.back().y_)
    --n;  // drop duplicated closing point
  if (n < 3) return 0.;
  double s = 0.;
  for (std::size_t i = 0; i < n; ++i) {
    std::size_t j = (i + 1) % n;
    s += r[i].x_ * r[j].y_ - r[j].x_ * r[i].y_;
  }
  return std::fabs(s) * 0.5;
}

namespace detail {
// Sutherland–Hodgman: clip convex `subject` by convex `clip`. Orientation of
// the clip ring is detected from its signed area so either winding works.
template <typename Point>
inline std::vector<Point> clip_convex(const std::vector<Point> &subject,
                                      const std::vector<Point> &clip) {
  std::size_t cn = clip.size();
  if (cn >= 2 && clip.front().x_ == clip.back().x_ &&
      clip.front().y_ == clip.back().y_)
    --cn;
  double signed2 = 0.;
  for (std::size_t i = 0; i < cn; ++i) {
    std::size_t j = (i + 1) % cn;
    signed2 += clip[i].x_ * clip[j].y_ - clip[j].x_ * clip[i].y_;
  }
  const double orient = signed2 >= 0. ? 1. : -1.;

  std::vector<Point> poly = subject;
  if (poly.size() >= 2 && poly.front().x_ == poly.back().x_ &&
      poly.front().y_ == poly.back().y_)
    poly.pop_back();

  for (std::size_t e = 0; e < cn && !poly.empty(); ++e) {
    const Point &a = clip[e];
    const Point &b = clip[(e + 1) % cn];
    std::vector<Point> out;
    std::size_t m = poly.size();
    for (std::size_t i = 0; i < m; ++i) {
      const Point &p = poly[i];
      const Point &q = poly[(i + 1) % m];
      double side_p = orient * ((b.x_ - a.x_) * (p.y_ - a.y_) -
                                (b.y_ - a.y_) * (p.x_ - a.x_));
      double side_q = orient * ((b.x_ - a.x_) * (q.y_ - a.y_) -
                                (b.y_ - a.y_) * (q.x_ - a.x_));
      if (side_p >= 0.) out.push_back(p);
      if ((side_p > 0. && side_q < 0.) || (side_p < 0. && side_q > 0.)) {
        double t = side_p / (side_p - side_q);
        out.push_back(Point(p.x_ + t * (q.x_ - p.x_),
                            p.y_ + t * (q.y_ - p.y_)));
      }
    }
    poly.swap(out);
  }
  return poly;
}
}  // namespace detail

template <typename Point>
inline void intersection(const model::polygon<Point> &a,
                         const model::polygon<Point> &b,
                         std::vector<model::polygon<Point> > &out) {
  std::vector<Point> clipped = detail::clip_convex(a.ring, b.ring);
  if (clipped.size() >= 3) {
    model::polygon<Point> p;
    p.ring = clipped;
    p.ring.push_back(clipped.front());
    if (area(p) > 0.) out.push_back(p);
  }
}

template <typename Point>
inline void union_(const model::polygon<Point> &a,
                   const model::polygon<Point> &b,
                   std::vector<model::polygon<Point> > &out) {
  std::vector<model::polygon<Point> > in;
  intersection(a, b, in);
  double inter = in.empty() ? 0. : area(in.front());
  model::polygon<Point> u;
  u.forced_area = area(a) + area(b) - inter;
  out.push_back(u);
}

}  // namespace geometry
}  // namespace boost

#endif  // BOOST_COMPAT_GEOMETRY_HPP

// Native single-thread oracle of the reference step semantics (no ROS).
//
// Re-implements, from the documented behavior of the reference C++ core
// (cited by file:line below), the hot per-step pipeline:
//   * footprint rasterization + collision codes   (agent.cpp:285-327)
//   * unicycle/omni command with substep arrival   (agent.cpp:186-283)
//   * egocentric view render (per-pixel inverse transform, FOV gates,
//     occupancy threshold < 250)                   (agent.cpp:356-404)
//   * Bresenham laser raycast + 72-bin angular map (agent.cpp:405-624)
//
// Two uses:
//   1. parity fixtures: the JAX engine must match these outputs bit-exactly;
//   2. the CPU p50 step-latency baseline for BENCH comparisons (the
//      reference publishes no numbers, BASELINE.md).
//
// Exposed as a C ABI for ctypes.  Build:
//   g++ -O3 -shared -fPIC -o liboracle.so oracle.cpp

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <chrono>
#include <vector>

namespace {

constexpr double kViewYaw = 3.14159;     // view frame yaw (agent.cpp:84-87)
constexpr uint8_t kFreeMin = 250;
constexpr uint8_t kViewFree = 255;
constexpr uint8_t kUnseen = 200;
constexpr uint8_t kSelf = 100;
constexpr double kArriveDist = 0.3;      // agent.cpp:213,277
constexpr double kSubstep = 0.05;        // agent.cpp:89
constexpr int kAngularBins = 72;

inline long rnd(double v) {              // C++ round(): half away from zero
  return (long)std::llround(v);
}

struct Grid {
  uint8_t* data;
  int h, w;
  double res;
  inline bool in(long m, long n) const {
    return m >= 0 && m < h && n >= 0 && n < w;
  }
  inline uint8_t& at(long m, long n) { return data[m * w + n]; }
  inline uint8_t get(long m, long n) const { return data[m * w + n]; }
  inline void world2map(double x, double y, long& m, long& n) const {
    m = rnd(x / res);                    // grid_map.cpp:40-44
    n = rnd(y / res);
  }
};

// Stamp a base-frame point cloud transformed by pose; returns the collision
// code with last-hit-wins semantics (agent.cpp:295-326).
int draw(Grid& g, const double* pose, const double* pts, int npts, int value) {
  int code = 0;
  double c = std::cos(pose[2]), s = std::sin(pose[2]);
  for (int k = 0; k < npts; ++k) {
    double wx = c * pts[2 * k] - s * pts[2 * k + 1] + pose[0];
    double wy = s * pts[2 * k] + c * pts[2 * k + 1] + pose[1];
    long m, n;
    g.world2map(wx, wy, m, n);
    if (!g.in(m, n)) continue;
    uint8_t cell = g.get(m, n);
    if (cell == 0) code = 1;
    else if (cell == 1) code = 2;
    else if (cell == 2) code = 3;
    else if (value >= 0) g.at(m, n) = (uint8_t)value;
  }
  return code;
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// Rasterization
// ---------------------------------------------------------------------------

int oracle_draw(uint8_t* map, int h, int w, double res, const double* pose,
                const double* pts, int npts, int value) {
  Grid g{map, h, w, res};
  return draw(g, pose, pts, npts, value);
}

// ---------------------------------------------------------------------------
// Kinematics: limiter + substepped arrival + exact arc (agent.cpp:186-283)
// ---------------------------------------------------------------------------

static double limit1(double v, double v0, double v1, double dt, int has_v,
                     int has_a, double vmin, double vmax, double amin,
                     double amax) {
  // acceleration clamp (speed_limit.cpp:105-150), then velocity clamp
  if (has_a) {
    auto sign = [](double x) { return x == 0 ? 0.0 : (x > 0 ? 1.0 : -1.0); };
    auto clamp = [](double x, double lo, double hi) {
      return std::fmin(std::fmax(lo, x), hi);
    };
    double vs = sign(v), v0s = sign(v0);
    if (vs + v0s != 0.0) {
      double lo = amin * dt, hi = amax * dt;
      double dv = v - v0;
      double dvs = sign(dv);
      if (dvs == v0s || dvs == vs)
        dv = dvs * clamp(std::fabs(dv), lo, hi);
      else
        dv = dvs * std::fabs(clamp(-std::fabs(dv), lo, hi));
      v = v0 + dv;
    } else {
      double zero_dt = std::fabs(v0 / amin);
      if (zero_dt >= dt) {
        v = v0s * (std::fabs(v0) - std::fabs(amin) * dt);
      } else {
        double v_dt = std::fabs(v / amax);
        if (zero_dt + v_dt >= dt) v = vs * std::fabs(amax * (dt - zero_dt));
      }
    }
  }
  if (has_v) v = std::fmin(std::fmax(v, vmin), vmax);
  return v;
}

// pose [3], goal [2], last0 [2], last1 [2]; lim_* packed
// [has_v, has_a, vmin, vmax, amin, amax] per axis.
// Returns arrive flag; pose updated in place; vel_world [2] out.
int oracle_cmd(double* pose, const double* goal, double* last0, double* last1,
               double v, double wcmd, double v_y, double dt, int omni,
               const double* lim_v, const double* lim_w, double* vel_world) {
  v = limit1(v, last0[0], last1[0], dt, (int)lim_v[0], (int)lim_v[1], lim_v[2],
             lim_v[3], lim_v[4], lim_v[5]);
  wcmd = limit1(wcmd, last0[1], last1[1], dt, (int)lim_w[0], (int)lim_w[1],
                lim_w[2], lim_w[3], lim_w[4], lim_w[5]);
  last1[0] = last0[0]; last1[1] = last0[1];
  last0[0] = v; last0[1] = wcmd;

  // substep arrival scan (agent.cpp:201-218): Euler at 0.05 s, move first,
  // break on arrival; vx/vy only tracked for the diff drive (quirk).
  double x = pose[0], y = pose[1], th = pose[2];
  int arrive = 0;
  double vx = 0, vy = 0;
  for (double cur = 0.0; cur <= dt; cur += kSubstep) {
    if (!omni) {
      x += v * kSubstep * std::cos(th);
      y += v * kSubstep * std::sin(th);
      vx = v * std::cos(th);
      vy = v * std::sin(th);
    } else {
      x += v * kSubstep * std::cos(th) - v_y * kSubstep * std::sin(th);
      y += v * kSubstep * std::sin(th) + v_y * kSubstep * std::cos(th);
    }
    th += wcmd * kSubstep;
    if (std::hypot(x - goal[0], y - goal[1]) <= kArriveDist) {
      arrive = 1;
      break;
    }
  }
  vel_world[0] = vx; vel_world[1] = vy;

  // exact arc final pose (agent.cpp:220-236, 256-273)
  double c = std::cos(pose[2]), s = std::sin(pose[2]);
  if (wcmd == 0.0) {
    pose[0] += v * dt * c - (omni ? v_y * dt * s : 0.0);
    pose[1] += v * dt * s + (omni ? v_y * dt * c : 0.0);
    pose[2] += wcmd * dt;
  } else {
    double th1 = pose[2] + wcmd * dt;
    double ca = std::cos(th1), sa = std::sin(th1);
    double vw = v / wcmd;
    double nx = pose[0] - vw * s + vw * sa;
    double ny = pose[1] + vw * c - vw * ca;
    if (omni) {
      double vyw = v_y / wcmd;
      nx += -vyw * c + vyw * ca;
      ny += -vyw * s + vyw * sa;
    }
    pose[0] = nx; pose[1] = ny; pose[2] = th1;
  }
  if (std::hypot(goal[0] - pose[0], goal[1] - pose[1]) <= kArriveDist)
    arrive = 1;
  return arrive;
}

// ---------------------------------------------------------------------------
// View render + Bresenham laser (agent.cpp:356-624)
// ---------------------------------------------------------------------------

static double bresenham(const Grid& src, Grid& trace, long x1, long y1,
                        long x2, long y2, double res) {
  // Faithful midpoint walk (agent.cpp:511-624): the ray reads the FOV-gated
  // view map, treats only value 0 as a hit (200-unseen passes through),
  // keeps walking past the hit marking 200 except on cells sharing a row or
  // column with the hit cell, and stops when it leaves the map or reaches
  // the (excluded) endpoint.  Miss distance = 6 (agent.cpp:513).
  long w = x2 - x1, h = y2 - y1;
  long dx = (w > 0) ? 1 : -1, dy = (h > 0) ? 1 : -1;
  w = std::labs(w); h = std::labs(h);
  double hit = 6.0;
  bool line_end = false;
  long end_x = -1, end_y = -1;
  auto visit = [&](long cx, long cy) -> bool {  // true -> stop walking
    if (!src.in(cx, cy)) return true;
    int cur = src.get(cx, cy);
    if (!line_end) {
      if (cur != 0) {
        trace.at(cx, cy) = kViewFree;
      } else if (end_x == -1) {
        trace.at(cx, cy) = 0;
        line_end = true;
        end_x = cx; end_y = cy;
        hit = std::hypot((double)(cx - x1) * res, (double)(cy - y1) * res);
      }
    } else if (cx != end_x && cy != end_y) {
      trace.at(cx, cy) = kUnseen;
    }
    return false;
  };
  if (w > h) {
    long f = 2 * h - w, d1 = 2 * h, d2 = 2 * (h - w);
    for (long x = x1, y = y1; x != x2; x += dx) {
      if (visit(x, y)) return hit;
      if (f < 0) f += d1;
      else { y += dy; f += d2; }
    }
  } else {
    long f = 2 * w - h, d1 = 2 * w, d2 = 2 * (w - h);
    for (long x = x1, y = y1; y != y2; y += dy) {
      if (visit(x, y)) return hit;
      if (f < 0) f += d1;
      else { x += dx; f += d2; }
    }
  }
  return hit;
}

// Renders robot view + laser.  world: composed uint8 occupancy (0/1/2
// occupied, >=250 free).  view_out: hpx*wpx u8.  hits/angular out arrays.
// sx/sy: per-robot laser mount offset in the base frame (sensor_base_,
// img_env.cpp:131-132): FOV gating is about the sensor (agent.cpp:381)
// and the ray walk starts at the sensor's view cell (agent.cpp:367-369);
// beam endpoints stay base-relative (agent.cpp:425-429).
void oracle_view(const uint8_t* world, int wh, int ww, double wres,
                 const double* pose, int hpx, int wpx, double vres,
                 double half, double angle_begin, double angle_end,
                 double min_dist, double max_dist, int range_total,
                 int use_laser, double sx, double sy,
                 uint8_t* view_out, double* hits,
                 double* angular) {
  Grid wg{const_cast<uint8_t*>(world), wh, ww, wres};
  std::memset(view_out, kUnseen, (size_t)hpx * wpx);
  Grid vg{view_out, hpx, wpx, vres};
  double c = std::cos(pose[2]), s = std::sin(pose[2]);
  double cv = std::cos(kViewYaw), sv = std::sin(kViewYaw);
  for (int i = 0; i < hpx; ++i) {
    for (int j = 0; j < wpx; ++j) {
      double xv = i * vres, yv = j * vres;
      // view -> base (inverse of base2view, agent.cpp:100-118)
      double xb = cv * xv - sv * yv + half;
      double yb = sv * xv + cv * yv + half;
      double ang = std::atan2(yb - sy, xb - sx);
      if (ang <= angle_begin || ang >= angle_end) continue;
      if (xb < min_dist || xb > max_dist) continue;
      double wx = c * xb - s * yb + pose[0];
      double wy = s * xb + c * yb + pose[1];
      long m, n;
      wg.world2map(wx, wy, m, n);
      if (!wg.in(m, n)) continue;
      vg.at(i, j) = (wg.get(m, n) < kFreeMin) ? 0 : kViewFree;
    }
  }
  for (int k = 0; k < kAngularBins; ++k) angular[k] = max_dist;
  if (!use_laser) return;

  std::vector<uint8_t> trace((size_t)hpx * wpx, kUnseen);
  Grid tg{trace.data(), hpx, wpx, vres};
  double max_range = std::hypot(half, half);
  double astep = std::fabs(angle_end - angle_begin) / range_total;
  double ang_map_step = std::fabs(angle_end - angle_begin) / kAngularBins;
  // sensor origin cell in view pixels
  double x0v = cv * sx + sv * sy - (cv * half + sv * half);
  double y0v = -sv * sx + cv * sy - (-sv * half + cv * half);
  long x0 = rnd(x0v / vres), y0 = rnd(y0v / vres);
  for (int k = 0; k < range_total; ++k) {
    double cur = angle_begin + astep * k;
    double xb = max_range * std::cos(cur), yb = max_range * std::sin(cur);
    double xvv = cv * xb + sv * yb - (cv * half + sv * half);
    double yvv = -sv * xb + cv * yb - (-sv * half + cv * half);
    long xe = rnd(xvv / vres), ye = rnd(yvv / vres);
    double hit = bresenham(vg, tg, x0, y0, xe, ye, vres);
    hits[k] = hit;
    int ai = (int)(astep * k / ang_map_step);
    if (ai >= kAngularBins) ai = kAngularBins - 1;
    if (hit < angular[ai]) angular[ai] = hit;
  }
  std::memcpy(view_out, trace.data(), (size_t)hpx * wpx);
}

// ---------------------------------------------------------------------------
// CPU step-latency baseline: full N-robot step over a composed map
// ---------------------------------------------------------------------------

double oracle_bench_step(const uint8_t* base_map, int h, int w, double res,
                         double* poses, const double* goals,
                         const double* robot_pts, int npts, int n_robots,
                         int hpx, int wpx, int range_total, int iters) {
  std::vector<uint8_t> world((size_t)h * w);
  std::vector<uint8_t> view((size_t)hpx * wpx);
  std::vector<double> hits(range_total), angular(kAngularBins);
  std::vector<double> last0(2 * n_robots, 0.0), last1(2 * n_robots, 0.0);
  double lim_v[6] = {1, 1, 0.0, 0.6, -2.0, 2.0};
  double lim_w[6] = {1, 1, -0.9, 0.9, -2.0, 2.0};
  double vel[2];
  auto t0 = std::chrono::steady_clock::now();
  for (int it = 0; it < iters; ++it) {
    std::memcpy(world.data(), base_map, (size_t)h * w);
    Grid g{world.data(), h, w, res};
    for (int i = 0; i < n_robots; ++i) {
      oracle_cmd(&poses[3 * i], &goals[2 * i], &last0[2 * i], &last1[2 * i],
                 0.3, 0.2, 0.0, 0.4, 0, lim_v, lim_w, vel);
      draw(g, &poses[3 * i], robot_pts, npts, 2);
    }
    for (int i = 0; i < n_robots; ++i) {
      oracle_view(world.data(), h, w, res, &poses[3 * i], hpx, wpx, res, 3.0,
                  -1.570795, 1.570795, 0.0, 10.0, range_total, 1, 0.0, 0.0,
                  view.data(), hits.data(), angular.data());
    }
  }
  auto t1 = std::chrono::steady_clock::now();
  return std::chrono::duration<double>(t1 - t0).count() / iters;
}

}  // extern "C"

// lbfgs_native: sequential-f64 limited-memory quasi-Newton core.
//
// Native C++ component of the lbfgs_tpu framework with two roles:
//
//  1. Golden parity oracle.  The upstream reference (ybyygu/rust-lbfgs)
//     computes every reduction as a sequential left-fold over f64; XLA
//     reassociates reductions, so iteration-for-iteration parity with the
//     reference's recorded trajectories (37 iterations on Rosenbrock
//     N=100, tests/simple.rs:33) can only be checked against a
//     sequential implementation.  This library re-implements the same
//     algorithm semantics — L-BFGS two-loop over a circular history,
//     More-Thuente and backtracking line searches, OWL-QN projections,
//     Powell/Al-Baali damping with the reference's literal quirks — with
//     strictly sequential reductions.
//
//  2. Host-side fast path.  For small n the fixed ~30us/step dispatch
//     latency of a tunneled accelerator dominates; the Python driver can
//     route such problems here (backend="native") and keep the identical
//     builder API.
//
// Semantics are derived from the reference sources (each function cites
// file:line); the code itself is an independent C++ design (flat state
// struct, status-code control flow shared with the JAX build).
//
// Build: g++ -O2 -fPIC -shared -o liblbfgs_native.so lbfgs_native.cpp

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// ---------------------------------------------------------------------
// status codes — mirrors lbfgs_tpu/status.py
// ---------------------------------------------------------------------
enum Status : int32_t {
  RUNNING = 0,
  CONVERGED = 1,
  MAX_ITERATIONS = 2,
  MAX_EVALUATIONS = 3,
  CANCELLED = 4,
  LS_ROUNDING = 10,
  LS_XTOL = 11,
  LS_MAX_STEP = 12,
  LS_MIN_STEP = 13,
  LS_OUT_OF_INTERVAL = 14,
  LS_INCREASE_GRADIENT = 15,
  LS_INVALID_INTERVAL = 16,
  ERR_X_NOT_CHANGED = 20,
  ERR_G_NOT_CHANGED = 21,
  ERR_INVALID_DNORM = 22,
  ERR_OWLQN_ZERO_DIRECTION = 23,
  ERR_EVAL_FAILED = 30,
};

// sequential left-fold reductions (parity with reference src/math.rs:40-42,
// where vecdot is iter().zip().map().sum(), a strict left fold)
inline double seq_dot(const double* a, const double* b, int64_t n) {
  double s = 0.0;
  for (int64_t i = 0; i < n; ++i) s += a[i] * b[i];
  return s;
}
inline double seq_norm2(const double* a, int64_t n) {
  return std::sqrt(seq_dot(a, a, n));
}

// math-convention sign: 0 at 0/NaN (reference src/orthantwise.rs:174-180)
inline double msign(double v) {
  if (std::isnan(v) || v == 0.0) return 0.0;
  return v > 0.0 ? 1.0 : -1.0;
}

// ---------------------------------------------------------------------
// configuration — mirrors lbfgs_tpu/params.py (reference defaults)
// ---------------------------------------------------------------------
enum LsAlgo : int32_t {
  MORETHUENTE = 0,
  BT_ARMIJO = 1,
  BT_WOLFE = 2,
  BT_STRONG_WOLFE = 3,
};

struct Config {
  int32_t m = 6;
  double epsilon = 1e-5;
  int64_t max_iterations = 0;
  int64_t max_evaluations = 0;
  int32_t ls_algo = MORETHUENTE;
  double ftol = 1e-4;
  double gtol = 0.9;
  double xtol = 2.220446049250313e-16;
  double min_step = 1e-20;
  double max_step = 1e20;
  int32_t max_linesearch = 20;
  int32_t gradient_only = 0;
  int32_t owlqn_enabled = 0;
  double owlqn_c = 1.0;
  int64_t owlqn_start = 0;
  int64_t owlqn_end = -1;  // -1: up to n
  double initial_inverse_hessian = 1.0;
  double max_step_size = 1.0;
  int32_t damping = 0;
  int32_t constrain_step_size = 1;
};

// evaluation callback: fills g, returns fx; nonzero *fail aborts
typedef double (*EvalFn)(const double* x, double* g, int64_t n, void* user,
                         int32_t* fail);

struct Workspace {
  int64_t n;
  Config cfg;
  EvalFn eval;
  void* user;

  std::vector<double> x, gx, xp, gp, pg, wp, d;
  double fx = 0.0;
  int64_t neval = 0;

  // circular history
  std::vector<std::vector<double>> S, Y;
  std::vector<double> ys, alpha;
  int32_t end = 0;
  int64_t k = 0;
  double step = 0.0;

  int64_t ow_start() const { return cfg.owlqn_start; }
  int64_t ow_end() const {
    int64_t e = cfg.owlqn_end < 0 ? n : cfg.owlqn_end;
    return e < n ? e : n;
  }
};

// OWL-QN L1 term over the window (reference src/orthantwise.rs:70-79)
double x1norm(const Workspace& w) {
  double s = 0.0;
  for (int64_t i = w.ow_start(); i < w.ow_end(); ++i)
    s += w.cfg.owlqn_c * std::fabs(w.x[i]);
  return s;
}

// pseudo-gradient, Andrew & Gao Eq. 4 (reference src/orthantwise.rs:82-112)
void pseudo_gradient(Workspace& w) {
  const double c = w.cfg.owlqn_c;
  const int64_t s = w.ow_start(), e = w.ow_end();
  for (int64_t i = 0; i < s; ++i) w.pg[i] = w.gx[i];
  for (int64_t i = s; i < e; ++i) {
    if (w.x[i] != 0.0) {
      w.pg[i] = w.gx[i] + (w.x[i] > 0.0 ? c : -c);
    } else {
      double right = w.gx[i] + c, left = w.gx[i] - c;
      w.pg[i] = right < 0.0 ? right : (left > 0.0 ? left : 0.0);
    }
  }
  for (int64_t i = e; i < w.n; ++i) w.pg[i] = w.gx[i];
}

int32_t evaluate(Workspace& w) {
  int32_t fail = 0;
  w.fx = w.eval(w.x.data(), w.gx.data(), w.n, w.user, &fail);
  if (fail) return ERR_EVAL_FAILED;
  if (w.cfg.owlqn_enabled) {
    w.fx += x1norm(w);
    pseudo_gradient(w);
  }
  w.neval += 1;
  return 0;
}

// x = xp + step*d, orthant-projected under OWL-QN
// (reference src/core.rs:155-164 + orthantwise.rs:118-133)
void take_line_step(Workspace& w, double step) {
  for (int64_t i = 0; i < w.n; ++i) w.x[i] = w.xp[i] + step * w.d[i];
  if (w.cfg.owlqn_enabled) {
    for (int64_t i = w.ow_start(); i < w.ow_end(); ++i)
      if (msign(w.x[i]) != msign(w.wp[i])) w.x[i] = 0.0;
  }
}

// ---------------------------------------------------------------------
// trial-interval update (MCSTEP family; reference src/line.rs:446-709)
// ---------------------------------------------------------------------
double cubic_min(double u, double fu, double du, double v, double fv,
                 double dv) {
  double d = v - u;
  double theta = (fu - fv) * 3.0 / d + du + dv;
  double s = std::fmax(std::fmax(std::fabs(theta), std::fabs(du)),
                       std::fabs(dv));
  double a = theta / s;
  double gamma = s * std::sqrt(a * a - (du / s) * (dv / s));
  if (v < u) gamma = -gamma;
  double p = gamma - du + theta;
  double q = gamma - du + gamma + dv;
  return u + (p / q) * d;
}

double cubic_min_clamped(double u, double fu, double du, double v, double fv,
                         double dv, double lo, double hi) {
  double d = v - u;
  double theta = (fu - fv) * 3.0 / d + du + dv;
  double s = std::fmax(std::fmax(std::fabs(theta), std::fabs(du)),
                       std::fabs(dv));
  double a = theta / s;
  double gamma = s * std::sqrt(std::fmax(0.0, a * a - (du / s) * (dv / s)));
  if (u < v) gamma = -gamma;
  double p = gamma - dv + theta;
  double q = gamma - dv + gamma + du;
  double r = p / q;
  if (r < 0.0 && gamma != 0.0) return v - r * d;
  return v > u ? hi : lo;
}

double quad_min(double u, double fu, double du, double v, double fv) {
  double a = v - u;
  return u + du / ((fu - fv) / a + du) / 2.0 * a;
}

double quad_min_secant(double u, double du, double v, double dv) {
  double a = u - v;
  return v + dv / (dv - du) * a;
}

int32_t update_trial_interval(double& x, double& fx, double& dx, double& y,
                              double& fy, double& dy, double& t, double ft,
                              double dt, double tmin, double tmax,
                              bool& brackt) {
  bool dsign = dt * (dx / std::fabs(dx)) < 0.0;
  if (brackt) {
    if (t <= std::fmin(x, y) || std::fmax(x, y) <= t)
      return LS_OUT_OF_INTERVAL;
    if (0.0 <= dx * (t - x)) return LS_INCREASE_GRADIENT;
    if (tmax < tmin) return LS_INVALID_INTERVAL;
  }

  double newt = 0.0;
  bool bound = false;
  if (fx < ft) {
    // higher trial value: minimum bracketed between x and t
    brackt = true;
    bound = true;
    double mc = cubic_min(x, fx, dx, t, ft, dt);
    double mq = quad_min(x, fx, dx, t, ft);
    newt = std::fabs(mc - x) < std::fabs(mq - x) ? mc : mc + 0.5 * (mq - mc);
  } else if (dsign) {
    // lower value, derivative sign flipped: bracketed
    brackt = true;
    bound = false;
    double mc = cubic_min(x, fx, dx, t, ft, dt);
    double mq = quad_min_secant(x, dx, t, dt);
    newt = std::fabs(mc - t) > std::fabs(mq - t) ? mc : mq;
  } else if (std::fabs(dt) < std::fabs(dx)) {
    // lower value, same sign, derivative magnitude shrinking
    bound = true;
    double mc = cubic_min_clamped(x, fx, dx, t, ft, dt, tmin, tmax);
    double mq = quad_min_secant(x, dx, t, dt);
    if (brackt)
      newt = std::fabs(t - mc) < std::fabs(t - mq) ? mc : mq;
    else
      newt = std::fabs(t - mc) > std::fabs(t - mq) ? mc : mq;
  } else {
    // lower value, same sign, derivative magnitude growing
    bound = false;
    if (brackt)
      newt = cubic_min(t, ft, dt, y, fy, dy);
    else
      newt = x < t ? tmax : tmin;
  }

  // endpoint update (reference src/line.rs:555-579)
  if (fx < ft) {
    y = t;
    fy = ft;
    dy = dt;
  } else {
    if (dsign) {
      y = x;
      fy = fx;
      dy = dx;
    }
    x = t;
    fx = ft;
    dx = dt;
  }

  if (newt > tmax) newt = tmax;
  if (newt < tmin) newt = tmin;

  // keep the trial away from the far endpoint when bracketed
  if (brackt && bound) {
    double mq = x + 0.66 * (y - x);
    if (x < y) {
      if (mq < newt) newt = mq;
    } else if (newt < mq) {
      newt = mq;
    }
  }
  t = newt;
  return 0;
}

// ---------------------------------------------------------------------
// More-Thuente search (reference src/line.rs:226-399)
// ---------------------------------------------------------------------
int32_t morethuente(Workspace& w, double& stp, int64_t& ncall) {
  const Config& c = w.cfg;
  double dginit = seq_dot(w.gx.data(), w.d.data(), w.n);

  bool brackt = false;
  bool stage1 = true;
  int uinfo = 0;
  const double finit = w.fx;
  const double dgtest = c.ftol * dginit;
  double width = c.max_step - c.min_step;
  double prev_width = 2.0 * width;

  double stx = 0.0, sty = 0.0;
  double fxb = finit, fyb = finit;  // f at best / other endpoint
  double dgx = dginit, dgy = dginit;

  for (int count = 1; count < c.max_linesearch; ++count) {
    double stmin, stmax;
    if (brackt) {
      stmin = std::fmin(stx, sty);
      stmax = std::fmax(stx, sty);
    } else {
      stmin = stx;
      stmax = stp + 4.0 * (stp - stx);
    }
    if (stp < c.min_step) stp = c.min_step;
    if (stp > c.max_step) stp = c.max_step;

    bool unusual =
        (brackt && (stp <= stmin || stmax <= stp ||
                    c.max_linesearch <= count + 1 || uinfo != 0)) ||
        (brackt && stmax - stmin <= c.xtol * stmax);
    if (unusual) stp = stx;

    take_line_step(w, stp);
    int32_t ev = evaluate(w);
    if (ev) return ev;
    double f = w.fx;
    double dg = seq_dot(w.gx.data(), w.d.data(), w.n);
    double ftest1 = finit + stp * dgtest;

    if (brackt && (stp <= stmin || stmax <= stp || uinfo != 0))
      return LS_ROUNDING;
    if (brackt && stmax - stmin <= c.xtol * stmax) return LS_XTOL;
    if (stp == c.max_step && f <= ftest1 && dg <= dgtest) return LS_MAX_STEP;
    if (stp == c.min_step && (ftest1 < f || dgtest <= dg)) return LS_MIN_STEP;

    // curvature-only acceptance (reference quirk, src/line.rs:315-321)
    if (std::fabs(dg) <= c.gtol * (-dginit)) {
      ncall = count;
      return 0;
    }

    if (stage1 && f <= ftest1 && std::fmin(c.ftol, c.gtol) * dginit <= dg)
      stage1 = false;

    int32_t st;
    if (stage1 && ftest1 < f && f <= fxb) {
      // stage-1 modified function psi(a) = f(a) - ftol*a*dginit
      double fm = f - stp * dgtest;
      double fxm = fxb - stx * dgtest;
      double fym = fyb - sty * dgtest;
      double dgm = dg - dgtest;
      double dgxm = dgx - dgtest;
      double dgym = dgy - dgtest;
      st = update_trial_interval(stx, fxm, dgxm, sty, fym, dgym, stp, fm, dgm,
                                 stmin, stmax, brackt);
      fxb = fxm + stx * dgtest;
      fyb = fym + sty * dgtest;
      dgx = dgxm + dgtest;
      dgy = dgym + dgtest;
    } else {
      st = update_trial_interval(stx, fxb, dgx, sty, fyb, dgy, stp, f, dg,
                                 stmin, stmax, brackt);
    }
    if (st) return st;

    if (!brackt) continue;
    if (0.66 * prev_width <= std::fabs(sty - stx))
      stp = stx + 0.5 * (sty - stx);
    prev_width = width;
    width = std::fabs(sty - stx);
  }
  ncall = c.max_linesearch;  // exhausted == accepted (src/line.rs:395-398)
  return 0;
}

// ---------------------------------------------------------------------
// backtracking search (reference src/line.rs:716-784)
// ---------------------------------------------------------------------
int32_t backtracking(Workspace& w, double& stp, int64_t& ncall) {
  const Config& c = w.cfg;
  const bool ow = c.owlqn_enabled != 0;
  double dginit = ow ? seq_dot(w.pg.data(), w.d.data(), w.n)
                     : seq_dot(w.gx.data(), w.d.data(), w.n);
  const double dec = 0.5, inc = 2.1;
  const double finit = w.fx;
  const double dgtest = c.ftol * dginit;

  if (ow) {
    // choose the orthant for the new point (src/core.rs:167-180)
    for (int64_t i = 0; i < w.n; ++i)
      w.wp[i] = w.xp[i] == 0.0 ? msign(-w.pg[i]) : msign(w.xp[i]);
  }

  for (int count = 1; count < c.max_linesearch; ++count) {
    take_line_step(w, stp);
    int32_t ev = evaluate(w);
    if (ev) return ev;

    double width;
    if (w.fx > finit + stp * dgtest) {
      width = dec;
    } else if (c.ls_algo == BT_ARMIJO || ow) {
      ncall = count;
      return 0;
    } else {
      double dg = seq_dot(w.gx.data(), w.d.data(), w.n);
      if (dg < c.gtol * dginit) {
        width = inc;
      } else if (c.ls_algo == BT_WOLFE) {
        ncall = count;
        return 0;
      } else if (dg > -c.gtol * dginit) {
        width = dec;
      } else {
        ncall = count;
        return 0;
      }
    }

    if (c.gradient_only) {
      // literal quirk: unsatisfiable unless dginit == 0
      // (reference src/line.rs:768-774)
      double dg = seq_dot(w.gx.data(), w.d.data(), w.n);
      if (std::fabs(dg) <= -c.gtol * std::fabs(dginit)) {
        ncall = count;
        return 0;
      }
    }

    if (stp < c.min_step) return LS_MIN_STEP;
    if (stp > c.max_step) return LS_MAX_STEP;
    stp *= width;
  }
  ncall = c.max_linesearch;
  return 0;
}

// dispatcher with revert-on-error recovery (reference src/line.rs:193-223)
int32_t linesearch_find(Workspace& w, double& stp, int64_t& ncall) {
  const Config& c = w.cfg;
  bool use_mt = c.ls_algo == MORETHUENTE && !c.owlqn_enabled;
  int32_t st;
  if (use_mt && c.gradient_only) return ERR_EVAL_FAILED;  // config error
  if (use_mt)
    st = morethuente(w, stp, ncall);
  else
    st = backtracking(w, stp, ncall);
  if (st >= 10 && st < 20) {
    // internal line-search error: revert x,g to the previous point and
    // report 0 calls; fx keeps the last trial value (src/line.rs:213-220)
    std::memcpy(w.x.data(), w.xp.data(), w.n * sizeof(double));
    std::memcpy(w.gx.data(), w.gp.data(), w.n * sizeof(double));
    ncall = 0;
    return 0;
  }
  return st;
}

// correction-pair + damping (reference src/lbfgs.rs:640-692)
int32_t update_pair(Workspace& w, double step, double& gamma) {
  const int e = w.end;
  auto& s = w.S[e];
  auto& y = w.Y[e];
  for (int64_t i = 0; i < w.n; ++i) s[i] = w.x[i] - w.xp[i];
  if (seq_norm2(s.data(), w.n) == 0.0) return ERR_X_NOT_CHANGED;
  for (int64_t i = 0; i < w.n; ++i) y[i] = w.gx[i] - w.gp[i];

  double ys = seq_dot(y.data(), s.data(), w.n);
  double yy = seq_dot(y.data(), y.data(), w.n);
  if (yy == 0.0) return ERR_G_NOT_CHANGED;
  w.ys[e] = ys;                // stored pre-damping (parity)
  gamma = ys / yy;             // pre-damping gamma (parity)

  if (w.cfg.damping) {
    const double sigma2 = 0.6, sigma3 = 3.0;
    std::vector<double> bs(w.n);
    for (int64_t i = 0; i < w.n; ++i) bs[i] = -step * w.gp[i];
    double sbs = seq_dot(s.data(), bs.data(), w.n);
    if (ys < (1.0 - sigma2) * sbs) {
      double theta = sigma2 * sbs / (sbs - ys);
      for (int64_t i = 0; i < w.n; ++i)
        y[i] = (1.0 - theta) * bs[i] + theta * y[i];
    }
    // case 2 is a no-op in the reference (src/lbfgs.rs:681-685): parity.
  }
  return 0;
}

double gnorm_of(const Workspace& w) {
  return w.cfg.owlqn_enabled ? seq_norm2(w.pg.data(), w.n)
                             : seq_norm2(w.gx.data(), w.n);
}

}  // namespace

// ---------------------------------------------------------------------
// C API
// ---------------------------------------------------------------------
extern "C" {

struct NativeReport {
  double fx;
  double xnorm;
  double gnorm;
  int64_t neval;
  int64_t niter;
  int32_t status;
};

// progress callback: return nonzero to cancel
typedef int32_t (*ProgressFn)(int64_t niter, double fx, double xnorm,
                              double gnorm, double step, int64_t neval,
                              int64_t ncall, void* user);

int32_t lbfgs_native_minimize(int64_t n, double* x, EvalFn eval,
                              void* eval_user, ProgressFn progress,
                              void* progress_user, const Config* cfg,
                              NativeReport* out) {
  Workspace w;
  w.n = n;
  w.cfg = *cfg;
  w.eval = eval;
  w.user = eval_user;
  w.x.assign(x, x + n);
  w.gx.assign(n, 0.0);
  w.xp.assign(n, 0.0);
  w.gp.assign(n, 0.0);
  w.pg.assign(n, 0.0);
  w.wp.assign(n, 0.0);
  w.d.assign(n, 0.0);
  w.S.assign(w.cfg.m, std::vector<double>(n, 0.0));
  w.Y.assign(w.cfg.m, std::vector<double>(n, 0.0));
  w.ys.assign(w.cfg.m, 0.0);
  w.alpha.assign(w.cfg.m, 0.0);

  // build (reference src/lbfgs.rs:443-481)
  int32_t st = evaluate(w);
  if (st) goto done;
  {
    const double* gsrc = w.cfg.owlqn_enabled ? w.pg.data() : w.gx.data();
    for (int64_t i = 0; i < n; ++i) w.d[i] = -gsrc[i];
    w.step = w.cfg.initial_inverse_hessian / seq_norm2(w.d.data(), n);
  }

  // driver loop (reference src/lbfgs.rs:399-421, stop conditions :695-748)
  int64_t ncall;
  for (;;) {
    double gn = gnorm_of(w);
    double xn = seq_norm2(w.x.data(), n);
    if (w.cfg.max_iterations != 0 && w.k >= w.cfg.max_iterations) {
      st = MAX_ITERATIONS;
      break;
    }
    if (w.cfg.max_evaluations != 0 && w.neval >= w.cfg.max_evaluations) {
      st = MAX_EVALUATIONS;
      break;
    }
    if (gn / std::fmax(1.0, xn) <= w.cfg.epsilon) {
      st = CONVERGED;
      break;
    }

    w.k += 1;
    double step_ls = w.step;
    ncall = 0;
    if (w.k > 1) {
      // save state, search, update (reference src/lbfgs.rs:512-554)
      std::memcpy(w.xp.data(), w.x.data(), n * sizeof(double));
      std::memcpy(w.gp.data(), w.gx.data(), n * sizeof(double));

      st = linesearch_find(w, w.step, ncall);
      if (st) break;
      step_ls = w.step;

      double gamma;
      st = update_pair(w, w.step, gamma);
      if (st) break;

      const double* gsrc = w.cfg.owlqn_enabled ? w.pg.data() : w.gx.data();
      for (int64_t i = 0; i < n; ++i) w.d[i] = -gsrc[i];
      // two-loop part 1, gamma scale, part 2
      {
        const int m = w.cfg.m;
        int j = (w.end + 1) % m;
        int64_t bound = std::min<int64_t>(m, w.k - 1);
        for (int64_t i = 0; i < bound; ++i) {
          j = (j + m - 1) % m;
          w.alpha[j] = seq_dot(w.S[j].data(), w.d.data(), n) / w.ys[j];
          for (int64_t t = 0; t < n; ++t) w.d[t] -= w.alpha[j] * w.Y[j][t];
        }
        for (int64_t t = 0; t < n; ++t) w.d[t] *= gamma;
        for (int64_t i = 0; i < bound; ++i) {
          double beta = seq_dot(w.Y[j].data(), w.d.data(), n) / w.ys[j];
          double coef = w.alpha[j] - beta;
          for (int64_t t = 0; t < n; ++t) w.d[t] += coef * w.S[j][t];
          j = (j + 1) % m;
        }
        w.end = (w.end + 1) % m;
      }

      double dnorm = seq_norm2(w.d.data(), n);
      if (!(dnorm >= 0.0)) {
        st = ERR_INVALID_DNORM;
        break;
      }
      w.step = w.cfg.constrain_step_size
                   ? std::fmin(w.cfg.max_step_size, dnorm) / dnorm
                   : 1.0;

      if (w.cfg.owlqn_enabled) {
        for (int64_t i = w.ow_start(); i < w.ow_end(); ++i)
          if (msign(w.d[i]) != msign(-w.pg[i])) w.d[i] = 0.0;
        if (seq_norm2(w.d.data(), n) == 0.0) {
          st = ERR_OWLQN_ZERO_DIRECTION;
          break;
        }
      }
    }

    if (progress) {
      int32_t cancel = progress(w.k, w.fx, seq_norm2(w.x.data(), n),
                                gnorm_of(w), step_ls, w.neval, ncall,
                                progress_user);
      if (cancel) {
        st = CANCELLED;
        break;
      }
    }
  }

done:
  std::memcpy(x, w.x.data(), n * sizeof(double));
  if (out) {
    out->fx = w.fx;
    out->xnorm = seq_norm2(w.x.data(), n);
    out->gnorm = gnorm_of(w);
    out->neval = w.neval;
    out->niter = w.k;
    out->status = st;
  }
  return st;
}

// default config helper so Python never hardcodes struct defaults
void lbfgs_native_default_config(Config* cfg) { *cfg = Config(); }

// built-in extended-Rosenbrock evaluator (pair form, a=1, b=10) so native
// baseline benchmarks avoid Python-callback overhead; semantics identical
// to the reference default objective (src/lib.rs:79-94)
double lbfgs_native_rosenbrock_eval(const double* x, double* g, int64_t n,
                                    void* /*user*/, int32_t* /*fail*/) {
  double fx = 0.0;
  for (int64_t i = 0; i + 1 < n; i += 2) {
    double t1 = 1.0 - x[i];
    double t2 = 10.0 * (x[i + 1] - x[i] * x[i]);
    g[i + 1] = 20.0 * t2;
    g[i] = -2.0 * (x[i] * g[i + 1] + t1);
    fx += t1 * t1 + t2 * t2;
  }
  return fx;
}

// expose the trial-interval update for cross-implementation fuzzing
// (tests/test_mcstep_fuzz.py compares the JAX branchless port against
// this sequential version on random inputs)
int32_t lbfgs_native_mcstep(double* x, double* fx, double* dx, double* y,
                            double* fy, double* dy, double* t, double ft,
                            double dt, double tmin, double tmax,
                            int32_t* brackt) {
  bool b = *brackt != 0;
  int32_t st = update_trial_interval(*x, *fx, *dx, *y, *fy, *dy, *t, ft, dt,
                                     tmin, tmax, b);
  *brackt = b ? 1 : 0;
  return st;
}

int32_t lbfgs_native_abi_version() { return 1; }

}  // extern "C"

// Native SE(3) pose-graph Levenberg-Marquardt solver (C ABI, ctypes-loaded).
//
// The runtime counterpart of the reference's g2o C++ stack
// (third_party/g2opy + slam/pose_graph_optimization.py:13-15): minimises
//   sum_e  r_e^T I_e r_e,   r_e = log( Z_e^{-1} X_i^{-1} X_j )
// over SE(3) vertex poses with Levenberg-Marquardt.
//
// Structure-exploiting linear algebra, self-contained (no Eigen):
//  * odometry edges (|i-j| small) land in a block-banded Hessian solved by
//    banded Cholesky in O(n * b^2);
//  * loop-closure edges contribute low-rank terms handled by the Woodbury
//    identity (one small dense solve of size 6*L for L loop edges);
//  * LM damping with accept/reject on the true error.
//
// Build: g++ -O3 -shared -fPIC -o libposegraph.so posegraph.cc
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

using std::size_t;

// ----------------------------------------------------------------- small mats
struct Mat4 {
  double m[16];
  double& at(int r, int c) { return m[r * 4 + c]; }
  double at(int r, int c) const { return m[r * 4 + c]; }
};

Mat4 identity4() {
  Mat4 out{};
  out.at(0, 0) = out.at(1, 1) = out.at(2, 2) = out.at(3, 3) = 1.0;
  return out;
}

Mat4 mul(const Mat4& a, const Mat4& b) {
  Mat4 out{};
  for (int i = 0; i < 4; ++i)
    for (int k = 0; k < 4; ++k) {
      double aik = a.at(i, k);
      for (int j = 0; j < 4; ++j) out.at(i, j) += aik * b.at(k, j);
    }
  return out;
}

Mat4 se3_inverse(const Mat4& T) {
  // [R t; 0 1]^-1 = [R^T -R^T t; 0 1]
  Mat4 out = identity4();
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) out.at(i, j) = T.at(j, i);
  for (int i = 0; i < 3; ++i) {
    double s = 0;
    for (int j = 0; j < 3; ++j) s += T.at(j, i) * T.at(j, 3);
    out.at(i, 3) = -s;
  }
  return out;
}

// ------------------------------------------------------------------ SE(3) map
void so3_log(const Mat4& T, double w[3]) {
  double tr = T.at(0, 0) + T.at(1, 1) + T.at(2, 2);
  double c = 0.5 * (tr - 1.0);
  c = c > 1.0 ? 1.0 : (c < -1.0 ? -1.0 : c);
  double angle = std::acos(c);
  double skew[3] = {T.at(2, 1) - T.at(1, 2), T.at(0, 2) - T.at(2, 0),
                    T.at(1, 0) - T.at(0, 1)};
  if (angle < 1e-7) {
    for (int i = 0; i < 3; ++i) w[i] = 0.5 * skew[i];
    return;
  }
  if (angle > M_PI - 1e-5) {
    // near pi: use the diagonal to recover the axis robustly
    double ax[3];
    for (int i = 0; i < 3; ++i)
      ax[i] = std::sqrt(std::max(0.0, (T.at(i, i) - c) / (1.0 - c)));
    // fix signs from the skew part (sign(skew) == sign(axis * sin) ~ 0 here,
    // use off-diagonal sums instead)
    if (T.at(1, 0) + T.at(0, 1) < 0) ax[1] = -ax[1];
    if (T.at(2, 0) + T.at(0, 2) < 0) ax[2] = -ax[2];
    if (ax[0] < 0) { ax[0] = -ax[0]; ax[1] = -ax[1]; ax[2] = -ax[2]; }
    for (int i = 0; i < 3; ++i) w[i] = angle * ax[i];
    return;
  }
  double s = angle / (2.0 * std::sin(angle));
  for (int i = 0; i < 3; ++i) w[i] = s * skew[i];
}

void se3_log(const Mat4& T, double xi[6]) {  // xi = (v, w)
  double w[3];
  so3_log(T, w);
  double theta2 = w[0] * w[0] + w[1] * w[1] + w[2] * w[2];
  double theta = std::sqrt(theta2);
  // V^{-1} = I - W/2 + coef W^2
  double coef;
  if (theta < 1e-4) {
    coef = 1.0 / 12.0 + theta2 / 720.0;
  } else {
    double half = theta / 2.0;
    coef = (1.0 - half * std::cos(half) / std::sin(half)) / theta2;
  }
  double W[9] = {0, -w[2], w[1], w[2], 0, -w[0], -w[1], w[0], 0};
  double W2[9];
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double s = 0;
      for (int k = 0; k < 3; ++k) s += W[i * 3 + k] * W[k * 3 + j];
      W2[i * 3 + j] = s;
    }
  double Vinv[9];
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j)
      Vinv[i * 3 + j] =
          (i == j ? 1.0 : 0.0) - 0.5 * W[i * 3 + j] + coef * W2[i * 3 + j];
  for (int i = 0; i < 3; ++i) {
    double s = 0;
    for (int j = 0; j < 3; ++j) s += Vinv[i * 3 + j] * T.at(j, 3);
    xi[i] = s;
    xi[3 + i] = w[i];
  }
}

Mat4 se3_exp(const double xi[6]) {
  const double* v = xi;
  const double* w = xi + 3;
  double theta2 = w[0] * w[0] + w[1] * w[1] + w[2] * w[2];
  double theta = std::sqrt(theta2);
  double A, B, C;
  if (theta < 1e-4) {
    A = 1.0 - theta2 / 6.0;
    B = 0.5 - theta2 / 24.0;
    C = 1.0 / 6.0 - theta2 / 120.0;
  } else {
    A = std::sin(theta) / theta;
    double sh = std::sin(theta / 2.0);
    B = 2.0 * sh * sh / theta2;
    C = (1.0 - A) / theta2;
  }
  double W[9] = {0, -w[2], w[1], w[2], 0, -w[0], -w[1], w[0], 0};
  double W2[9];
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double s = 0;
      for (int k = 0; k < 3; ++k) s += W[i * 3 + k] * W[k * 3 + j];
      W2[i * 3 + j] = s;
    }
  Mat4 T = identity4();
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j)
      T.at(i, j) = (i == j ? 1.0 : 0.0) + A * W[i * 3 + j] + B * W2[i * 3 + j];
  for (int i = 0; i < 3; ++i) {
    double s = 0;
    for (int j = 0; j < 3; ++j) {
      double V = (i == j ? 1.0 : 0.0) + B * W[i * 3 + j] + C * W2[i * 3 + j];
      s += V * v[j];
    }
    T.at(i, 3) = s;
  }
  return T;
}

// ------------------------------------------------------------------ residuals
void edge_residual(const Mat4& Xi, const Mat4& Xj, const Mat4& Zinv,
                   double r[6]) {
  Mat4 d = mul(Zinv, mul(se3_inverse(Xi), Xj));
  se3_log(d, r);
}

// numeric Jacobian of r wrt left-multiplied tangent deltas of (Xi, Xj)
void edge_jacobian(const Mat4& Xi, const Mat4& Xj, const Mat4& Zinv,
                   double J[6 * 12]) {
  const double eps = 1e-6;
  double rp[6], rm[6];
  for (int k = 0; k < 12; ++k) {
    double d[6] = {0, 0, 0, 0, 0, 0};
    Mat4 Xip = Xi, Xjp = Xj, Xim = Xi, Xjm = Xj;
    int local = k % 6;
    d[local] = eps;
    Mat4 dp = se3_exp(d);
    d[local] = -eps;
    Mat4 dm = se3_exp(d);
    if (k < 6) {
      Xip = mul(dp, Xi);
      Xim = mul(dm, Xi);
    } else {
      Xjp = mul(dp, Xj);
      Xjm = mul(dm, Xj);
    }
    edge_residual(Xip, Xjp, Zinv, rp);
    edge_residual(Xim, Xjm, Zinv, rm);
    for (int r = 0; r < 6; ++r) J[r * 12 + k] = (rp[r] - rm[r]) / (2 * eps);
  }
}

// ---------------------------------------------------------- dense small solve
// Cholesky solve of an SPD matrix (row-major), in-place on A; x = solution.
bool cholesky_solve(std::vector<double>& A, std::vector<double>& b, int n) {
  // factor A = L L^T
  for (int i = 0; i < n; ++i) {
    for (int j = 0; j <= i; ++j) {
      double s = A[i * n + j];
      for (int k = 0; k < j; ++k) s -= A[i * n + k] * A[j * n + k];
      if (i == j) {
        if (s <= 0) return false;
        A[i * n + i] = std::sqrt(s);
      } else {
        A[i * n + j] = s / A[j * n + j];
      }
    }
  }
  // forward/back substitution
  for (int i = 0; i < n; ++i) {
    double s = b[i];
    for (int k = 0; k < i; ++k) s -= A[i * n + k] * b[k];
    b[i] = s / A[i * n + i];
  }
  for (int i = n - 1; i >= 0; --i) {
    double s = b[i];
    for (int k = i + 1; k < n; ++k) s -= A[k * n + i] * b[k];
    b[i] = s / A[i * n + i];
  }
  return true;
}

// --------------------------------------------------------------- banded solve
// Banded SPD matrix with (block) bandwidth bw (scalar band half-width).
// Storage: band[i][d] = A(i, i+d) for d in [0, bw].
struct Banded {
  int n, bw;
  std::vector<double> a;  // (n) x (bw+1), upper band by row
  double& at(int i, int d) { return a[(size_t)i * (bw + 1) + d]; }
  double at(int i, int d) const { return a[(size_t)i * (bw + 1) + d]; }
};

// in-place banded Cholesky (A = L L^T with L lower-banded); returns false if
// not SPD.  After factor(), solve() performs forward/back substitution.
bool banded_factor(Banded& A) {
  for (int j = 0; j < A.n; ++j) {
    double d = A.at(j, 0);
    for (int k = std::max(0, j - A.bw); k < j; ++k) {
      double l = A.at(k, j - k);
      d -= l * l;
    }
    if (d <= 0) return false;
    d = std::sqrt(d);
    A.at(j, 0) = d;
    int last = std::min(A.n - 1, j + A.bw);
    for (int i = j + 1; i <= last; ++i) {
      double s = A.at(j, i - j);
      for (int k = std::max({0, i - A.bw, j - A.bw}); k < j; ++k) {
        if (i - k <= A.bw) s -= A.at(k, i - k) * A.at(k, j - k);
      }
      A.at(j, i - j) = s / d;
    }
  }
  return true;
}

void banded_solve(const Banded& L, double* x) {
  // L is stored as rows of the factor's columns: L(i, j) with i>=j is at
  // a[j][i-j].  Forward solve L y = x, then back solve L^T x = y.
  for (int i = 0; i < L.n; ++i) {
    double s = x[i];
    for (int k = std::max(0, i - L.bw); k < i; ++k) s -= L.at(k, i - k) * x[k];
    x[i] = s / L.at(i, 0);
  }
  for (int i = L.n - 1; i >= 0; --i) {
    double s = x[i];
    int last = std::min(L.n - 1, i + L.bw);
    for (int k = i + 1; k <= last; ++k) s -= L.at(i, k - i) * x[k];
    x[i] = s / L.at(i, 0);
  }
}

struct Edge {
  int i, j;
  Mat4 Zinv;
  double info[36];
  bool banded;  // folded into the banded part vs handled by Woodbury
};

double graph_error(const std::vector<Mat4>& poses,
                   const std::vector<Edge>& edges) {
  double total = 0;
  double r[6];
  for (const Edge& e : edges) {
    edge_residual(poses[e.i], poses[e.j], e.Zinv, r);
    for (int a = 0; a < 6; ++a)
      for (int b = 0; b < 6; ++b) total += r[a] * e.info[a * 6 + b] * r[b];
  }
  return total;
}

}  // namespace

extern "C" {

// Optimise the pose graph.  Returns 0 on success.
//   poses:        n * 16 doubles (row-major 4x4), in/out
//   fixed:        n bytes (1 = fixed)
//   edges_ij:     m * 2 ints
//   measurements: m * 16 doubles (Z, maps j into i frame)
//   information:  m * 36 doubles (6x6)
//   out_error:    final total weighted squared error
int pose_graph_optimize(int n, double* poses, const uint8_t* fixed, int m,
                        const int* edges_ij, const double* measurements,
                        const double* information, int max_iterations,
                        double* out_error) {
  if (n <= 0 || m <= 0) return 1;
  std::vector<Mat4> X(n);
  for (int i = 0; i < n; ++i) std::memcpy(X[i].m, poses + 16 * i, 16 * 8);

  // band width: widest banded edge span (loop edges go to Woodbury)
  const int kMaxBandSpan = 8;
  std::vector<Edge> edges(m);
  std::vector<int> loop_edges;
  int band_span = 1;
  for (int e = 0; e < m; ++e) {
    Edge& E = edges[e];
    E.i = edges_ij[2 * e];
    E.j = edges_ij[2 * e + 1];
    if (E.i < 0 || E.i >= n || E.j < 0 || E.j >= n) return 2;
    Mat4 Z;
    std::memcpy(Z.m, measurements + 16 * e, 16 * 8);
    E.Zinv = se3_inverse(Z);
    std::memcpy(E.info, information + 36 * e, 36 * 8);
    int span = std::abs(E.i - E.j);
    E.banded = span <= kMaxBandSpan;
    if (E.banded)
      band_span = std::max(band_span, span);
    else
      loop_edges.push_back(e);
  }
  const int N = 6 * n;
  const int bw = 6 * band_span + 5;
  const int L = (int)loop_edges.size();

  double lambda = 1e-4;
  double err = graph_error(X, edges);

  std::vector<double> J(6 * 12), r(6), b(N), diag(N);
  std::vector<double> U;  // N x 6L dense (loop-edge jacobian columns)

  for (int it = 0; it < max_iterations; ++it) {
    // ---- assemble banded H and rhs b = -J^T I r ----
    Banded H;
    H.n = N;
    H.bw = bw;
    H.a.assign((size_t)N * (bw + 1), 0.0);
    std::fill(b.begin(), b.end(), 0.0);
    U.assign((size_t)N * 6 * L, 0.0);

    int li = 0;
    for (int e = 0; e < m; ++e) {
      const Edge& E = edges[e];
      edge_residual(X[E.i], X[E.j], E.Zinv, r.data());
      edge_jacobian(X[E.i], X[E.j], E.Zinv, J.data());
      // weighted jacobian: WJ = I * J  (6x12), Hblk = J^T WJ (12x12)
      double WJ[6 * 12];
      for (int a = 0; a < 6; ++a)
        for (int c = 0; c < 12; ++c) {
          double s = 0;
          for (int k = 0; k < 6; ++k) s += E.info[a * 6 + k] * J[k * 12 + c];
          WJ[a * 12 + c] = s;
        }
      int rows[12];
      for (int k = 0; k < 6; ++k) rows[k] = 6 * E.i + k;
      for (int k = 0; k < 6; ++k) rows[6 + k] = 6 * E.j + k;
      // rhs
      for (int c = 0; c < 12; ++c) {
        double s = 0;
        for (int a = 0; a < 6; ++a) {
          double wr = 0;
          for (int k = 0; k < 6; ++k) wr += E.info[a * 6 + k] * r[k];
          s += J[a * 12 + c] * wr;
        }
        b[rows[c]] -= s;
      }
      if (E.banded) {
        for (int c1 = 0; c1 < 12; ++c1)
          for (int c2 = 0; c2 < 12; ++c2) {
            int r1 = rows[c1], r2 = rows[c2];
            if (r2 < r1 || r2 - r1 > bw) continue;
            double s = 0;
            for (int a = 0; a < 6; ++a) s += J[a * 12 + c1] * WJ[a * 12 + c2];
            H.at(r1, r2 - r1) += s;
          }
      } else {
        // Woodbury columns: U_e = J^T * chol(I)  -> store W^{1/2}-weighted
        // jacobian so H_loop = U U^T.  Use Cholesky of the 6x6 info.
        double G[36] = {0};
        {
          double A[36];
          std::memcpy(A, E.info, sizeof(A));
          for (int i2 = 0; i2 < 6; ++i2)
            for (int j2 = 0; j2 <= i2; ++j2) {
              double s = A[i2 * 6 + j2];
              for (int k = 0; k < j2; ++k) s -= G[i2 * 6 + k] * G[j2 * 6 + k];
              if (i2 == j2)
                G[i2 * 6 + i2] = std::sqrt(std::max(s, 1e-12));
              else
                G[i2 * 6 + j2] = s / G[j2 * 6 + j2];
            }
        }
        // U columns: J^T G  (12 x 6) scattered into rows
        for (int c = 0; c < 6; ++c) {
          for (int c1 = 0; c1 < 12; ++c1) {
            double s = 0;
            for (int a = 0; a < 6; ++a) s += J[a * 12 + c1] * G[a * 6 + c];
            U[(size_t)rows[c1] * 6 * L + (li * 6 + c)] += s;
          }
        }
        ++li;
      }
    }

    // LM damping + fixed-vertex pinning
    for (int i = 0; i < N; ++i) diag[i] = H.at(i, 0);
    for (int i = 0; i < N; ++i) {
      double d = diag[i];
      // also account for loop-edge diagonal contribution in the damping
      if (L) {
        for (int c = 0; c < 6 * L; ++c) {
          double u = U[(size_t)i * 6 * L + c];
          d += u * u;
        }
      }
      H.at(i, 0) += lambda * std::max(d, 1e-8) + 1e-10;
    }
    for (int v = 0; v < n; ++v) {
      if (!fixed[v]) continue;
      for (int k = 0; k < 6; ++k) {
        int row = 6 * v + k;
        // zero the row/col within the band, set diagonal 1, rhs 0
        for (int d = 1; d <= bw; ++d) {
          if (row + d < N) H.at(row, d) = 0.0;
          if (row - d >= 0) H.at(row - d, d) = 0.0;
        }
        H.at(row, 0) = 1.0;
        b[row] = 0.0;
        if (L)
          for (int c = 0; c < 6 * L; ++c) U[(size_t)row * 6 * L + c] = 0.0;
      }
    }

    // ---- solve (B + U U^T) delta = b via Woodbury ----
    Banded Hf = H;
    if (!banded_factor(Hf)) {
      lambda *= 10;
      continue;
    }
    std::vector<double> delta(b);
    banded_solve(Hf, delta.data());  // delta = B^{-1} b
    if (L) {
      int K = 6 * L;
      // Y = B^{-1} U   (N x K)
      std::vector<double> Y((size_t)N * K);
      std::vector<double> col(N);
      for (int c = 0; c < K; ++c) {
        for (int i = 0; i < N; ++i) col[i] = U[(size_t)i * K + c];
        banded_solve(Hf, col.data());
        for (int i = 0; i < N; ++i) Y[(size_t)i * K + c] = col[i];
      }
      // S = I + U^T Y   (K x K)
      std::vector<double> S((size_t)K * K, 0.0);
      for (int a = 0; a < K; ++a) S[a * K + a] = 1.0;
      for (int i = 0; i < N; ++i)
        for (int a = 0; a < K; ++a) {
          double u = U[(size_t)i * K + a];
          if (u == 0) continue;
          for (int c = 0; c < K; ++c) S[a * K + c] += u * Y[(size_t)i * K + c];
        }
      // t = U^T delta; solve S z = t; delta -= Y z
      std::vector<double> t(K, 0.0);
      for (int i = 0; i < N; ++i) {
        double d = delta[i];
        if (d == 0) continue;
        for (int a = 0; a < K; ++a) t[a] += U[(size_t)i * K + a] * d;
      }
      if (!cholesky_solve(S, t, K)) {
        lambda *= 10;
        continue;
      }
      for (int i = 0; i < N; ++i) {
        double s = 0;
        for (int a = 0; a < K; ++a) s += Y[(size_t)i * K + a] * t[a];
        delta[i] -= s;
      }
    }

    // ---- tentative update + accept/reject ----
    std::vector<Mat4> Xn(n);
    for (int v = 0; v < n; ++v) {
      if (fixed[v]) {
        Xn[v] = X[v];
        continue;
      }
      Xn[v] = mul(se3_exp(&delta[6 * v]), X[v]);
    }
    double new_err = graph_error(Xn, edges);
    if (new_err < err) {
      bool converged = (err - new_err) < 1e-9 * std::max(err, 1e-30);
      X.swap(Xn);
      err = new_err;
      lambda = std::max(lambda * 0.5, 1e-9);
      // g2o-style early termination: an accepted step stopped improving
      if (converged) break;
    } else {
      // damping saturated: the graph is stuck, further iterations are no-ops
      if (lambda >= 1e6) break;
      lambda = std::min(lambda * 4.0, 1e6);
    }
  }

  for (int i = 0; i < n; ++i) std::memcpy(poses + 16 * i, X[i].m, 16 * 8);
  if (out_error) *out_error = err;
  return 0;
}

double pose_graph_error(int n, const double* poses, int m, const int* edges_ij,
                        const double* measurements, const double* information) {
  std::vector<Mat4> X(n);
  for (int i = 0; i < n; ++i) std::memcpy(X[i].m, poses + 16 * i, 16 * 8);
  std::vector<Edge> edges(m);
  for (int e = 0; e < m; ++e) {
    edges[e].i = edges_ij[2 * e];
    edges[e].j = edges_ij[2 * e + 1];
    Mat4 Z;
    std::memcpy(Z.m, measurements + 16 * e, 16 * 8);
    edges[e].Zinv = se3_inverse(Z);
    std::memcpy(edges[e].info, information + 36 * e, 36 * 8);
  }
  return graph_error(X, edges);
}

}  // extern "C"

// Self-contained two-view geometry RANSAC library.
//
// Native host-side replacement for the reference's C++ dependencies
// (poselib `estimate_relative_pose`, OpenCV findEssentialMat/recoverPose/
// findHomography — reference romatch/utils/utils.py:30-75,
// benchmarks/megadepth_pose_estimation_benchmark_poselib.py:78-84).
//
// Implements:
//   * essential-matrix RANSAC on normalized image coordinates (8-point
//     solver + rank-2 / equal-singular-value projection, Sampson scoring,
//     local refit on inliers),
//   * pose recovery (4-way decomposition + cheirality via midpoint
//     triangulation),
//   * homography RANSAC (normalized DLT, symmetric transfer scoring).
//
// No external deps: small fixed-size linear algebra (Jacobi eigen-solver on
// A^T A) is implemented inline. Exposed as a C ABI for ctypes.
//
// Build: make -C native/ransac   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <random>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Small dense linear algebra
// ---------------------------------------------------------------------------

// Jacobi eigen-decomposition of a symmetric n x n matrix (row-major).
// Eigenvalues ascending in w, eigenvectors in columns of V.
template <int N>
void jacobi_eigen(double A[N * N], double w[N], double V[N * N]) {
  for (int i = 0; i < N; ++i)
    for (int j = 0; j < N; ++j) V[i * N + j] = (i == j) ? 1.0 : 0.0;
  for (int sweep = 0; sweep < 100; ++sweep) {
    double off = 0;
    for (int p = 0; p < N; ++p)
      for (int q = p + 1; q < N; ++q) off += A[p * N + q] * A[p * N + q];
    if (off < 1e-24) break;
    for (int p = 0; p < N; ++p) {
      for (int q = p + 1; q < N; ++q) {
        double apq = A[p * N + q];
        if (std::fabs(apq) < 1e-30) continue;
        double app = A[p * N + p], aqq = A[q * N + q];
        double tau = (aqq - app) / (2 * apq);
        double t = (tau >= 0 ? 1.0 : -1.0) /
                   (std::fabs(tau) + std::sqrt(1 + tau * tau));
        double c = 1.0 / std::sqrt(1 + t * t), s = t * c;
        for (int k = 0; k < N; ++k) {
          double akp = A[k * N + p], akq = A[k * N + q];
          A[k * N + p] = c * akp - s * akq;
          A[k * N + q] = s * akp + c * akq;
        }
        for (int k = 0; k < N; ++k) {
          double apk = A[p * N + k], aqk = A[q * N + k];
          A[p * N + k] = c * apk - s * aqk;
          A[q * N + k] = s * apk + c * aqk;
        }
        for (int k = 0; k < N; ++k) {
          double vkp = V[k * N + p], vkq = V[k * N + q];
          V[k * N + p] = c * vkp - s * vkq;
          V[k * N + q] = s * vkp + c * vkq;
        }
      }
    }
  }
  // sort ascending
  int idx[N];
  for (int i = 0; i < N; ++i) idx[i] = i;
  std::sort(idx, idx + N,
            [&](int a, int b) { return A[a * N + a] < A[b * N + b]; });
  double Vs[N * N], ws[N];
  for (int i = 0; i < N; ++i) {
    ws[i] = A[idx[i] * N + idx[i]];
    for (int k = 0; k < N; ++k) Vs[k * N + i] = V[k * N + idx[i]];
  }
  std::memcpy(w, ws, sizeof(ws));
  std::memcpy(V, Vs, sizeof(Vs));
}

struct Mat3 {
  double m[9];
  double* operator[](int r) { return m + 3 * r; }
  const double* operator[](int r) const { return m + 3 * r; }
};

Mat3 matmul(const Mat3& a, const Mat3& b) {
  Mat3 c{};
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double s = 0;
      for (int k = 0; k < 3; ++k) s += a[i][k] * b[k][j];
      c[i][j] = s;
    }
  return c;
}

Mat3 transpose(const Mat3& a) {
  Mat3 t{};
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) t[i][j] = a[j][i];
  return t;
}

double det3(const Mat3& a) {
  return a[0][0] * (a[1][1] * a[2][2] - a[1][2] * a[2][1]) -
         a[0][1] * (a[1][0] * a[2][2] - a[1][2] * a[2][0]) +
         a[0][2] * (a[1][0] * a[2][1] - a[1][1] * a[2][0]);
}

// SVD of a 3x3 via eigen-decompositions of A^T A and A A^T with consistent
// signs: A = U diag(s) V^T, singular values descending.
void svd3(const Mat3& A, Mat3& U, double s[3], Mat3& V) {
  double ata[9], w[3], v[9];
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double acc = 0;
      for (int k = 0; k < 3; ++k) acc += A[k][i] * A[k][j];
      ata[i * 3 + j] = acc;
    }
  jacobi_eigen<3>(ata, w, v);
  // descending
  for (int c = 0; c < 3; ++c) {
    int src = 2 - c;
    s[c] = std::sqrt(std::max(0.0, w[src]));
    for (int r = 0; r < 3; ++r) V[r][c] = v[r * 3 + src];
  }
  // U columns = A v / s (Gram-Schmidt fallback for tiny s)
  for (int c = 0; c < 3; ++c) {
    double col[3] = {0, 0, 0};
    for (int r = 0; r < 3; ++r)
      for (int k = 0; k < 3; ++k) col[r] += A[r][k] * V[k][c];
    double n = std::sqrt(col[0] * col[0] + col[1] * col[1] + col[2] * col[2]);
    if (n < 1e-12) {
      // complete with cross product of previous columns
      if (c == 2) {
        col[0] = U[1][0] * U[2][1] - U[2][0] * U[1][1];
        col[1] = U[2][0] * U[0][1] - U[0][0] * U[2][1];
        col[2] = U[0][0] * U[1][1] - U[1][0] * U[0][1];
        n = std::sqrt(col[0] * col[0] + col[1] * col[1] + col[2] * col[2]);
      } else {
        col[c] = 1;
        n = 1;
      }
    }
    for (int r = 0; r < 3; ++r) U[r][c] = col[r] / n;
  }
}

// ---------------------------------------------------------------------------
// Essential matrix estimation
// ---------------------------------------------------------------------------

// 8-point (least squares over >= 8 correspondences) on normalized coords,
// projected to the essential manifold (singular values (s, s, 0)).
bool fit_essential(const double* x1, const double* x2, const int* idx, int n,
                   Mat3& E) {
  double ata[81];
  std::memset(ata, 0, sizeof(ata));
  for (int t = 0; t < n; ++t) {
    int i = idx ? idx[t] : t;
    double u1 = x1[2 * i], v1 = x1[2 * i + 1];
    double u2 = x2[2 * i], v2 = x2[2 * i + 1];
    double row[9] = {u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1,
                     v2,      u1,      v1, 1.0};
    for (int a = 0; a < 9; ++a)
      for (int b = 0; b < 9; ++b) ata[a * 9 + b] += row[a] * row[b];
  }
  double w[9], V[81];
  jacobi_eigen<9>(ata, w, V);
  Mat3 F{};
  for (int r = 0; r < 3; ++r)
    for (int c = 0; c < 3; ++c) F[r][c] = V[(3 * r + c) * 9 + 0];
  // project to essential: singular values -> (m, m, 0)
  Mat3 U{}, Vt{};
  double s[3];
  svd3(F, U, s, Vt);  // Vt holds V (columns)
  double m = (s[0] + s[1]) / 2;
  Mat3 S{};
  S[0][0] = m;
  S[1][1] = m;
  S[2][2] = 0;
  E = matmul(matmul(U, S), transpose(Vt));
  return true;
}

double sampson_sq(const Mat3& E, const double* p1, const double* p2) {
  double x1[3] = {p1[0], p1[1], 1.0};
  double x2[3] = {p2[0], p2[1], 1.0};
  double Ex1[3], Etx2[3];
  for (int r = 0; r < 3; ++r) {
    Ex1[r] = E[r][0] * x1[0] + E[r][1] * x1[1] + E[r][2] * x1[2];
    Etx2[r] = E[0][r] * x2[0] + E[1][r] * x2[1] + E[2][r] * x2[2];
  }
  double x2tEx1 = x2[0] * Ex1[0] + x2[1] * Ex1[1] + x2[2] * Ex1[2];
  double denom =
      Ex1[0] * Ex1[0] + Ex1[1] * Ex1[1] + Etx2[0] * Etx2[0] + Etx2[1] * Etx2[1];
  if (denom < 1e-18) return 1e18;
  return x2tEx1 * x2tEx1 / denom;
}

// Midpoint-free cheirality: triangulate with DLT-lite and count points in
// front of both cameras for pose (R, t).
int count_cheiral(const Mat3& R, const double t[3], const double* x1,
                  const double* x2, const uint8_t* inl, int n) {
  int good = 0;
  for (int i = 0; i < n; ++i) {
    if (!inl[i]) continue;
    // direction vectors
    double f1[3] = {x1[2 * i], x1[2 * i + 1], 1.0};
    double f2c[3] = {x2[2 * i], x2[2 * i + 1], 1.0};
    // rotate f2 into frame 1: f2w = R^T f2
    double f2[3] = {
        R[0][0] * f2c[0] + R[1][0] * f2c[1] + R[2][0] * f2c[2],
        R[0][1] * f2c[0] + R[1][1] * f2c[1] + R[2][1] * f2c[2],
        R[0][2] * f2c[0] + R[1][2] * f2c[1] + R[2][2] * f2c[2],
    };
    // camera 2 center in frame 1: c2 = -R^T t
    double c2[3] = {
        -(R[0][0] * t[0] + R[1][0] * t[1] + R[2][0] * t[2]),
        -(R[0][1] * t[0] + R[1][1] * t[1] + R[2][1] * t[2]),
        -(R[0][2] * t[0] + R[1][2] * t[1] + R[2][2] * t[2]),
    };
    // solve [f1, -f2] [a; b] ~= c2 (least squares 3x2)
    double A00 = 0, A01 = 0, A11 = 0, b0 = 0, b1 = 0;
    for (int k = 0; k < 3; ++k) {
      A00 += f1[k] * f1[k];
      A01 += -f1[k] * f2[k];
      A11 += f2[k] * f2[k];
      b0 += f1[k] * c2[k];
      b1 += -f2[k] * c2[k];
    }
    double det = A00 * A11 - A01 * A01;
    if (std::fabs(det) < 1e-18) continue;
    double a = (A11 * b0 - A01 * b1) / det;
    double b = (A00 * b1 - A01 * b0) / det;
    // depth in camera 1 = a; depth in camera 2 = b (along f2 in frame 1)
    if (a > 0 && b > 0) ++good;
  }
  return good;
}

void decompose_E(const Mat3& E, Mat3 Rs[2], double ts[2][3]) {
  Mat3 U{}, V{};
  double s[3];
  svd3(E, U, s, V);
  if (det3(U) < 0)
    for (int r = 0; r < 3; ++r) U[r][2] = -U[r][2];
  if (det3(V) < 0)
    for (int r = 0; r < 3; ++r) V[r][2] = -V[r][2];
  Mat3 W{};
  W[0][1] = -1;
  W[1][0] = 1;
  W[2][2] = 1;
  Rs[0] = matmul(matmul(U, W), transpose(V));
  Rs[1] = matmul(matmul(U, transpose(W)), transpose(V));
  for (int k = 0; k < 2; ++k) {
    ts[k][0] = U[0][2];
    ts[k][1] = U[1][2];
    ts[k][2] = U[2][2];
  }
  ts[1][0] = -ts[1][0];
  ts[1][1] = -ts[1][1];
  ts[1][2] = -ts[1][2];
}

}  // namespace

extern "C" {

// test hook: least-squares essential fit on all n points
int debug_fit_essential(const double* x1, const double* x2, int n,
                        double* E_out) {
  Mat3 E{};
  if (!fit_essential(x1, x2, nullptr, n, E)) return 0;
  std::memcpy(E_out, E.m, 9 * sizeof(double));
  return 1;
}

// test hook: minimal fit through the idx path
int debug_fit_essential_idx(const double* x1, const double* x2,
                            const int* idx, int m, double* E_out) {
  Mat3 E{};
  if (!fit_essential(x1, x2, idx, m, E)) return 0;
  std::memcpy(E_out, E.m, 9 * sizeof(double));
  return 1;
}

// test hook: sampson distance^2 for one correspondence
double debug_sampson_sq(const double* E_in, const double* p1,
                        const double* p2) {
  Mat3 E{};
  std::memcpy(E.m, E_in, 9 * sizeof(double));
  return sampson_sq(E, p1, p2);
}

// Essential-matrix RANSAC + pose recovery on NORMALIZED image coordinates.
//   x1, x2: (n, 2) doubles; threshold: Sampson distance in normalized units;
//   outputs: R (3x3 row-major), t (3), inliers (n) uint8.
// Returns number of inliers (0 on failure).
int estimate_relative_pose(const double* x1, const double* x2, int n,
                           double threshold, int max_iters, uint64_t seed,
                           double* R_out, double* t_out, uint8_t* inliers_out) {
  if (n < 8) return 0;
  std::mt19937_64 rng(seed);
  std::uniform_int_distribution<int> uni(0, n - 1);
  double thr_sq = threshold * threshold;

  Mat3 best_E{};
  int best_inl = -1;
  std::vector<uint8_t> inl(n), best_mask(n, 0);
  int idx[8];
  double log_conf = std::log(1 - 0.99999);
  int iters = max_iters;
  for (int it = 0; it < iters; ++it) {
    // sample 8 distinct indices
    for (int k = 0; k < 8; ++k) {
      bool dup = true;
      while (dup) {
        idx[k] = uni(rng);
        dup = false;
        for (int j = 0; j < k; ++j) dup |= (idx[j] == idx[k]);
      }
    }
    Mat3 E{};
    if (!fit_essential(x1, x2, idx, 8, E)) continue;
    int cnt = 0;
    for (int i = 0; i < n; ++i) {
      bool ok = sampson_sq(E, x1 + 2 * i, x2 + 2 * i) < thr_sq;
      inl[i] = ok;
      cnt += ok;
    }
    if (cnt > best_inl) {
      best_inl = cnt;
      best_E = E;
      best_mask = inl;
      // adaptive termination (guard the double->int cast against overflow)
      double w = std::max(1e-9, double(cnt) / n);
      double denom = std::log(std::max(1e-12, 1 - std::pow(w, 8.0)));
      if (denom < 0) {
        double need = std::ceil(log_conf / denom);
        if (need < iters)
          iters = std::max(it + 1, int(need));
      }
    }
  }
  if (best_inl < 8) return 0;

  // local refit on inliers (up to 2 rounds)
  for (int round = 0; round < 2; ++round) {
    std::vector<int> ids;
    ids.reserve(best_inl);
    for (int i = 0; i < n; ++i)
      if (best_mask[i]) ids.push_back(i);
    if ((int)ids.size() < 8) break;
    Mat3 E{};
    fit_essential(x1, x2, ids.data(), (int)ids.size(), E);
    int cnt = 0;
    for (int i = 0; i < n; ++i) {
      bool ok = sampson_sq(E, x1 + 2 * i, x2 + 2 * i) < thr_sq;
      inl[i] = ok;
      cnt += ok;
    }
    if (cnt >= best_inl) {
      best_inl = cnt;
      best_E = E;
      best_mask = inl;
    } else {
      break;
    }
  }

  // pose recovery: 4 candidates, pick max cheirality
  Mat3 Rs[2];
  double ts[2][3];
  decompose_E(best_E, Rs, ts);
  int best_good = -1;
  Mat3 R_best = Rs[0];
  double t_best[3] = {ts[0][0], ts[0][1], ts[0][2]};
  for (int r = 0; r < 2; ++r) {
    for (int s = 0; s < 2; ++s) {
      int good =
          count_cheiral(Rs[r], ts[s], x1, x2, best_mask.data(), n);
      if (good > best_good) {
        best_good = good;
        R_best = Rs[r];
        std::memcpy(t_best, ts[s], sizeof(t_best));
      }
    }
  }
  std::memcpy(R_out, R_best.m, 9 * sizeof(double));
  std::memcpy(t_out, t_best, 3 * sizeof(double));
  std::memcpy(inliers_out, best_mask.data(), n);
  return best_inl;
}

// Homography RANSAC with normalized DLT and symmetric transfer scoring.
// x1, x2: (n, 2) pixel coords. H_out: 3x3 row-major. Returns inlier count.
int estimate_homography(const double* x1, const double* x2, int n,
                        double threshold, int max_iters, uint64_t seed,
                        double* H_out, uint8_t* inliers_out) {
  if (n < 4) return 0;
  std::mt19937_64 rng(seed);
  std::uniform_int_distribution<int> uni(0, n - 1);
  double thr_sq = threshold * threshold;

  auto fit_h = [&](const int* ids, int m, Mat3& H) -> bool {
    // Hartley normalization
    double c1[2] = {0, 0}, c2[2] = {0, 0};
    for (int t = 0; t < m; ++t) {
      int i = ids ? ids[t] : t;
      c1[0] += x1[2 * i];
      c1[1] += x1[2 * i + 1];
      c2[0] += x2[2 * i];
      c2[1] += x2[2 * i + 1];
    }
    for (int k = 0; k < 2; ++k) {
      c1[k] /= m;
      c2[k] /= m;
    }
    double s1 = 0, s2 = 0;
    for (int t = 0; t < m; ++t) {
      int i = ids ? ids[t] : t;
      s1 += std::hypot(x1[2 * i] - c1[0], x1[2 * i + 1] - c1[1]);
      s2 += std::hypot(x2[2 * i] - c2[0], x2[2 * i + 1] - c2[1]);
    }
    s1 = (s1 > 1e-12) ? std::sqrt(2.0) * m / s1 : 1.0;
    s2 = (s2 > 1e-12) ? std::sqrt(2.0) * m / s2 : 1.0;

    double ata[81];
    std::memset(ata, 0, sizeof(ata));
    for (int t = 0; t < m; ++t) {
      int i = ids ? ids[t] : t;
      double u = s1 * (x1[2 * i] - c1[0]), v = s1 * (x1[2 * i + 1] - c1[1]);
      double up = s2 * (x2[2 * i] - c2[0]), vp = s2 * (x2[2 * i + 1] - c2[1]);
      double r1[9] = {-u, -v, -1, 0, 0, 0, up * u, up * v, up};
      double r2[9] = {0, 0, 0, -u, -v, -1, vp * u, vp * v, vp};
      for (int a = 0; a < 9; ++a)
        for (int b = 0; b < 9; ++b)
          ata[a * 9 + b] += r1[a] * r1[b] + r2[a] * r2[b];
    }
    double w[9], V[81];
    jacobi_eigen<9>(ata, w, V);
    Mat3 Hn{};
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 3; ++c) Hn[r][c] = V[(3 * r + c) * 9 + 0];
    // denormalize: H = T2^-1 Hn T1
    Mat3 T1{}, T2inv{};
    T1[0][0] = s1;
    T1[1][1] = s1;
    T1[2][2] = 1;
    T1[0][2] = -s1 * c1[0];
    T1[1][2] = -s1 * c1[1];
    T2inv[0][0] = 1 / s2;
    T2inv[1][1] = 1 / s2;
    T2inv[2][2] = 1;
    T2inv[0][2] = c2[0];
    T2inv[1][2] = c2[1];
    H = matmul(matmul(T2inv, Hn), T1);
    if (std::fabs(H[2][2]) < 1e-12) return false;
    for (int k = 0; k < 9; ++k) H.m[k] /= H.m[8];
    return true;
  };

  auto transfer_sq = [&](const Mat3& H, int i) -> double {
    double u = x1[2 * i], v = x1[2 * i + 1];
    double wz = H[2][0] * u + H[2][1] * v + H[2][2];
    if (std::fabs(wz) < 1e-12) return 1e18;
    double px = (H[0][0] * u + H[0][1] * v + H[0][2]) / wz;
    double py = (H[1][0] * u + H[1][1] * v + H[1][2]) / wz;
    double dx = px - x2[2 * i], dy = py - x2[2 * i + 1];
    return dx * dx + dy * dy;
  };

  Mat3 best_H{};
  int best_inl = -1;
  std::vector<uint8_t> inl(n), best_mask(n, 0);
  int idx[4];
  int iters = max_iters;
  double log_conf = std::log(1 - 0.99999);
  for (int it = 0; it < iters; ++it) {
    for (int k = 0; k < 4; ++k) {
      bool dup = true;
      while (dup) {
        idx[k] = uni(rng);
        dup = false;
        for (int j = 0; j < k; ++j) dup |= (idx[j] == idx[k]);
      }
    }
    Mat3 H{};
    if (!fit_h(idx, 4, H)) continue;
    int cnt = 0;
    for (int i = 0; i < n; ++i) {
      bool ok = transfer_sq(H, i) < thr_sq;
      inl[i] = ok;
      cnt += ok;
    }
    if (cnt > best_inl) {
      best_inl = cnt;
      best_H = H;
      best_mask = inl;
      double w = std::max(1e-9, double(cnt) / n);
      double denom = std::log(std::max(1e-12, 1 - std::pow(w, 4.0)));
      if (denom < 0) {
        double need = std::ceil(log_conf / denom);
        if (need < iters)
          iters = std::max(it + 1, int(need));
      }
    }
  }
  if (best_inl < 4) return 0;
  // refit on inliers
  std::vector<int> ids;
  for (int i = 0; i < n; ++i)
    if (best_mask[i]) ids.push_back(i);
  Mat3 H{};
  if (fit_h(ids.data(), (int)ids.size(), H)) {
    int cnt = 0;
    for (int i = 0; i < n; ++i) {
      bool ok = transfer_sq(H, i) < thr_sq;
      inl[i] = ok;
      cnt += ok;
    }
    if (cnt >= best_inl) {
      best_inl = cnt;
      best_H = H;
      best_mask = inl;
    }
  }
  std::memcpy(H_out, best_H.m, 9 * sizeof(double));
  std::memcpy(inliers_out, best_mask.data(), n);
  return best_inl;
}

}  // extern "C"

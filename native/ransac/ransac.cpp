// Self-contained two-view geometry RANSAC library.
//
// Native host-side replacement for the reference's C++ dependencies
// (poselib `estimate_relative_pose`, OpenCV findEssentialMat/recoverPose/
// findHomography — reference romatch/utils/utils.py:30-75,
// benchmarks/megadepth_pose_estimation_benchmark_poselib.py:78-84).
//
// Implements:
//   * essential-matrix RANSAC on normalized image coordinates (minimal
//     5-point Nister solver for hypotheses — matching cv2.findEssentialMat /
//     poselib semantics, incl. planar scenes — with 8-point least-squares +
//     essential-manifold projection for the inlier refit; Sampson scoring),
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
#include <cstdio>
#include <cstdlib>
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
  // U columns = A v / s for the well-conditioned columns; the LAST column
  // must be completed by cross product whenever s3 is small RELATIVE to s1:
  // A v3 = s3 u3 + O(eps * s1 * v-error), so for rank-deficient inputs —
  // every essential matrix has s3 ~ 0, and u3 is exactly the translation
  // direction decompose_E extracts — normalizing A v3 amplifies eigenvector
  // noise into an arbitrary direction. (This was a real bug: RANSAC's BEST
  // hypotheses fit their inliers almost exactly, making s3 smallest and the
  // recovered t garbage precisely on the easiest inputs.)
  for (int c = 0; c < 3; ++c) {
    double col[3] = {0, 0, 0};
    for (int r = 0; r < 3; ++r)
      for (int k = 0; k < 3; ++k) col[r] += A[r][k] * V[k][c];
    double n = std::sqrt(col[0] * col[0] + col[1] * col[1] + col[2] * col[2]);
    if (c == 2 && n < 1e-6 * std::max(s[0], 1e-300)) {
      col[0] = U[1][0] * U[2][1] - U[2][0] * U[1][1];
      col[1] = U[2][0] * U[0][1] - U[0][0] * U[2][1];
      col[2] = U[0][0] * U[1][1] - U[1][0] * U[0][1];
      n = std::sqrt(col[0] * col[0] + col[1] * col[1] + col[2] * col[2]);
    } else if (n < 1e-12) {
      col[c] = 1;
      n = 1;
    }
    for (int r = 0; r < 3; ++r) U[r][c] = col[r] / n;
  }
}

// ---------------------------------------------------------------------------
// Real eigenvalues of a small unsymmetric matrix (balance + Hessenberg +
// Francis double-shift QR). Textbook algorithm; eigenvalues only.
// ---------------------------------------------------------------------------

template <int N>
void hessenberg(double a[N][N]) {
  for (int m = 1; m < N - 1; ++m) {
    double piv = 0;
    int i_piv = m;
    for (int j = m; j < N; ++j)
      if (std::fabs(a[j][m - 1]) > std::fabs(piv)) piv = a[j][m - 1], i_piv = j;
    if (i_piv != m) {
      for (int j = m - 1; j < N; ++j) std::swap(a[i_piv][j], a[m][j]);
      for (int j = 0; j < N; ++j) std::swap(a[j][i_piv], a[j][m]);
    }
    if (piv != 0.0) {
      for (int i = m + 1; i < N; ++i) {
        double y = a[i][m - 1];
        if (y != 0.0) {
          y /= piv;
          a[i][m - 1] = y;
          for (int j = m; j < N; ++j) a[i][j] -= y * a[m][j];
          for (int j = 0; j < N; ++j) a[j][m] += y * a[j][i];
        }
      }
    }
  }
  for (int i = 2; i < N; ++i)
    for (int j = 0; j < i - 1; ++j) a[i][j] = 0.0;
}

// Francis double-shift QR on an upper-Hessenberg matrix; returns eigenvalues
// (wr, wi). Follows the classic EISPACK "hqr" recipe.
template <int N>
bool hqr_eigenvalues(double a[N][N], double wr[N], double wi[N]) {
  double anorm = 0;
  for (int i = 0; i < N; ++i)
    for (int j = std::max(i - 1, 0); j < N; ++j) anorm += std::fabs(a[i][j]);
  int nn = N - 1;
  double t = 0.0;
  while (nn >= 0) {
    int its = 0;
    int l;
    do {
      for (l = nn; l >= 1; --l) {
        double s = std::fabs(a[l - 1][l - 1]) + std::fabs(a[l][l]);
        if (s == 0.0) s = anorm;
        if (std::fabs(a[l][l - 1]) + s == s) {
          a[l][l - 1] = 0.0;
          break;
        }
      }
      double x = a[nn][nn];
      if (l == nn) {  // one real root
        wr[nn] = x + t;
        wi[nn] = 0.0;
        --nn;
      } else {
        double y = a[nn - 1][nn - 1];
        double w = a[nn][nn - 1] * a[nn - 1][nn];
        if (l == nn - 1) {  // a 2x2 block
          double p = 0.5 * (y - x);
          double q = p * p + w;
          double zz = std::sqrt(std::fabs(q));
          x += t;
          if (q >= 0.0) {  // real pair
            zz = p + (p >= 0 ? zz : -zz);
            wr[nn - 1] = wr[nn] = x + zz;
            if (zz != 0.0) wr[nn] = x - w / zz;
            wi[nn - 1] = wi[nn] = 0.0;
          } else {  // complex pair
            wr[nn - 1] = wr[nn] = x + p;
            wi[nn - 1] = -(wi[nn] = zz);
          }
          nn -= 2;
        } else {  // no root yet: do a QR sweep
          if (its == 60) return false;
          double p = 0, q = 0, r = 0;
          if (its == 10 || its == 20) {  // exceptional shift
            t += x;
            for (int i = 0; i <= nn; ++i) a[i][i] -= x;
            double s = std::fabs(a[nn][nn - 1]) + std::fabs(a[nn - 1][nn - 2]);
            x = y = 0.75 * s;
            w = -0.4375 * s * s;
          }
          ++its;
          int m;
          for (m = nn - 2; m >= l; --m) {
            double zz = a[m][m];
            double rr = x - zz;
            double ss = y - zz;
            p = (rr * ss - w) / a[m + 1][m] + a[m][m + 1];
            q = a[m + 1][m + 1] - zz - rr - ss;
            r = a[m + 2][m + 1];
            double s = std::fabs(p) + std::fabs(q) + std::fabs(r);
            p /= s;
            q /= s;
            r /= s;
            if (m == l) break;
            double u = std::fabs(a[m][m - 1]) * (std::fabs(q) + std::fabs(r));
            double v = std::fabs(p) * (std::fabs(a[m - 1][m - 1]) +
                                       std::fabs(a[m][m]) +
                                       std::fabs(a[m + 1][m + 1]));
            if (u + v == v) break;
          }
          for (int i = m + 2; i <= nn; ++i) {
            a[i][i - 2] = 0.0;
            if (i != m + 2) a[i][i - 3] = 0.0;
          }
          for (int k = m; k <= nn - 1; ++k) {
            if (k != m) {
              p = a[k][k - 1];
              q = a[k + 1][k - 1];
              r = (k != nn - 1) ? a[k + 2][k - 1] : 0.0;
              x = std::fabs(p) + std::fabs(q) + std::fabs(r);
              if (x != 0.0) {
                p /= x;
                q /= x;
                r /= x;
              }
            }
            double s = std::sqrt(p * p + q * q + r * r);
            if (p < 0) s = -s;
            if (s == 0.0) continue;
            if (k == m) {
              if (l != m) a[k][k - 1] = -a[k][k - 1];
            } else {
              a[k][k - 1] = -s * x;
            }
            p += s;
            x = p / s;
            y = q / s;
            double zz = r / s;
            q /= p;
            r /= p;
            for (int j = k; j <= nn; ++j) {  // row modification
              p = a[k][j] + q * a[k + 1][j];
              if (k != nn - 1) {
                p += r * a[k + 2][j];
                a[k + 2][j] -= p * zz;
              }
              a[k + 1][j] -= p * y;
              a[k][j] -= p * x;
            }
            int mmin = (nn < k + 3) ? nn : k + 3;
            for (int i = l; i <= mmin; ++i) {  // column modification
              p = x * a[i][k] + y * a[i][k + 1];
              if (k != nn - 1) {
                p += zz * a[i][k + 2];
                a[i][k + 2] -= p * r;
              }
              a[i][k + 1] -= p * q;
              a[i][k] -= p;
            }
          }
        }
      }
    } while (l < nn - 1 && nn >= 0);
  }
  return true;
}

// ---------------------------------------------------------------------------
// Degree-<=3 trivariate polynomials for the 5-point solver
// ---------------------------------------------------------------------------

// coefficients c[i][j][k] of x^i y^j z^k, i + j + k <= 3
struct Poly3 {
  double c[4][4][4] = {};
};

Poly3 pmul(const Poly3& a, const Poly3& b) {
  Poly3 r;
  for (int i1 = 0; i1 < 4; ++i1)
    for (int j1 = 0; j1 + i1 < 4; ++j1)
      for (int k1 = 0; i1 + j1 + k1 < 4; ++k1) {
        double va = a.c[i1][j1][k1];
        if (va == 0.0) continue;
        for (int i2 = 0; i1 + i2 < 4; ++i2)
          for (int j2 = 0; i1 + i2 + j1 + j2 < 4; ++j2)
            for (int k2 = 0; i1 + i2 + j1 + j2 + k1 + k2 < 4; ++k2)
              r.c[i1 + i2][j1 + j2][k1 + k2] += va * b.c[i2][j2][k2];
      }
  return r;
}

Poly3 padd(const Poly3& a, const Poly3& b, double sb = 1.0) {
  Poly3 r;
  for (int i = 0; i < 4; ++i)
    for (int j = 0; j < 4; ++j)
      for (int k = 0; k < 4; ++k) r.c[i][j][k] = a.c[i][j][k] + sb * b.c[i][j][k];
  return r;
}

// monomial order: 10 "eliminated" degree-3 monomials, then the 10-dim
// quotient-ring basis [x2, xy, y2, xz, yz, z2, x, y, z, 1]
constexpr int MONOMIALS[20][3] = {
    {3, 0, 0}, {2, 1, 0}, {1, 2, 0}, {0, 3, 0}, {2, 0, 1},  // x3 x2y xy2 y3 x2z
    {1, 1, 1}, {0, 2, 1}, {1, 0, 2}, {0, 1, 2}, {0, 0, 3},  // xyz y2z xz2 yz2 z3
    {2, 0, 0}, {1, 1, 0}, {0, 2, 0}, {1, 0, 1}, {0, 1, 1},  // x2 xy y2 xz yz
    {0, 0, 2}, {1, 0, 0}, {0, 1, 0}, {0, 0, 1}, {0, 0, 0},  // z2 x y z 1
};

// 5-point minimal solver (Nister / Stewenius formulation): up to 10 real
// essential matrices through 5 normalized correspondences.
//   1. 4-dim null space of the 5x9 epipolar constraint matrix,
//   2. E = x E1 + y E2 + z E3 + E4; expand det(E) = 0 and
//      2 E E^T E - tr(E E^T) E = 0 into 10 cubics over 20 monomials,
//   3. Gauss-Jordan -> action matrix of multiplication-by-z on the
//      10-dim quotient ring, eigenvalues = candidate z,
//   4. back-substitute (x, y) from the eigenvector (null space of T - zI).
int five_point(const double* x1, const double* x2, const int* idx,
               Mat3 out[10]) {
  // --- null space of the 5x9 constraint matrix (via 9x9 A^T A) ---
  double ata[81];
  std::memset(ata, 0, sizeof(ata));
  for (int tIdx = 0; tIdx < 5; ++tIdx) {
    int i = idx ? idx[tIdx] : tIdx;
    double u1 = x1[2 * i], v1 = x1[2 * i + 1];
    double u2 = x2[2 * i], v2 = x2[2 * i + 1];
    double row[9] = {u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1,
                     v2,      u1,      v1, 1.0};
    for (int a = 0; a < 9; ++a)
      for (int b = 0; b < 9; ++b) ata[a * 9 + b] += row[a] * row[b];
  }
  double w[9], V[81];
  jacobi_eigen<9>(ata, w, V);  // ascending: columns 0..3 span the null space
  // E(x, y, z) entries as degree-1 polynomials
  Poly3 E[3][3];
  for (int r = 0; r < 3; ++r)
    for (int c = 0; c < 3; ++c) {
      int e = 3 * r + c;
      E[r][c].c[1][0][0] = V[e * 9 + 0];  // x * E1
      E[r][c].c[0][1][0] = V[e * 9 + 1];  // y * E2
      E[r][c].c[0][0][1] = V[e * 9 + 2];  // z * E3
      E[r][c].c[0][0][0] = V[e * 9 + 3];  // 1 * E4
    }

  // --- the 10 cubic constraints ---
  Poly3 eqs[10];
  // det(E) = 0
  eqs[0] = padd(
      padd(pmul(E[0][0], padd(pmul(E[1][1], E[2][2]), pmul(E[1][2], E[2][1]), -1.0)),
           pmul(E[0][1], padd(pmul(E[1][0], E[2][2]), pmul(E[1][2], E[2][0]), -1.0)),
           -1.0),
      pmul(E[0][2], padd(pmul(E[1][0], E[2][1]), pmul(E[1][1], E[2][0]), -1.0)));
  // 2 E E^T E - tr(E E^T) E = 0 (nine entries)
  Poly3 EEt[3][3];
  for (int r = 0; r < 3; ++r)
    for (int c = 0; c < 3; ++c) {
      Poly3 s;
      for (int k = 0; k < 3; ++k) s = padd(s, pmul(E[r][k], E[c][k]));
      EEt[r][c] = s;
    }
  Poly3 trace = padd(padd(EEt[0][0], EEt[1][1]), EEt[2][2]);
  for (int r = 0; r < 3; ++r)
    for (int c = 0; c < 3; ++c) {
      Poly3 s;
      for (int k = 0; k < 3; ++k) s = padd(s, pmul(EEt[r][k], E[k][c]));
      // 2 * (E E^T E) - trace * E
      Poly3 t2 = padd(s, s);
      eqs[1 + 3 * r + c] = padd(t2, pmul(trace, E[r][c]), -1.0);
    }

  // --- 10 x 20 coefficient matrix, Gauss-Jordan on the first 10 columns ---
  double M[10][20];
  for (int e = 0; e < 10; ++e)
    for (int m = 0; m < 20; ++m)
      M[e][m] = eqs[e].c[MONOMIALS[m][0]][MONOMIALS[m][1]][MONOMIALS[m][2]];
  for (int col = 0; col < 10; ++col) {
    int piv = col;
    for (int r = col + 1; r < 10; ++r)
      if (std::fabs(M[r][col]) > std::fabs(M[piv][col])) piv = r;
    if (std::fabs(M[piv][col]) < 1e-12) return 0;  // degenerate sample
    if (piv != col)
      for (int m = 0; m < 20; ++m) std::swap(M[piv][m], M[col][m]);
    double inv = 1.0 / M[col][col];
    for (int m = col; m < 20; ++m) M[col][m] *= inv;
    for (int r = 0; r < 10; ++r) {
      if (r == col) continue;
      double f = M[r][col];
      if (f == 0.0) continue;
      for (int m = col; m < 20; ++m) M[r][m] -= f * M[col][m];
    }
  }
  // rows now read: eliminated_monomial_e = -sum_j B[e][j] * basis_j
  double B[10][10];
  for (int e = 0; e < 10; ++e)
    for (int j = 0; j < 10; ++j) B[e][j] = M[e][10 + j];

  // --- action matrix of multiplication by z on the quotient basis ---
  // basis: [x2, xy, y2, xz, yz, z2, x, y, z, 1]
  // z*basis_i is either an eliminated monomial (rows of -B) or a basis elem.
  double T[10][10];
  std::memset(T, 0, sizeof(T));
  const int elim_row[6] = {4, 5, 6, 7, 8, 9};  // z*{x2,xy,y2,xz,yz,z2}
  for (int i = 0; i < 6; ++i)
    for (int j = 0; j < 10; ++j) T[i][j] = -B[elim_row[i]][j];
  T[6][3] = 1.0;  // z*x = xz
  T[7][4] = 1.0;  // z*y = yz
  T[8][5] = 1.0;  // z*z = z2
  T[9][8] = 1.0;  // z*1 = z
  double Twork[10][10];
  std::memcpy(Twork, T, sizeof(T));
  hessenberg<10>(Twork);
  double wr[10], wi[10];
  if (!hqr_eigenvalues<10>(Twork, wr, wi)) return 0;

  // --- back-substitution per real eigenvalue ---
  int n_out = 0;
  for (int e = 0; e < 10 && n_out < 10; ++e) {
    if (std::fabs(wi[e]) > 1e-8 * (1.0 + std::fabs(wr[e]))) continue;
    double z = wr[e];
    // eigenvector = null space of (T - z I): smallest eigenvector of
    // (T - zI)^T (T - zI)
    double D[10][10];
    std::memcpy(D, T, sizeof(T));
    for (int i = 0; i < 10; ++i) D[i][i] -= z;
    double dtd[100];
    std::memset(dtd, 0, sizeof(dtd));
    for (int i = 0; i < 10; ++i)
      for (int j = 0; j < 10; ++j) {
        double acc = 0;
        for (int k = 0; k < 10; ++k) acc += D[k][i] * D[k][j];
        dtd[i * 10 + j] = acc;
      }
    double dw[10], DV[100];
    jacobi_eigen<10>(dtd, dw, DV);
    double v[10];
    for (int i = 0; i < 10; ++i) v[i] = DV[i * 10 + 0];
    if (std::fabs(v[9]) < 1e-12) continue;  // solution at infinity
    double xs = v[6] / v[9], ys = v[7] / v[9];
    Mat3 Ecand{};
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 3; ++c) {
        int k = 3 * r + c;
        Ecand[r][c] = xs * V[k * 9 + 0] + ys * V[k * 9 + 1] +
                      z * V[k * 9 + 2] + V[k * 9 + 3];
      }
    // normalize Frobenius for stable thresholding downstream
    double nrm = 0;
    for (int k = 0; k < 9; ++k) nrm += Ecand.m[k] * Ecand.m[k];
    nrm = std::sqrt(nrm);
    if (nrm < 1e-12) continue;
    for (int k = 0; k < 9; ++k) Ecand.m[k] /= nrm;
    out[n_out++] = Ecand;
  }
  return n_out;
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

Mat3 skew3(const double t[3]) {
  Mat3 S{};
  S[0][1] = -t[2];
  S[0][2] = t[1];
  S[1][0] = t[2];
  S[1][2] = -t[0];
  S[2][0] = -t[1];
  S[2][1] = t[0];
  return S;
}

Mat3 exp_so3(const double w[3]) {
  double th = std::sqrt(w[0] * w[0] + w[1] * w[1] + w[2] * w[2]);
  Mat3 I{};
  I[0][0] = I[1][1] = I[2][2] = 1.0;
  if (th < 1e-12) return I;
  Mat3 K = skew3(w);
  double a = std::sin(th) / th;
  double b = (1 - std::cos(th)) / (th * th);
  Mat3 K2 = matmul(K, K);
  Mat3 R{};
  for (int k = 0; k < 9; ++k) R.m[k] = I.m[k] + a * K.m[k] + b * K2.m[k];
  return R;
}

// signed Sampson residual for E at correspondence i
double sampson_signed(const Mat3& E, const double* p1, const double* p2) {
  double x1[3] = {p1[0], p1[1], 1.0}, x2[3] = {p2[0], p2[1], 1.0};
  double Ex1[3], Etx2[3];
  for (int r = 0; r < 3; ++r) {
    Ex1[r] = E[r][0] * x1[0] + E[r][1] * x1[1] + E[r][2] * x1[2];
    Etx2[r] = E[0][r] * x2[0] + E[1][r] * x2[1] + E[2][r] * x2[2];
  }
  double num = x2[0] * Ex1[0] + x2[1] * Ex1[1] + x2[2] * Ex1[2];
  double den = Ex1[0] * Ex1[0] + Ex1[1] * Ex1[1] + Etx2[0] * Etx2[0] +
               Etx2[1] * Etx2[1];
  return num / std::sqrt(std::max(den, 1e-18));
}

// Levenberg-Marquardt refinement of (R, t) minimizing a robust (Huber)
// Sampson cost — the poselib-style non-linear polish the 5-point hypothesis
// lacks (critical on near-planar scenes where the hypothesis family is
// weakly constrained). Numeric Jacobian over 5 params (3 rotation, 2
// translation-direction).
//
// ``mask`` may be null: with ``huber_delta`` > 0 the cost runs over ALL
// correspondences with Huber downweighting past delta. This makes the
// polished pose a deterministic function of the full match set — refining
// over the winning hypothesis's own inlier MASK (the original design) left
// a 0.1-0.7 deg seed wander because near-threshold structured-error matches
// enter/leave the mask per hypothesis and each subset pulls the plain LSQ
// optimum differently.
void refine_pose_sampson(Mat3& R, double t[3], const double* x1,
                         const double* x2, const uint8_t* mask, int n,
                         double huber_delta = 0.0) {
  // orthonormal basis perpendicular to t
  auto normalize3 = [](double v[3]) {
    double nn = std::sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2]);
    if (nn > 1e-18)
      for (int k = 0; k < 3; ++k) v[k] /= nn;
  };
  normalize3(t);
  std::vector<int> ids;
  for (int i = 0; i < n; ++i)
    if (!mask || mask[i]) ids.push_back(i);
  if (ids.size() < 6) return;
  // Tukey biweight rho and its IRLS weight; delta <= 0 degrades to plain
  // LSQ. A REDESCENDING loss is required here, not Huber: gross outliers
  // (border-pinned / occluded matches can be 20%+ of dense-match samples)
  // keep a constant per-point influence under Huber and collectively bias
  // the polish by degrees; Tukey zeroes them out entirely.
  const double c_tuk = huber_delta;
  auto rho = [&](double r) {
    if (c_tuk <= 0) return 0.5 * r * r;
    double q = (r / c_tuk) * (r / c_tuk);
    if (q >= 1.0) return c_tuk * c_tuk / 6.0;
    double u = 1.0 - q;
    return c_tuk * c_tuk / 6.0 * (1.0 - u * u * u);
  };
  auto wgt = [&](double r) {
    if (c_tuk <= 0) return 1.0;
    double q = (r / c_tuk) * (r / c_tuk);
    if (q >= 1.0) return 0.0;
    double u = 1.0 - q;
    return u * u;
  };

  auto build_E = [&](const double delta[5], Mat3& E_out, Mat3& R_new,
                     double t_new[3]) {
    double u[3], v[3];
    // tangent basis at t
    double a[3] = {1, 0, 0};
    if (std::fabs(t[0]) > 0.9) a[0] = 0, a[1] = 1;
    u[0] = t[1] * a[2] - t[2] * a[1];
    u[1] = t[2] * a[0] - t[0] * a[2];
    u[2] = t[0] * a[1] - t[1] * a[0];
    normalize3(u);
    v[0] = t[1] * u[2] - t[2] * u[1];
    v[1] = t[2] * u[0] - t[0] * u[2];
    v[2] = t[0] * u[1] - t[1] * u[0];
    double w[3] = {delta[0], delta[1], delta[2]};
    R_new = matmul(exp_so3(w), R);
    for (int k = 0; k < 3; ++k)
      t_new[k] = t[k] + delta[3] * u[k] + delta[4] * v[k];
    normalize3(t_new);
    E_out = matmul(skew3(t_new), R_new);
  };

  double lambda = 1e-3;
  double zero[5] = {0, 0, 0, 0, 0};
  Mat3 E0{}, Rw{};
  double tw[3];
  build_E(zero, E0, Rw, tw);
  auto cost_of = [&](const Mat3& E) {
    double c = 0;
    for (int i : ids) {
      double r = sampson_signed(E, x1 + 2 * i, x2 + 2 * i);
      c += rho(r);
    }
    return c;
  };
  double cost = cost_of(E0);

  for (int it = 0; it < 50; ++it) {
    // numeric Jacobian
    const double eps = 1e-7;
    std::vector<double> J(ids.size() * 5), r0(ids.size());
    for (size_t k = 0; k < ids.size(); ++k)
      r0[k] = sampson_signed(E0, x1 + 2 * ids[k], x2 + 2 * ids[k]);
    for (int p = 0; p < 5; ++p) {
      double dp[5] = {0, 0, 0, 0, 0}, dm[5] = {0, 0, 0, 0, 0};
      dp[p] = eps;
      dm[p] = -eps;
      Mat3 Ep{}, Em{}, Rt{};
      double tt[3];
      build_E(dp, Ep, Rt, tt);
      build_E(dm, Em, Rt, tt);
      for (size_t k = 0; k < ids.size(); ++k) {
        double rp = sampson_signed(Ep, x1 + 2 * ids[k], x2 + 2 * ids[k]);
        double rm = sampson_signed(Em, x1 + 2 * ids[k], x2 + 2 * ids[k]);
        J[k * 5 + p] = (rp - rm) / (2 * eps);
      }
    }
    // normal equations (5x5), IRLS-weighted for the Huber cost
    double A[25] = {0}, g[5] = {0};
    for (size_t k = 0; k < ids.size(); ++k) {
      double w = wgt(r0[k]);
      for (int p = 0; p < 5; ++p) {
        g[p] += w * J[k * 5 + p] * r0[k];
        for (int q = 0; q < 5; ++q)
          A[p * 5 + q] += w * J[k * 5 + p] * J[k * 5 + q];
      }
    }
    bool improved = false;
    for (int attempt = 0; attempt < 6 && !improved; ++attempt) {
      double M[25], delta[5];
      std::memcpy(M, A, sizeof(M));
      for (int p = 0; p < 5; ++p) M[p * 5 + p] += lambda * (1 + A[p * 5 + p]);
      // solve M delta = -g (Gaussian elimination, partial pivot)
      double rhs[5];
      for (int p = 0; p < 5; ++p) rhs[p] = -g[p];
      bool ok = true;
      for (int c = 0; c < 5 && ok; ++c) {
        int piv = c;
        for (int rr = c + 1; rr < 5; ++rr)
          if (std::fabs(M[rr * 5 + c]) > std::fabs(M[piv * 5 + c])) piv = rr;
        if (std::fabs(M[piv * 5 + c]) < 1e-15) {
          ok = false;
          break;
        }
        if (piv != c) {
          for (int cc = 0; cc < 5; ++cc) std::swap(M[piv * 5 + cc], M[c * 5 + cc]);
          std::swap(rhs[piv], rhs[c]);
        }
        for (int rr = c + 1; rr < 5; ++rr) {
          double f = M[rr * 5 + c] / M[c * 5 + c];
          for (int cc = c; cc < 5; ++cc) M[rr * 5 + cc] -= f * M[c * 5 + cc];
          rhs[rr] -= f * rhs[c];
        }
      }
      if (!ok) {
        lambda *= 10;
        continue;
      }
      for (int c = 4; c >= 0; --c) {
        double s = rhs[c];
        for (int cc = c + 1; cc < 5; ++cc) s -= M[c * 5 + cc] * delta[cc];
        delta[c] = s / M[c * 5 + c];
      }
      Mat3 E_try{}, R_try{};
      double t_try[3];
      build_E(delta, E_try, R_try, t_try);
      double c_try = cost_of(E_try);
      if (c_try < cost) {
        cost = c_try;
        R = R_try;
        std::memcpy(t, t_try, sizeof(t_try));
        E0 = E_try;
        lambda = std::max(lambda * 0.3, 1e-12);
        improved = true;
      } else {
        lambda *= 10;
      }
    }
    if (!improved) break;
  }
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

// test hook: minimal 5-point solver on the first 5 correspondences.
// E_out: up to 10 essential matrices (row-major, Frobenius-normalized).
int debug_five_point(const double* x1, const double* x2, double* E_out) {
  Mat3 cands[10];
  int n = five_point(x1, x2, nullptr, cands);
  for (int i = 0; i < n; ++i)
    std::memcpy(E_out + 9 * i, cands[i].m, 9 * sizeof(double));
  return n;
}

// Essential-matrix RANSAC + pose recovery on NORMALIZED image coordinates.
//   x1, x2: (n, 2) doubles; threshold: Sampson distance in normalized units;
//   outputs: R (3x3 row-major), t (3), inliers (n) uint8.
// Returns number of inliers (0 on failure).
int estimate_relative_pose(const double* x1, const double* x2, int n,
                           double threshold, int max_iters, uint64_t seed,
                           double* R_out, double* t_out, uint8_t* inliers_out) {
  if (n < 5) return 0;
  const bool dbg = std::getenv("ROMA_RANSAC_DEBUG") != nullptr;
  std::mt19937_64 rng(seed);
  std::uniform_int_distribution<int> uni(0, n - 1);
  double thr_sq = threshold * threshold;

  int best_inl = -1;
  std::vector<uint8_t> inl(n), best_mask(n, 0);
  // hypotheses within a small margin of the best inlier count are kept and
  // disambiguated by cheirality at the end. Margin-based (not exact-tie)
  // retention matters: on (near-)planar scenes the wrong members of the
  // 2-parameter epipolar family fit every coplanar point too, and noise can
  // give one of them +1 inlier over the true pose — only cheirality tells
  // them apart. With minimal point counts all ~10 solver roots fit exactly.
  struct Hyp {
    Mat3 E;
    int cnt;
    double score;
  };
  std::vector<Hyp> ties;
  auto margin = [&]() { return std::max(2, best_inl / 25); };
  int idx[5];
  double log_conf = std::log(1 - 0.99999);
  int iters = max_iters;

  auto consider = [&](const Mat3& E) {
    int cnt = 0;
    double score = 0;
    for (int i = 0; i < n; ++i) {
      double d = sampson_sq(E, x1 + 2 * i, x2 + 2 * i);
      bool ok = d < thr_sq;
      inl[i] = ok;
      cnt += ok;
      if (ok) score += d;
    }
    bool improved = cnt > best_inl;
    if (improved) {
      best_inl = cnt;
      best_mask = inl;
      // prune hypotheses that fell out of the margin
      ties.erase(std::remove_if(ties.begin(), ties.end(),
                                [&](const Hyp& h) {
                                  return h.cnt + margin() < best_inl;
                                }),
                 ties.end());
    }
    if (cnt + margin() >= best_inl) {
      if (ties.size() < 32) {
        ties.push_back({E, cnt, score});
      } else {
        // retention list full: keep the 32 STRONGEST hypotheses by evicting
        // the weakest. Dropping the newcomer instead (the original policy)
        // could exclude the eventual best-inlier hypothesis from pose
        // recovery entirely — the final (R, t) then came from a stale
        // within-margin wrong-basin member, producing rare multi-degree
        // pose flyers on otherwise easy inputs.
        auto worst = std::min_element(
            ties.begin(), ties.end(), [](const Hyp& a, const Hyp& b) {
              return a.cnt < b.cnt || (a.cnt == b.cnt && a.score > b.score);
            });
        if (cnt > worst->cnt || (cnt == worst->cnt && score < worst->score))
          *worst = {E, cnt, score};
      }
    }
    return improved;
  };

  for (int it = 0; it < iters; ++it) {
    // sample 5 distinct indices for the minimal Nister solver (matches
    // cv2.findEssentialMat / poselib semantics, reference utils.py:38)
    for (int k = 0; k < 5; ++k) {
      bool dup = true;
      while (dup) {
        idx[k] = uni(rng);
        dup = false;
        for (int j = 0; j < k; ++j) dup |= (idx[j] == idx[k]);
      }
    }
    Mat3 cands[10];
    int n_cand = five_point(x1, x2, idx, cands);
    for (int c = 0; c < n_cand; ++c) {
      if (consider(cands[c])) {
        if (dbg)
          std::fprintf(stderr, "[ransac] it=%d best_inl=%d\n", it, best_inl);
        // adaptive termination (guard the double->int cast vs overflow)
        double w = std::max(1e-9, double(best_inl) / n);
        double denom = std::log(std::max(1e-12, 1 - std::pow(w, 5.0)));
        if (denom < 0) {
          double need = std::ceil(log_conf / denom);
          if (need < iters) iters = std::max(it + 1, int(need));
        }
      }
    }
  }
  if (dbg)
    std::fprintf(stderr, "[ransac] done: iters=%d best_inl=%d ties=%zu\n",
                 iters, best_inl, ties.size());
  if (best_inl < 5 || ties.empty()) return 0;

  // local optimization: re-run the minimal solver on random inlier 5-subsets
  // (degeneracy-safe, unlike an 8-point least-squares refit, which returns
  // arbitrary members of the 2-parameter F family on planar scenes)
  {
    std::vector<int> ids;
    for (int i = 0; i < n; ++i)
      if (best_mask[i]) ids.push_back(i);
    if ((int)ids.size() > 5) {
      for (int round = 0; round < 10; ++round) {
        int sub[5];
        for (int k = 0; k < 5; ++k) {
          bool dup = true;
          while (dup) {
            sub[k] = ids[std::uniform_int_distribution<int>(
                0, (int)ids.size() - 1)(rng)];
            dup = false;
            for (int j = 0; j < k; ++j) dup |= (sub[j] == sub[k]);
          }
        }
        Mat3 cands[10];
        int n_cand = five_point(x1, x2, sub, cands);
        for (int c = 0; c < n_cand; ++c) consider(cands[c]);
      }
    }
  }

  // pose recovery: decompose every retained hypothesis, pick the (E, R, t)
  // with the highest cheirality count over that hypothesis's own inliers;
  // break cheirality ties by inlier count, then by the lower Sampson score
  // (exact-fit true solutions beat barely-under-threshold wrong roots by
  // many orders of magnitude)
  int best_good = -1;
  int win_cnt = -1;
  double win_score = 1e300;
  Mat3 R_best{}, E_best{};
  double t_best[3] = {0, 0, 1};
  std::vector<uint8_t> hyp_mask(n);
  for (const auto& h : ties) {
    for (int i = 0; i < n; ++i)
      hyp_mask[i] = sampson_sq(h.E, x1 + 2 * i, x2 + 2 * i) < thr_sq;
    Mat3 Rs[2];
    double ts[2][3];
    decompose_E(h.E, Rs, ts);
    for (int r = 0; r < 2; ++r) {
      for (int s = 0; s < 2; ++s) {
        int good = count_cheiral(Rs[r], ts[s], x1, x2, hyp_mask.data(), n);
        if (dbg)
          std::fprintf(stderr,
                       "[ransac] hyp cnt=%d score=%.3e r=%d s=%d good=%d\n",
                       h.cnt, h.score, r, s, good);
        bool better =
            good > best_good ||
            (good == best_good &&
             (h.cnt > win_cnt || (h.cnt == win_cnt && h.score < win_score)));
        if (better) {
          best_good = good;
          win_cnt = h.cnt;
          win_score = h.score;
          R_best = Rs[r];
          E_best = h.E;
          std::memcpy(t_best, ts[s], sizeof(t_best));
        }
      }
    }
  }
  // inlier mask of the winning hypothesis
  for (int i = 0; i < n; ++i)
    best_mask[i] = sampson_sq(E_best, x1 + 2 * i, x2 + 2 * i) < thr_sq;

  // non-linear polish: LM on (R, t) minimizing Sampson over inliers, then a
  // final re-count (poselib-style refinement)
  if (dbg) {
    Mat3 E_pre = matmul(skew3(t_best), R_best);
    int cnt_pre = 0;
    double cost_pre = 0;
    for (int i = 0; i < n; ++i) {
      double d = sampson_sq(E_pre, x1 + 2 * i, x2 + 2 * i);
      if (best_mask[i]) cost_pre += d;
      cnt_pre += d < thr_sq;
    }
    std::fprintf(stderr, "[ransac] pre-refine: cnt=%d cost=%.6e\n", cnt_pre,
                 cost_pre);
  }
  Mat3 R_pre = R_best;
  double t_pre[3] = {t_best[0], t_best[1], t_best[2]};
  // robust polish over ALL correspondences (Tukey, c = 2x the inlier
  // threshold): deterministic in the data, independent of the winning
  // hypothesis's inlier mask
  refine_pose_sampson(R_best, t_best, x1, x2, nullptr, n, 2.0 * threshold);
  Mat3 E_ref = matmul(skew3(t_best), R_best);
  int cnt_ref = 0;
  for (int i = 0; i < n; ++i) {
    inl[i] = sampson_sq(E_ref, x1 + 2 * i, x2 + 2 * i) < thr_sq;
    cnt_ref += inl[i];
  }
  // guard: a polish that LOSES consensus is a polish gone wrong (LM on a
  // fixed inlier set can drift when that set was mis-scoped) — keep the
  // pre-refinement pose and its mask instead of silently returning worse
  int cnt_pre = 0;
  Mat3 E_pre = matmul(skew3(t_pre), R_pre);
  std::vector<uint8_t> mask_pre(n);
  for (int i = 0; i < n; ++i) {
    mask_pre[i] = sampson_sq(E_pre, x1 + 2 * i, x2 + 2 * i) < thr_sq;
    cnt_pre += mask_pre[i];
  }
  if (dbg)
    std::fprintf(stderr, "[ransac] refine: cnt %d -> %d\n", cnt_pre, cnt_ref);
  // revert only on CATASTROPHIC consensus loss (divergence insurance): the
  // robust fixpoint legitimately trades a few boundary inliers for a much
  // better pose, so an exact cnt comparison would keep unpolished poses
  if (cnt_ref + std::max(5, cnt_pre / 20) >= cnt_pre) {
    best_mask.assign(inl.begin(), inl.end());
    if (cnt_ref > best_inl) best_inl = cnt_ref;
  } else {
    R_best = R_pre;
    std::memcpy(t_best, t_pre, sizeof(t_pre));
    best_mask = mask_pre;
    if (cnt_pre > best_inl) best_inl = cnt_pre;
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

// Native host-side kernels for vi_diffusion_processes_tpu.
//
// The reference's only native component is the `banded_matrices` C++
// TensorFlow op library (SURVEY.md §2.1).  On TPU the compute path is
// XLA/Pallas; the native layer here serves the *host* side instead:
//
//   * block-tridiagonal reference kernels (Cholesky / solve / Takahashi
//     sparse inverse) — a fast CPU oracle mirroring banded_matrices'
//     cholesky_band / solve_triang_mat / inverse_from_cholesky_band,
//     used for verification and host-side preprocessing,
//   * a batched Euler–Maruyama simulator for the synthetic-data pipeline
//     (generate_data.py equivalent) with a counter-based RNG, OpenMP-free
//     but vectorization-friendly.
//
// Layout conventions match the JAX side: block pairs
//   diag [n, d, d] row-major, sub [n-1, d, d] (sub[k] = K[k+1,k]).
//
// Build: g++ -O3 -march=native -shared -fPIC btd_kernels.cpp -o libbtd.so
#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------- cholesky
// In-place small dense Cholesky (lower), d x d, row-major.  Returns 0 on
// success, 1 if a pivot is non-positive.
static int dense_chol(double* a, int d) {
    for (int j = 0; j < d; ++j) {
        double s = a[j * d + j];
        for (int k = 0; k < j; ++k) s -= a[j * d + k] * a[j * d + k];
        if (s <= 0.0) return 1;
        double ljj = std::sqrt(s);
        a[j * d + j] = ljj;
        for (int i = j + 1; i < d; ++i) {
            double v = a[i * d + j];
            for (int k = 0; k < j; ++k) v -= a[i * d + k] * a[j * d + k];
            a[i * d + j] = v / ljj;
        }
        for (int k = j + 1; k < d; ++k) a[j * d + k] = 0.0;
    }
    return 0;
}

// Solve L x = b (lower triangular, d x d), m right-hand sides (b: d x m).
static void tri_solve_lower(const double* l, double* b, int d, int m) {
    for (int c = 0; c < m; ++c)
        for (int i = 0; i < d; ++i) {
            double v = b[i * m + c];
            for (int k = 0; k < i; ++k) v -= l[i * d + k] * b[k * m + c];
            b[i * m + c] = v / l[i * d + i];
        }
}

// Solve L^T x = b.
static void tri_solve_lower_t(const double* l, double* b, int d, int m) {
    for (int c = 0; c < m; ++c)
        for (int i = d - 1; i >= 0; --i) {
            double v = b[i * m + c];
            for (int k = i + 1; k < d; ++k) v -= l[k * d + i] * b[k * m + c];
            b[i * m + c] = v / l[i * d + i];
        }
}

// Block-tridiagonal Cholesky: K = L L^T with L block-bidiagonal.
// Equivalent of banded_matrices' cholesky_band (block layout).
// diag [n,d,d], sub [n-1,d,d] -> ldiag [n,d,d], lsub [n-1,d,d].
int btd_cholesky(const double* diag, const double* sub, int64_t n, int d,
                 double* ldiag, double* lsub) {
    const int dd = d * d;
    double* tmp = new double[dd];
    std::memcpy(ldiag, diag, sizeof(double) * dd);
    if (dense_chol(ldiag, d)) { delete[] tmp; return 1; }
    for (int64_t k = 0; k + 1 < n; ++k) {
        // C_k^T = L_k^{-1} B_k^T   (B_k = sub[k])
        for (int i = 0; i < d; ++i)
            for (int j = 0; j < d; ++j) tmp[i * d + j] = sub[k * dd + j * d + i];
        tri_solve_lower(ldiag + k * dd, tmp, d, d);
        // store C_k = tmp^T
        for (int i = 0; i < d; ++i)
            for (int j = 0; j < d; ++j) lsub[k * dd + i * d + j] = tmp[j * d + i];
        // Schur: D_{k+1} - C_k C_k^T
        double* out = ldiag + (k + 1) * dd;
        std::memcpy(out, diag + (k + 1) * dd, sizeof(double) * dd);
        for (int i = 0; i < d; ++i)
            for (int j = 0; j < d; ++j) {
                double s = 0.0;
                for (int c = 0; c < d; ++c)
                    s += lsub[k * dd + i * d + c] * lsub[k * dd + j * d + c];
                out[i * d + j] -= s;
            }
        if (dense_chol(out, d)) { delete[] tmp; return 1; }
    }
    delete[] tmp;
    return 0;
}

// Solve L x = rhs (block forward substitution); rhs [n, d] in place.
// Equivalent of solve_triang_mat.
void btd_solve_lower(const double* ldiag, const double* lsub, int64_t n, int d,
                     double* rhs) {
    const int dd = d * d;
    tri_solve_lower(ldiag, rhs, d, 1);
    for (int64_t k = 1; k < n; ++k) {
        double* r = rhs + k * d;
        const double* c = lsub + (k - 1) * dd;
        const double* xprev = rhs + (k - 1) * d;
        for (int i = 0; i < d; ++i) {
            double v = r[i];
            for (int j = 0; j < d; ++j) v -= c[i * d + j] * xprev[j];
            r[i] = v;
        }
        tri_solve_lower(ldiag + k * dd, r, d, 1);
    }
}

// Solve L^T x = rhs (block backward substitution); rhs [n, d] in place.
void btd_solve_lower_t(const double* ldiag, const double* lsub, int64_t n, int d,
                       double* rhs) {
    const int dd = d * d;
    tri_solve_lower_t(ldiag + (n - 1) * dd, rhs + (n - 1) * d, d, 1);
    for (int64_t k = n - 2; k >= 0; --k) {
        double* r = rhs + k * d;
        const double* c = lsub + k * dd;  // C_k multiplies x_k in row k+1
        const double* xnext = rhs + (k + 1) * d;
        for (int i = 0; i < d; ++i) {
            double v = r[i];
            for (int j = 0; j < d; ++j) v -= c[j * d + i] * xnext[j];
            r[i] = v;
        }
        tri_solve_lower_t(ldiag + k * dd, r, d, 1);
    }
}

// Takahashi sparse inverse: in-band blocks of (L L^T)^{-1}.
// Equivalent of inverse_from_cholesky_band.
void btd_blocks_of_inverse(const double* ldiag, const double* lsub, int64_t n,
                           int d, double* sdiag, double* ssub) {
    const int dd = d * d;
    double* linv = new double[dd];
    double* g = new double[dd];
    // Sigma_{n-1,n-1} = L^{-T} L^{-1}
    for (int64_t k = n - 1; k >= 0; --k) {
        // linv = L_k^{-1}
        for (int i = 0; i < dd; ++i) linv[i] = (i % (d + 1) == 0) ? 1.0 : 0.0;
        tri_solve_lower(ldiag + k * dd, linv, d, d);
        // base = L^{-T} L^{-1} = linv^T linv
        double* sk = sdiag + k * dd;
        for (int i = 0; i < d; ++i)
            for (int j = 0; j < d; ++j) {
                double s = 0.0;
                for (int c = 0; c < d; ++c) s += linv[c * d + i] * linv[c * d + j];
                sk[i * d + j] = s;
            }
        if (k + 1 < n) {
            // G_k = -L_k^{-T} C_k^T
            for (int i = 0; i < d; ++i)
                for (int j = 0; j < d; ++j) g[i * d + j] = -lsub[k * dd + j * d + i];
            tri_solve_lower_t(ldiag + k * dd, g, d, d);
            // cross = G_k Sigma_{k+1,k+1}; ssub[k] = cross^T
            const double* snext = sdiag + (k + 1) * dd;
            for (int i = 0; i < d; ++i)
                for (int j = 0; j < d; ++j) {
                    double s = 0.0;
                    for (int c = 0; c < d; ++c) s += g[i * d + c] * snext[c * d + j];
                    ssub[k * dd + j * d + i] = s;  // transpose
                }
            // Sigma_kk += cross G_k^T  (= G S G^T, symmetric)
            for (int i = 0; i < d; ++i)
                for (int j = 0; j < d; ++j) {
                    double s = 0.0;
                    for (int c = 0; c < d; ++c)
                        s += ssub[k * dd + c * d + i] * g[j * d + c];
                    sk[i * d + j] += s;
                }
        }
    }
    delete[] linv;
    delete[] g;
}

// -------------------------------------------------------------- simulation
// splitmix64 counter-based RNG -> standard normal via Box-Muller.
static inline uint64_t splitmix64(uint64_t x) {
    x += 0x9E3779B97f4A7C15ull;
    x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9ull;
    x = (x ^ (x >> 27)) * 0x94D049BB133111EBull;
    return x ^ (x >> 31);
}

static inline double u01(uint64_t x) {
    return (double)(splitmix64(x) >> 11) * (1.0 / 9007199254740992.0);
}

static inline double gauss(uint64_t seed, uint64_t idx) {
    double u1 = u01(seed ^ (2 * idx + 1));
    double u2 = u01(seed ^ (2 * idx + 2));
    if (u1 < 1e-300) u1 = 1e-300;
    return std::sqrt(-2.0 * std::log(u1)) * std::cos(6.283185307179586 * u2);
}

// Batched scalar Euler-Maruyama for the drift families of the SDE zoo.
// drift_type: 0=OU(-p0 x) 1=double-well(p0 x (p1 - x^2)) 2=Benes(p0 tanh x)
//             3=sine(sin(x - p0)) 4=sqrt(sqrt(p0 |x|))
// x0 [b], out [b, t].
void euler_maruyama_1d(int drift_type, double p0, double p1, double sqrt_q,
                       const double* x0, int64_t b, int64_t t, double dt,
                       uint64_t seed, double* out) {
    const double sdt = std::sqrt(dt) * sqrt_q;
    for (int64_t i = 0; i < b; ++i) {
        double x = x0[i];
        out[i * t] = x;
        for (int64_t k = 1; k < t; ++k) {
            double f;
            switch (drift_type) {
                case 0: f = -p0 * x; break;
                case 1: f = p0 * x * (p1 - x * x); break;
                case 2: f = p0 * std::tanh(x); break;
                case 3: f = std::sin(x - p0); break;
                default: f = std::sqrt(p0 * std::fabs(x)); break;
            }
            x += f * dt + sdt * gauss(seed, (uint64_t)(i * t + k));
            out[i * t + k] = x;
        }
    }
}

}  // extern "C"

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

// ------------------------------------------------- CVI-DP baseline step
// Faithful sequential re-implementation of ONE complete CVI-DP natural-
// gradient step for d=1 on an n-point grid — the reference's per-step
// work profile (variational_cvi_sde.py update_sites/update_girsanov_sites/
// classic_elbo driving banded_matrices' sequential C++ recursions,
// SURVEY.md §3.3):
//
//   1. data-site update at n_obs observation points (natgrad in f-space),
//   2. Girsanov/linearization 20-pt Gauss-Hermite sweep over the grid
//      (E[drift], E[drift'] under q),
//   3. 3x naturals_to_ssm_params: UDU' backward recursion + backward/
//      forward bidiagonal solves (after the data-site update, after the
//      Girsanov update, and for the posterior used by the ELBO),
//   4. forward marginal recursion (means + variances of q),
//   5. ELBO: closed-form per-interval KL pass + a second full-grid
//      Gauss-Hermite sweep for the Girsanov drift residual + VE at obs.
//
// All recursions are strictly sequential in k, exactly like the
// banded_matrices kernels (banded_matrices/cc/.../cholesky.hpp).  Returns
// a checksum so callers can keep the work alive; `reps` iterations.
double baseline_cvi_dp_step_1d(int64_t n, int64_t n_obs, int reps,
                               const double* gh_z, const double* gh_w,
                               int n_gh) {
    double* kd = new double[n];
    double* ks = new double[n - 1];
    double* th = new double[n];
    double* dpiv = new double[n];
    double* zz = new double[n];
    double* mu = new double[n];
    double* var = new double[n];
    double acc = 0.0;
    for (int64_t k = 0; k < n; ++k) {
        kd[k] = 2.0 + 0.1 * u01((uint64_t)k);
        th[k] = u01((uint64_t)(k + n));
    }
    for (int64_t k = 0; k < n - 1; ++k) ks[k] = 0.3 * u01((uint64_t)(k + 2 * n));

    for (int r = 0; r < reps; ++r) {
        // 1. data-site natgrad update (gather + pointwise, n_obs points)
        for (int64_t i = 0; i < n_obs; ++i) {
            int64_t k = (i * n) / n_obs;
            th[k] = 0.9 * th[k] + 0.1 * (th[k] * kd[k] - 0.5);
        }
        // 2. linearization sweep: E_q[f(x)], E_q[f'(x)] by 20-pt GH
        for (int64_t k = 0; k < n; ++k) {
            double m = th[k], s = 1.0 / kd[k];
            double sq = std::sqrt(2.0 * s);
            double ef = 0.0, efp = 0.0;
            for (int j = 0; j < n_gh; ++j) {
                double x = m + sq * gh_z[j];
                double f = 4.0 * x * (1.0 - x * x);  // double-well drift
                ef += gh_w[j] * f;
                efp += gh_w[j] * (4.0 - 12.0 * x * x);
            }
            acc += ef * 1e-12 + efp * 1e-12;
        }
        // 3. naturals -> SSM x3: UDU' + backward/forward solves
        for (int pass = 0; pass < 3; ++pass) {
            dpiv[n - 1] = kd[n - 1];
            for (int64_t k = n - 2; k >= 0; --k)
                dpiv[k] = kd[k] - ks[k] * ks[k] / dpiv[k + 1];
            zz[n - 1] = th[n - 1];
            for (int64_t k = n - 2; k >= 0; --k)
                zz[k] = th[k] + ks[k] / dpiv[k + 1] * zz[k + 1];
            mu[0] = zz[0] / dpiv[0];
            for (int64_t k = 1; k < n; ++k)
                mu[k] = zz[k] / dpiv[k] + ks[k - 1] / dpiv[k] * mu[k - 1];
        }
        // 4. forward marginal recursion (vars via the filter identity)
        var[0] = 1.0 / dpiv[0];
        for (int64_t k = 1; k < n; ++k) {
            double a = ks[k - 1] / dpiv[k];
            var[k] = a * a * var[k - 1] + 1.0 / dpiv[k];
        }
        // 5. ELBO: KL pass + Girsanov GH sweep + VE at obs
        double kl = 0.0;
        for (int64_t k = 1; k < n; ++k) {
            double a = ks[k - 1] / dpiv[k];
            double q = 1.0 / dpiv[k];
            double dm = mu[k] - a * mu[k - 1];
            kl += 0.5 * (std::log(q) + (var[k] + dm * dm) / q - 1.0);
        }
        double girs = 0.0;
        for (int64_t k = 0; k < n - 1; ++k) {
            double m = mu[k];
            double sq = std::sqrt(2.0 * var[k]);
            double e2 = 0.0;
            for (int j = 0; j < n_gh; ++j) {
                double x = m + sq * gh_z[j];
                double f = 4.0 * x * (1.0 - x * x);
                double lin = 0.9 * m + 0.1;
                e2 += gh_w[j] * (f - lin) * (f - lin);
            }
            girs += e2;
        }
        double ve = 0.0;
        for (int64_t i = 0; i < n_obs; ++i) {
            int64_t k = (i * n) / n_obs;
            ve += -0.5 * (mu[k] * mu[k] + var[k]);
        }
        acc += kl + girs * 1e-9 + ve * 1e-9;
    }
    delete[] kd; delete[] ks; delete[] th; delete[] dpiv;
    delete[] zz; delete[] mu; delete[] var;
    return acc;
}

}  // extern "C"

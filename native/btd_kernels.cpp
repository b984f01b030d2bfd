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

// --------------------------------------------- VDP (Archambeau) baseline
// Sequential twin of ONE VDP inference step for d=1 (vi_sde.py:171-420 +
// vi_markov_gp_trainer.py:50-61 driving eager TF):
//   1. forward pass: marginal means/vars under the current linear drift
//      (LinearDrift.to_ssm + marginals — sequential recursions),
//   2. E_sde gradient sweep: 20-pt GH over the grid (E[f], E[f'], and the
//      grads of the drift-difference wrt m, S),
//   3. backward Lagrange ODE integration for lambda, psi (the reference's
//      per-step Python loop, vi_sde.py:337-347),
//   4. parameter update sweep: A = -E[f'] + 2 Q psi, b = E[f] + A m - Q
//      lambda, smoothed by lr (one more GH sweep for E[f], E[f']).
double baseline_vdp_step_1d(int64_t n, int64_t n_obs, int reps,
                            const double* gh_z, const double* gh_w,
                            int n_gh) {
    double* a = new double[n];
    double* b = new double[n];
    double* m = new double[n];
    double* s = new double[n];
    double* lam = new double[n];
    double* psi = new double[n];
    double acc = 0.0;
    const double dt = 1e-4, q = 0.8;
    for (int64_t k = 0; k < n; ++k) {
        a[k] = -0.5 + 0.01 * u01((uint64_t)k);
        b[k] = 0.01 * u01((uint64_t)(k + n));
    }
    for (int r = 0; r < reps; ++r) {
        // 1. forward pass
        m[0] = 0.0; s[0] = 0.5;
        for (int64_t k = 1; k < n; ++k) {
            double ak = 1.0 + dt * a[k - 1];
            m[k] = ak * m[k - 1] + dt * b[k - 1];
            s[k] = ak * ak * s[k - 1] + dt * q;
        }
        // 2. E_sde gradient sweep (GH)
        for (int64_t k = 0; k < n; ++k) {
            double sq = std::sqrt(2.0 * s[k]);
            double gm = 0.0, gs = 0.0;
            for (int j = 0; j < n_gh; ++j) {
                double x = m[k] + sq * gh_z[j];
                double f = 4.0 * x * (1.0 - x * x);
                double df = 4.0 - 12.0 * x * x;
                double diff = f - (a[k] * x + b[k]);
                gm += gh_w[j] * diff * (df - a[k]);
                gs += gh_w[j] * diff * diff;
            }
            lam[k] = gm; psi[k] = gs;  // reuse as grad scratch
        }
        // 3. backward Lagrange integration (+ jumps at obs indices)
        double l = 0.0, p = 0.0;
        for (int64_t k = n - 1; k >= 0; --k) {
            l += dt * (a[k] * l - lam[k]);
            p += dt * (2.0 * a[k] * p - psi[k]);
            if (n_obs > 0 && k % (n > n_obs ? n / n_obs : 1) == 0) {
                l += 0.1 * (m[k] - 1.0);
                p += 0.05;
            }
            lam[k] = l; psi[k] = p;
        }
        // 4. parameter update sweep (E[f], E[f'] again + smoothing)
        for (int64_t k = 0; k < n; ++k) {
            double sq = std::sqrt(2.0 * s[k]);
            double ef = 0.0, efp = 0.0;
            for (int j = 0; j < n_gh; ++j) {
                double x = m[k] + sq * gh_z[j];
                ef += gh_w[j] * 4.0 * x * (1.0 - x * x);
                efp += gh_w[j] * (4.0 - 12.0 * x * x);
            }
            double a_new = efp - 2.0 * q * psi[k];
            double b_new = ef - a_new * m[k] + q * lam[k];
            a[k] = 0.9 * a[k] + 0.1 * a_new;
            b[k] = 0.9 * b[k] + 0.1 * b_new;
        }
        acc += m[n - 1] + s[n - 1];
    }
    delete[] a; delete[] b; delete[] m; delete[] s; delete[] lam; delete[] psi;
    return acc;
}

// --------------------------------------- d-generic CVI-DP baseline step
// Sequential d-dimensional twin of baseline_cvi_dp_step_1d: ONE complete
// CVI-DP natural-gradient step on an n-point grid with d-dimensional
// states, mirroring the reference's per-step op profile for d >= 2
// workloads (VanderPol d=2, variational_cvi_sde.py driving
// banded_matrices' block recursions; SURVEY.md §3.3):
//
//   1. data-site update at n_obs points (d-vector natgrad),
//   2. linearization sweep: E[f], E[df/dx] under q by n_q-point
//      Gauss-Hermite cubature (gh_z: [n_q, d] nodes of the tensor grid —
//      the reference's mvnquad uses the same H^d grid), with a dxd
//      Cholesky per grid point to map nodes through the marginal,
//   3. 3x naturals_to_ssm_params: backward block-UDU' recursion
//      (dxd Cholesky pivot + block solve + Schur complement per point)
//      plus backward/forward block-bidiagonal mean solves,
//   4. forward marginal recursion with covariances (P' = A P A^T + Q),
//   5. ELBO: per-interval closed-form KL (Cholesky log-dets + traces) +
//      a second full-grid GH drift-residual sweep + VE at observations.
//
// The drift is the VanderPol field for d=2 (sde/sde.py:432) and a
// coordinatewise double-well coupled through a rotation otherwise —
// equal arithmetic shape to the zoo drifts.  Strictly sequential in k,
// like the banded_matrices kernels.  Returns a checksum.
double baseline_cvi_dp_step_d(int64_t n, int64_t n_obs, int d, int reps,
                              const double* gh_z, const double* gh_w,
                              int n_q) {
    const int dd = d * d;
    double* kd = new double[n * dd];     // precision diagonal blocks
    double* ks = new double[(n - 1) * dd];  // subdiagonal blocks
    double* th = new double[n * d];      // nat1
    double* dpiv = new double[n * dd];   // UDU' pivots D_k
    double* dchol = new double[n * dd];  // chol(D_k)
    double* u = new double[(n - 1) * dd];  // U superdiagonal
    double* zz = new double[n * d];
    double* mu = new double[n * d];
    double* pvar = new double[n * dd];   // marginal covariances
    double* tmp = new double[dd];
    double* tmp2 = new double[dd];
    double* cholm = new double[dd];
    double* xq = new double[d];
    double* fq = new double[d];
    double acc = 0.0;

    // well-conditioned SPD diagonal blocks + small couplings
    for (int64_t k = 0; k < n; ++k) {
        for (int i = 0; i < d; ++i) {
            th[k * d + i] = u01((uint64_t)(k * d + i));
            for (int j = 0; j < d; ++j)
                kd[k * dd + i * d + j] =
                    (i == j ? 2.0 + 0.1 * u01((uint64_t)(k + i)) : 0.05);
        }
    }
    for (int64_t k = 0; k + 1 < n; ++k)
        for (int i = 0; i < dd; ++i)
            ks[k * dd + i] = 0.1 * u01((uint64_t)(k * dd + i + 7));

    for (int r = 0; r < reps; ++r) {
        // 1. data-site natgrad update
        for (int64_t o = 0; o < n_obs; ++o) {
            int64_t k = (o * n) / n_obs;
            for (int i = 0; i < d; ++i)
                th[k * d + i] = 0.9 * th[k * d + i] + 0.1 * (th[k * d + i] - 0.5);
        }
        // 2. linearization sweep: E[f], E[f'] by GH cubature
        for (int64_t k = 0; k < n; ++k) {
            // marginal cov stand-in: inverse-diagonal approx + chol
            std::memcpy(cholm, kd + k * dd, sizeof(double) * dd);
            dense_chol(cholm, d);
            double ef = 0.0, efp = 0.0;
            const double* m = th + k * d;
            for (int q = 0; q < n_q; ++q) {
                const double* zq = gh_z + q * d;
                for (int i = 0; i < d; ++i) {
                    double x = m[i];
                    for (int c = 0; c <= i; ++c) x += cholm[i * d + c] * zq[c];
                    xq[i] = x;
                }
                if (d == 2) {  // VanderPol
                    fq[0] = xq[1];
                    fq[1] = (1.0 - xq[0] * xq[0]) * xq[1] - xq[0];
                } else {
                    for (int i = 0; i < d; ++i) {
                        double xr = xq[i] + 0.1 * xq[(i + 1) % d];
                        fq[i] = 4.0 * xr * (1.0 - xr * xr);
                    }
                }
                double w = gh_w[q];
                for (int i = 0; i < d; ++i) {
                    ef += w * fq[i];
                    efp += w * (d == 2 ? -2.0 * xq[0] * xq[1]
                                       : 4.0 - 12.0 * xq[i] * xq[i]);
                }
            }
            acc += ef * 1e-12 + efp * 1e-12;
        }
        // 3. naturals -> SSM x3: block UDU' + mean solves
        for (int pass = 0; pass < 3; ++pass) {
            // backward UDU': D_{n-1} = K_{n-1}; D_k = Kd_k - Ks_k D_{k+1}^{-1} Ks_k^T
            std::memcpy(dpiv + (n - 1) * dd, kd + (n - 1) * dd,
                        sizeof(double) * dd);
            std::memcpy(dchol + (n - 1) * dd, dpiv + (n - 1) * dd,
                        sizeof(double) * dd);
            dense_chol(dchol + (n - 1) * dd, d);
            for (int64_t k = n - 2; k >= 0; --k) {
                // tmp = Ks_k^T (column-solve target), solve L X = Ks_k^T
                for (int i = 0; i < d; ++i)
                    for (int j = 0; j < d; ++j)
                        tmp[i * d + j] = ks[k * dd + j * d + i];
                tri_solve_lower(dchol + (k + 1) * dd, tmp, d, d);
                // U_k = D_{k+1}^{-1} Ks_k^T: finish the solve
                std::memcpy(tmp2, tmp, sizeof(double) * dd);
                tri_solve_lower_t(dchol + (k + 1) * dd, tmp2, d, d);
                std::memcpy(u + k * dd, tmp2, sizeof(double) * dd);
                // D_k = Kd_k - tmp^T tmp
                double* out = dpiv + k * dd;
                std::memcpy(out, kd + k * dd, sizeof(double) * dd);
                for (int i = 0; i < d; ++i)
                    for (int j = 0; j < d; ++j) {
                        double s = 0.0;
                        for (int c = 0; c < d; ++c)
                            s += tmp[c * d + i] * tmp[c * d + j];
                        out[i * d + j] -= s;
                    }
                std::memcpy(dchol + k * dd, out, sizeof(double) * dd);
                dense_chol(dchol + k * dd, d);
            }
            // backward solve U z = th  (z_k = th_k + U_k z_{k+1} sign conv.)
            std::memcpy(zz + (n - 1) * d, th + (n - 1) * d, sizeof(double) * d);
            for (int64_t k = n - 2; k >= 0; --k)
                for (int i = 0; i < d; ++i) {
                    double v = th[k * d + i];
                    for (int j = 0; j < d; ++j)
                        v += u[k * dd + i * d + j] * zz[(k + 1) * d + j];
                    zz[k * d + i] = v;
                }
            // w = D^{-1} z then forward U^T mu = w
            for (int64_t k = 0; k < n; ++k) {
                std::memcpy(mu + k * d, zz + k * d, sizeof(double) * d);
                tri_solve_lower(dchol + k * dd, mu + k * d, d, 1);
                tri_solve_lower_t(dchol + k * dd, mu + k * d, d, 1);
                if (k > 0)
                    for (int i = 0; i < d; ++i) {
                        double v = mu[k * d + i];
                        for (int j = 0; j < d; ++j)
                            v += u[(k - 1) * dd + j * d + i] * mu[(k - 1) * d + j];
                        mu[k * d + i] = v;
                    }
            }
        }
        // 4. forward marginal recursion: P_k = A P_{k-1} A^T + Q  (A = -U^T)
        for (int i = 0; i < dd; ++i) pvar[i] = 0.0;
        for (int i = 0; i < d; ++i) pvar[i * d + i] = 1.0;
        for (int64_t k = 1; k < n; ++k) {
            const double* a = u + (k - 1) * dd;  // A = -U_k^T (sign immaterial)
            double* p = pvar + k * dd;
            const double* pm = pvar + (k - 1) * dd;
            // tmp = A P
            for (int i = 0; i < d; ++i)
                for (int j = 0; j < d; ++j) {
                    double s = 0.0;
                    for (int c = 0; c < d; ++c) s += a[c * d + i] * pm[c * d + j];
                    tmp[i * d + j] = s;
                }
            for (int i = 0; i < d; ++i)
                for (int j = 0; j < d; ++j) {
                    double s = 0.0;
                    for (int c = 0; c < d; ++c) s += tmp[i * d + c] * a[c * d + j];
                    p[i * d + j] = s + (i == j ? 0.1 : 0.0);
                }
        }
        // 5. ELBO: KL pass (log-dets + trace) + GH residual sweep + VE
        double kl = 0.0;
        for (int64_t k = 1; k < n; ++k) {
            double logdet = 0.0;
            for (int i = 0; i < d; ++i)
                logdet += std::log(dchol[k * dd + i * d + i]);
            double trq = 0.0, dm2 = 0.0;
            for (int i = 0; i < d; ++i) {
                trq += pvar[k * dd + i * d + i];
                double dm = mu[k * d + i] - 0.9 * mu[(k - 1) * d + i];
                dm2 += dm * dm;
            }
            kl += 0.5 * (-2.0 * logdet + trq + dm2 - d);
        }
        double girs = 0.0;
        for (int64_t k = 0; k + 1 < n; ++k) {
            std::memcpy(cholm, pvar + k * dd, sizeof(double) * dd);
            dense_chol(cholm, d);
            const double* m = mu + k * d;
            double e2 = 0.0;
            for (int q = 0; q < n_q; ++q) {
                const double* zq = gh_z + q * d;
                for (int i = 0; i < d; ++i) {
                    double x = m[i];
                    for (int c = 0; c <= i; ++c) x += cholm[i * d + c] * zq[c];
                    xq[i] = x;
                }
                if (d == 2) {
                    fq[0] = xq[1];
                    fq[1] = (1.0 - xq[0] * xq[0]) * xq[1] - xq[0];
                } else {
                    for (int i = 0; i < d; ++i) {
                        double xr = xq[i] + 0.1 * xq[(i + 1) % d];
                        fq[i] = 4.0 * xr * (1.0 - xr * xr);
                    }
                }
                double w = gh_w[q];
                for (int i = 0; i < d; ++i) {
                    double lin = 0.9 * m[i] + 0.1;
                    e2 += w * (fq[i] - lin) * (fq[i] - lin);
                }
            }
            girs += e2;
        }
        double ve = 0.0;
        for (int64_t o = 0; o < n_obs; ++o) {
            int64_t k = (o * n) / n_obs;
            for (int i = 0; i < d; ++i)
                ve += -0.5 * (mu[k * d + i] * mu[k * d + i] +
                              pvar[k * dd + i * d + i]);
        }
        acc += kl + girs * 1e-9 + ve * 1e-9;
    }
    delete[] kd; delete[] ks; delete[] th; delete[] dpiv; delete[] dchol;
    delete[] u; delete[] zz; delete[] mu; delete[] pvar; delete[] tmp;
    delete[] tmp2; delete[] cholm; delete[] xq; delete[] fq;
    return acc;
}

// -------------------------------------------- d-generic GPR grad baseline
// Sequential twin of one exact-GPR loss+gradient step at state dim d
// (gaussian_process_regression.py:118-152 driving banded_matrices):
//   1. SSM assembly (pointwise stable transitions/process covs),
//   2. precision assembly K^{-1} = A^{-T} Q^{-1} A^{-1} blockwise
//      (state_space_model.py:431-483: Cholesky-solve products per block),
//   3. block-tridiagonal Cholesky (cholesky_band),
//   4. forward + backward block solves for the quadratic term,
//   5. Takahashi sparse inverse (inverse_from_cholesky_band) — the
//      registered C++ gradient path of the banded Cholesky,
//   6. a second Cholesky+solve pass (reverse-mode re-materialization).
double baseline_gpr_grad_step_d(int64_t n, int d, int reps) {
    const int dd = d * d;
    double* diag = new double[n * dd];
    double* sub = new double[(n - 1) * dd];
    double* ldiag = new double[n * dd];
    double* lsub = new double[(n - 1) * dd];
    double* sdiag = new double[n * dd];
    double* ssub = new double[(n - 1) * dd];
    double* rhs = new double[n * d];
    double* a = new double[dd];
    double* qinv = new double[dd];
    double* tmp = new double[dd];
    double acc = 0.0;

    for (int r = 0; r < reps; ++r) {
        // 1+2. assembly: A_k, Q_k^{-1}, precision blocks
        for (int64_t k = 0; k < n; ++k) {
            // A_k: stable rotation-ish transition; Q^{-1}: SPD
            for (int i = 0; i < d; ++i)
                for (int j = 0; j < d; ++j) {
                    a[i * d + j] = (i == j ? 0.9 : 0.02) +
                                   1e-3 * u01((uint64_t)(k + i * d + j));
                    qinv[i * d + j] = (i == j ? 4.0 : 0.1);
                }
            // diag_k = Q^{-1} + A^T Q^{-1} A
            for (int i = 0; i < d; ++i)
                for (int j = 0; j < d; ++j) {
                    double s = 0.0;
                    for (int c = 0; c < d; ++c) {
                        double aq = 0.0;
                        for (int e = 0; e < d; ++e)
                            aq += a[e * d + i] * qinv[e * d + c];
                        s += aq * a[c * d + j];
                    }
                    diag[k * dd + i * d + j] = qinv[i * d + j] + s +
                                               (i == j ? 1.0 : 0.0);
                }
            if (k + 1 < n) {
                // sub_k = -Q^{-1} A
                for (int i = 0; i < d; ++i)
                    for (int j = 0; j < d; ++j) {
                        double s = 0.0;
                        for (int c = 0; c < d; ++c)
                            s += qinv[i * d + c] * a[c * d + j];
                        sub[k * dd + i * d + j] = -s;
                    }
            }
            for (int i = 0; i < d; ++i)
                rhs[k * d + i] = u01((uint64_t)(k * d + i));
        }
        // 3..6: two Cholesky passes + solves + Takahashi (gradient path)
        for (int pass = 0; pass < 2; ++pass) {
            btd_cholesky(diag, sub, n, d, ldiag, lsub);
            btd_solve_lower(ldiag, lsub, n, d, rhs);
            btd_solve_lower_t(ldiag, lsub, n, d, rhs);
            if (pass == 0) btd_blocks_of_inverse(ldiag, lsub, n, d, sdiag, ssub);
        }
        double s = 0.0;
        for (int64_t k = 0; k < n; ++k) s += rhs[k * d] + sdiag[k * dd];
        (void)tmp;
        acc += s * 1e-9;
    }
    delete[] diag; delete[] sub; delete[] ldiag; delete[] lsub;
    delete[] sdiag; delete[] ssub; delete[] rhs; delete[] a;
    delete[] qinv; delete[] tmp;
    return acc;
}

// ------------------------------------- d-generic spatio-CVI site baseline
// Sequential twin of one SpatioTemporalSparseCVI.update_sites step
// (spatio_temporal_variational.py:360-553): n_obs observations projected
// onto an Mt-point inducing chain of state dim d = m_space * d_time.
//   1. per-observation conditional projection + site natgrad accumulation
//      (d-vector/dxd outer products per observation),
//   2. naturals -> SSM: block UDU' + mean solves (as in the CVI-DP twin),
//   3. Takahashi sparse inverse for the marginal covariances the next
//      CVI gradient needs,
//   4. VE sweep over observations through the projection.
double baseline_spatio_site_step_d(int64_t mt, int64_t n_obs, int d,
                                   int reps) {
    const int dd = d * d;
    double* kd = new double[mt * dd];
    double* ks = new double[(mt - 1) * dd];
    double* th = new double[mt * d];
    double* ldiag = new double[mt * dd];
    double* lsub = new double[(mt - 1) * dd];
    double* sdiag = new double[mt * dd];
    double* ssub = new double[(mt - 1) * dd];
    double* mu = new double[mt * d];
    double* h = new double[d];
    double acc = 0.0;

    for (int64_t k = 0; k < mt; ++k) {
        for (int i = 0; i < d; ++i) {
            th[k * d + i] = u01((uint64_t)(k * d + i));
            for (int j = 0; j < d; ++j)
                kd[k * dd + i * d + j] =
                    (i == j ? 2.0 + 0.1 * u01((uint64_t)(k + i)) : 0.05);
        }
    }
    for (int64_t k = 0; k + 1 < mt; ++k)
        for (int i = 0; i < dd; ++i)
            ks[k * dd + i] = 0.1 * u01((uint64_t)(k * dd + i + 7));

    for (int r = 0; r < reps; ++r) {
        // 1. per-observation projection + site accumulation
        for (int64_t o = 0; o < n_obs; ++o) {
            int64_t k = (o * mt) / n_obs;
            for (int i = 0; i < d; ++i)
                h[i] = u01((uint64_t)(o + i)) - 0.5;
            double hm = 0.0;
            for (int i = 0; i < d; ++i) hm += h[i] * th[k * d + i];
            double g1 = 0.3 * (1.0 - hm);
            for (int i = 0; i < d; ++i) {
                th[k * d + i] += g1 * h[i];
                for (int j = 0; j < d; ++j)
                    kd[k * dd + i * d + j] += 1e-6 * h[i] * h[j];
            }
        }
        // 2. naturals -> SSM: Cholesky factorization + mean solves
        btd_cholesky(kd, ks, mt, d, ldiag, lsub);
        std::memcpy(mu, th, sizeof(double) * mt * d);
        btd_solve_lower(ldiag, lsub, mt, d, mu);
        btd_solve_lower_t(ldiag, lsub, mt, d, mu);
        // 3. Takahashi sparse inverse (marginal covariances)
        btd_blocks_of_inverse(ldiag, lsub, mt, d, sdiag, ssub);
        // 4. VE sweep through the projection
        double ve = 0.0;
        for (int64_t o = 0; o < n_obs; ++o) {
            int64_t k = (o * mt) / n_obs;
            for (int i = 0; i < d; ++i)
                h[i] = u01((uint64_t)(o + i)) - 0.5;
            double fm = 0.0, fv = 0.0;
            for (int i = 0; i < d; ++i) {
                fm += h[i] * mu[k * d + i];
                for (int j = 0; j < d; ++j)
                    fv += h[i] * sdiag[k * dd + i * d + j] * h[j];
            }
            ve += -0.5 * (fm * fm + fv);
        }
        // undo the site precision drift so reps are stationary
        for (int64_t o = 0; o < n_obs; ++o) {
            int64_t k = (o * mt) / n_obs;
            for (int i = 0; i < d; ++i)
                h[i] = u01((uint64_t)(o + i)) - 0.5;
            for (int i = 0; i < d; ++i)
                for (int j = 0; j < d; ++j)
                    kd[k * dd + i * d + j] -= 1e-6 * h[i] * h[j];
        }
        acc += ve * 1e-9;
    }
    delete[] kd; delete[] ks; delete[] th; delete[] ldiag; delete[] lsub;
    delete[] sdiag; delete[] ssub; delete[] mu; delete[] h;
    return acc;
}

}  // extern "C"

"""Dense NumPy oracles for the structured TPU implementations.

Mirrors the reference's testing idea (tests/tools/numpy_kalman_filter.py,
tests/tools/state_space_model.py): every structured/parallel op is checked
against a straightforward dense or sequential NumPy computation.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def random_spd(rng: np.random.Generator, shape: Tuple[int, ...], d: int) -> np.ndarray:
    a = rng.normal(size=shape + (d, d))
    return a @ np.swapaxes(a, -1, -2) + d * np.eye(d)


def random_ssm_params(rng, batch_shape, n, d, dtype=np.float64):
    """Random stable SSM parameters (dict of arrays)."""
    mu0 = rng.normal(size=batch_shape + (d,))
    p0 = random_spd(rng, batch_shape, d)
    As = 0.5 * rng.normal(size=batch_shape + (n, d, d)) / np.sqrt(d)
    bs = rng.normal(size=batch_shape + (n, d))
    qs = random_spd(rng, batch_shape + (n,), d)
    return dict(
        initial_mean=mu0.astype(dtype),
        chol_initial_covariance=np.linalg.cholesky(p0).astype(dtype),
        state_transitions=As.astype(dtype),
        state_offsets=bs.astype(dtype),
        chol_process_covariances=np.linalg.cholesky(qs).astype(dtype),
    )


def dense_joint_from_ssm(params) -> Tuple[np.ndarray, np.ndarray]:
    """Dense joint mean [N+1·d] and covariance of the Gauss-Markov chain.

    Built from A_inv (unit lower block bidiagonal with −A_k) and
    Q = blockdiag(P0, Q_1..Q_N):  Σ = A Q Aᵀ with A = A_inv⁻¹  (SpInGP).
    Only supports unbatched params.
    """
    As = params["state_transitions"]
    n, d = As.shape[0], As.shape[-1]
    big = (n + 1) * d
    a_inv = np.eye(big)
    for k in range(n):
        a_inv[(k + 1) * d : (k + 2) * d, k * d : (k + 1) * d] = -As[k]
    chols = np.concatenate(
        [params["chol_initial_covariance"][None], params["chol_process_covariances"]], axis=0
    )
    q = np.zeros((big, big))
    for k in range(n + 1):
        l = chols[k]
        q[k * d : (k + 1) * d, k * d : (k + 1) * d] = l @ l.T
    a = np.linalg.inv(a_inv)
    cov = a @ q @ a.T
    m = np.concatenate([params["initial_mean"], params["state_offsets"].reshape(-1)])
    mean = a @ m
    return mean, cov


def kalman_filter_rts(params, nat1, nat2_prec):
    """Sequential information-form Kalman filter + RTS smoother with sites.

    Sites: φ_k(x) = exp(θᵀx − ½xᵀΛx).  Returns (filtered means/covs,
    smoothed means/covs, log normalizer Σ log ∫ N(x;m⁻,P⁻)φ(x)dx).
    Unbatched. NumPy oracle equivalent of tests/tools/numpy_kalman_filter.py.
    """
    As = params["state_transitions"]
    bs = params["state_offsets"]
    n, d = As.shape[0], As.shape[-1]
    chols = np.concatenate(
        [params["chol_initial_covariance"][None], params["chol_process_covariances"]], axis=0
    )
    qs = chols @ np.swapaxes(chols, -1, -2)

    fm = np.zeros((n + 1, d))
    fc = np.zeros((n + 1, d, d))
    log_z = 0.0
    m_pred, p_pred = params["initial_mean"].copy(), qs[0].copy()
    for k in range(n + 1):
        lam, th = nat2_prec[k], nat1[k]
        # log-normalizer of the update at step k
        ipl = np.eye(d) + p_pred @ lam
        ipl_inv = np.linalg.inv(ipl)
        log_z += (
            -0.5 * np.linalg.slogdet(ipl)[1]
            - 0.5 * m_pred @ lam @ ipl_inv @ m_pred
            + th @ ipl_inv @ m_pred
            + 0.5 * th @ ipl_inv @ p_pred @ th
        )
        # information-form update
        prec = np.linalg.inv(p_pred) + lam
        cov = np.linalg.inv(prec)
        mean = cov @ (np.linalg.solve(p_pred, m_pred) + th)
        fm[k], fc[k] = mean, cov
        if k < n:
            m_pred = As[k] @ mean + bs[k]
            p_pred = As[k] @ cov @ As[k].T + qs[k + 1]

    sm = fm.copy()
    sc = fc.copy()
    gains = np.zeros((n, d, d))
    for k in range(n - 1, -1, -1):
        p_pred = As[k] @ fc[k] @ As[k].T + qs[k + 1]
        m_pred = As[k] @ fm[k] + bs[k]
        e = fc[k] @ As[k].T @ np.linalg.inv(p_pred)
        gains[k] = e
        sm[k] = fm[k] + e @ (sm[k + 1] - m_pred)
        sc[k] = fc[k] + e @ (sc[k + 1] - p_pred) @ e.T
    return fm, fc, sm, sc, gains, log_z


def kf_forward_filter(params, H, R, observations, obs_means=None):
    """Sequential observation-space Kalman filter: the functional analogue
    of the reference's hand-written oracle
    (tests/tools/numpy_kalman_filter.py:66-135 ``forward_filter`` and
    :386-422 ``NumpyKalmanFilterWithSites``).

    ``H [out, d]`` or per-step ``[n+1, out, d]``; ``R [out, out]`` or
    per-step ``[n+1, out, out]``; ``observations [n+1, out]``;
    ``obs_means`` shifts each observation site (sites variant, else 0).
    Observations are attached to every one of the ``n+1`` chain states.

    Returns ``(log_liks [n+1], filt_means, filt_covs, pred_means,
    pred_covs)`` where pred is p(xₖ | y₍<ₖ₎).
    """
    As = params["state_transitions"]
    bs = params["state_offsets"]
    n, d = As.shape[0], As.shape[-1]
    out = observations.shape[-1]
    chols = np.concatenate(
        [params["chol_initial_covariance"][None], params["chol_process_covariances"]],
        axis=0,
    )
    qs = chols @ np.swapaxes(chols, -1, -2)
    Hs = np.broadcast_to(H, (n + 1, out, d)) if H.ndim == 2 else H
    Rs = np.broadcast_to(R, (n + 1, out, out)) if R.ndim == 2 else R
    ms = np.zeros((n + 1, out)) if obs_means is None else obs_means

    log_liks = np.zeros(n + 1)
    fm = np.zeros((n + 1, d))
    fc = np.zeros((n + 1, d, d))
    pm = np.zeros((n + 1, d))
    pc = np.zeros((n + 1, d, d))
    m_pred, p_pred = params["initial_mean"].copy(), qs[0].copy()
    for k in range(n + 1):
        pm[k], pc[k] = m_pred, p_pred
        hk = Hs[k]
        v = observations[k] - ms[k] - hk @ m_pred
        s = hk @ p_pred @ hk.T + Rs[k]
        s_inv = np.linalg.inv(s)
        gain = p_pred @ hk.T @ s_inv
        fm[k] = m_pred + gain @ v
        fc[k] = (np.eye(d) - gain @ hk) @ p_pred
        log_liks[k] = -0.5 * (
            v @ s_inv @ v + out * np.log(2 * np.pi) + np.linalg.slogdet(s)[1]
        )
        if k < n:
            m_pred = As[k] @ fm[k] + bs[k]
            p_pred = As[k] @ fc[k] @ As[k].T + qs[k + 1]
    return log_liks, fm, fc, pm, pc


def kf_sparse_forward_filter(params, H, R, y_sparse, obs_indices):
    """Sequential observation-space Kalman filter with observations on a
    sparse subset of the dense grid — the functional analogue of the
    reference's ``NumpyKalmanFilterWithSparseSites``
    (tests/tools/numpy_kalman_filter.py:384-466): prediction at every grid
    step, measurement update (and log-likelihood increment) only at the
    observed indices.

    ``H [out, d]`` or per-observation ``[n_obs, out, d]``; ``R [out, out]``
    shared across observations; ``y_sparse [n_obs, out]``;
    ``obs_indices [n_obs]`` strictly-increasing grid indices.

    Returns ``(log_liks [n_obs], filt_means [n+1, d], filt_covs)`` where
    the filtered moments at unobserved steps equal the predicted ones.
    """
    As = params["state_transitions"]
    bs = params["state_offsets"]
    n, d = As.shape[0], As.shape[-1]
    out = y_sparse.shape[-1]
    n_obs = len(obs_indices)
    chols = np.concatenate(
        [params["chol_initial_covariance"][None], params["chol_process_covariances"]],
        axis=0,
    )
    qs = chols @ np.swapaxes(chols, -1, -2)
    Hs = np.broadcast_to(H, (n_obs, out, d)) if H.ndim == 2 else H

    obs_at = {int(k): i for i, k in enumerate(obs_indices)}
    log_liks = np.zeros(n_obs)
    fm = np.zeros((n + 1, d))
    fc = np.zeros((n + 1, d, d))
    m, p = params["initial_mean"].copy(), qs[0].copy()
    for k in range(n + 1):
        i = obs_at.get(k)
        if i is not None:
            hk = Hs[i]
            v = y_sparse[i] - hk @ m
            s = hk @ p @ hk.T + R
            s_inv = np.linalg.inv(s)
            gain = p @ hk.T @ s_inv
            m = m + gain @ v
            p = (np.eye(d) - gain @ hk) @ p
            log_liks[i] = -0.5 * (
                v @ s_inv @ v + out * np.log(2 * np.pi) + np.linalg.slogdet(s)[1]
            )
        fm[k], fc[k] = m, p
        if k < n:
            m = As[k] @ m + bs[k]
            p = As[k] @ p @ As[k].T + qs[k + 1]
    return log_liks, fm, fc


def rts_backward_pass(params, fm, fc):
    """Sequential RTS smoother over the filtered moments (the reference's
    ``backward_smoothing_pass``, tests/tools/numpy_kalman_filter.py:137-178)."""
    As = params["state_transitions"]
    bs = params["state_offsets"]
    n = As.shape[0]
    qs = params["chol_process_covariances"] @ np.swapaxes(
        params["chol_process_covariances"], -1, -2
    )
    sm, sc = fm.copy(), fc.copy()
    for k in range(n - 1, -1, -1):
        m_pred = As[k] @ fm[k] + bs[k]
        p_pred = As[k] @ fc[k] @ As[k].T + qs[k]
        g = fc[k] @ As[k].T @ np.linalg.inv(p_pred)
        sm[k] = fm[k] + g @ (sm[k + 1] - m_pred)
        sc[k] = fc[k] + g @ (sc[k + 1] - p_pred) @ g.T
    return sm, sc

"""Fused Pallas scans (ops/pallas_scan.py) vs sequential NumPy recursions.

Runs in interpret mode off-TPU; the double-float arithmetic must agree with
exact f64 recursions to ~1e-13 absolute on O(10) values (49-bit effective
mantissa) — the precision contract that lets the TPU path replace the f64
XLA scans in the natural-parameter algebra.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vi_diffusion_processes_tpu.ops.pallas_scan import (
    linear_recurrence,
    riccati_d_sweep_df,
)

N = 5000  # nb=512, l=10 — exercises both lane- and sublane-level shifts


@pytest.fixture
def seqs(rng):
    kd = rng.uniform(2.0, 3.0, N)
    b2 = 0.2 * rng.uniform(0.5, 1.0, N)
    b2[-1] = 0.0
    t = rng.uniform(-0.999, 0.999, N)
    c = rng.normal(size=N)
    return kd, b2, t, c


def test_riccati_df_matches_sequential_f64(seqs):
    kd, b2, _, _ = seqs
    d_ref = np.empty(N)
    d_ref[-1] = kd[-1]
    for k in range(N - 2, -1, -1):
        d_ref[k] = kd[k] - b2[k] / d_ref[k + 1]
    d = riccati_d_sweep_df(jnp.asarray(kd), jnp.asarray(b2))
    np.testing.assert_allclose(d, d_ref, rtol=1e-12)


@pytest.mark.parametrize("reverse", [False, True], ids=["fwd", "rev"])
def test_linear_recurrence_df_matches_sequential(seqs, reverse):
    _, _, t, c = seqs
    x0 = 0.7
    x_ref = np.empty(N)
    acc = x0
    idx = range(N - 1, -1, -1) if reverse else range(N)
    for k in idx:
        acc = t[k] * acc + c[k]
        x_ref[k] = acc
    x = linear_recurrence(jnp.asarray(t), jnp.asarray(c), jnp.asarray(x0), reverse)
    scale = np.max(np.abs(x_ref))
    np.testing.assert_allclose(np.asarray(x) / scale, x_ref / scale, atol=1e-13)


def test_linear_recurrence_f32(seqs):
    _, _, t, c = seqs
    x_ref = np.empty(N)
    acc = 0.25
    for k in range(N):
        acc = t[k] * acc + c[k]
        x_ref[k] = acc
    x = linear_recurrence(
        jnp.asarray(t, jnp.float32), jnp.asarray(c, jnp.float32), jnp.float32(0.25), False
    )
    scale = np.max(np.abs(x_ref))
    np.testing.assert_allclose(np.asarray(x) / scale, x_ref / scale, atol=2e-6)


def test_linear_recurrence_gradients_match_fd(seqs):
    _, _, t, c = seqs
    t = jnp.asarray(t)
    c = jnp.asarray(c)
    x0 = jnp.asarray(0.7)

    def loss(args):
        tt, cc, xx0 = args
        return jnp.sum(jnp.sin(linear_recurrence(tt, cc, xx0, False)[::37]))

    g = jax.grad(loss)((t, c, x0))
    eps = 1e-6
    i = 123
    for j, (arr, garr) in enumerate([(t, g[0]), (c, g[1])]):
        up = [t, c, x0]
        dn = [t, c, x0]
        up[j] = arr.at[i].add(eps)
        dn[j] = arr.at[i].add(-eps)
        fd = (loss(tuple(up)) - loss(tuple(dn))) / (2 * eps)
        np.testing.assert_allclose(garr[i], fd, rtol=1e-5, atol=1e-8)
    fd0 = (loss((t, c, x0 + eps)) - loss((t, c, x0 - eps))) / (2 * eps)
    np.testing.assert_allclose(g[2], fd0, rtol=1e-5, atol=1e-8)


def test_riccati_df_gradients_match_fd(seqs):
    kd, b2, _, _ = seqs
    kd = jnp.asarray(kd)
    b2 = jnp.asarray(b2)

    def loss(args):
        kk, bb = args
        return jnp.sum(jnp.log(riccati_d_sweep_df(kk, bb)[::41]))

    g = jax.grad(loss)((kd, b2))
    eps = 1e-6
    i = 123
    fd = (loss((kd.at[i].add(eps), b2)) - loss((kd.at[i].add(-eps), b2))) / (2 * eps)
    np.testing.assert_allclose(g[0][i], fd, rtol=1e-5)
    fd = (loss((kd, b2.at[i].add(eps))) - loss((kd, b2.at[i].add(-eps)))) / (2 * eps)
    np.testing.assert_allclose(g[1][i], fd, rtol=1e-5)


def test_fused_dist_q_matches_xla_composition(rng):
    """The fused dist_q mega-kernel (riccati → solves → marginals in one
    pallas call) vs the f64 XLA composition, at f32-output resolution."""
    from vi_diffusion_processes_tpu.models.cvi_dp_packed import _dist_q_core
    from vi_diffusion_processes_tpu.ops.pallas_scan import dist_q_1d_planes

    n = 1500  # nb=512, l=3: padding + lane- and sublane-level shifts, but
    # few enough unrolled rows to keep interpret mode fast
    kd = rng.uniform(2.0, 3.0, n)
    ks = 0.4 * rng.uniform(-1.0, 1.0, n - 1)
    nat1 = jnp.asarray(rng.normal(size=n))
    nat2d = jnp.asarray(-0.5 * kd)
    nat2s = jnp.asarray(-ks)

    fused = dist_q_1d_planes(nat1, nat2d, nat2s)
    oracle = _dist_q_core(nat1, nat2d, nat2s, jnp.float64)
    names = ["a", "b", "qv", "mu0", "p0v", "means", "vars"]
    for nm, f, x in zip(names, fused, oracle):
        assert np.asarray(f).dtype == np.float32, nm
        np.testing.assert_allclose(
            np.asarray(f), np.asarray(x), rtol=2e-4, atol=1e-6, err_msg=nm
        )


def test_fused_dist_q_gradients_route_through_xla(rng):
    """custom_vjp bwd of the fused wrapper ≡ grads of the XLA composition."""
    from vi_diffusion_processes_tpu.models.cvi_dp_packed import (
        _dist_q_core,
        _dist_q_core_fused,
    )

    n = 1500
    kd = rng.uniform(2.0, 3.0, n)
    ks = 0.4 * rng.uniform(-1.0, 1.0, n - 1)
    nat1 = jnp.asarray(rng.normal(size=n))
    nat2d = jnp.asarray(-0.5 * kd)
    nat2s = jnp.asarray(-ks)

    def loss_fused(n1):
        out = _dist_q_core_fused(n1, nat2d, nat2s)
        return jnp.sum(out[5]) + jnp.sum(out[6])

    def loss_xla(n1):
        out = _dist_q_core(n1, nat2d, nat2s, jnp.float32)
        return jnp.sum(out[5]) + jnp.sum(out[6])

    g_f = jax.grad(loss_fused)(nat1)
    g_x = jax.grad(loss_xla)(nat1)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_x), rtol=1e-5, atol=1e-7)


def test_dispatch_equivalence_on_cpu_paths():
    """riccati_d_scalar / scalar_affine_all keep their XLA paths off-TPU —
    the pallas dispatch (backend == "tpu") must not fire here, and the
    pallas results must agree with those XLA paths anyway."""
    rng = np.random.default_rng(5)
    n = 8192
    kd = jnp.asarray(rng.uniform(2.0, 3.0, n))
    b2 = jnp.asarray(np.r_[0.2 * rng.uniform(0.5, 1.0, n - 1), 0.0])
    from vi_diffusion_processes_tpu.ops.btd import riccati_d_scalar, scalar_affine_all

    d_xla = riccati_d_scalar(kd, b2)
    d_pl = riccati_d_sweep_df(kd, b2)
    np.testing.assert_allclose(d_pl, d_xla, rtol=1e-12)

    t = jnp.asarray(rng.uniform(-0.99, 0.99, n))
    c = jnp.asarray(rng.normal(size=n))
    x_xla = scalar_affine_all(t, c, 0.3, reverse=True)
    x_pl = linear_recurrence(t, c, jnp.asarray(0.3), True)
    np.testing.assert_allclose(x_pl, x_xla, rtol=1e-10, atol=1e-12)


def test_vmap_routes_through_sequential_batching(seqs):
    """vmap of the Pallas entry points must agree with per-element calls.

    A raw vmapped ``pallas_call`` synthesizes a batching index map whose
    constants trace as i64 under x64 — Mosaic rejects it on TPU
    ("func.return (i32, i64, ...)"), so the entry points are
    ``sequential_vmap``-wrapped; this pins the batched semantics.
    """
    kd, b2, t, c = seqs
    kd2 = jnp.stack([jnp.asarray(kd), jnp.asarray(kd) * 1.1])
    b22 = jnp.stack([jnp.asarray(b2), jnp.asarray(b2) * 0.9])
    dv = jax.vmap(riccati_d_sweep_df)(kd2, b22)
    dl = jnp.stack([riccati_d_sweep_df(kd2[i], b22[i]) for i in range(2)])
    np.testing.assert_allclose(dv, dl, rtol=1e-12)

    t2 = jnp.stack([jnp.asarray(t), -jnp.asarray(t)])
    c2 = jnp.stack([jnp.asarray(c), 2.0 * jnp.asarray(c)])
    x0 = jnp.asarray([0.7, -0.3])
    xv = jax.vmap(lambda a, b, x: linear_recurrence(a, b, x))(t2, c2, x0)
    xl = jnp.stack([linear_recurrence(t2[i], c2[i], x0[i]) for i in range(2)])
    scale = float(jnp.max(jnp.abs(xl)))
    np.testing.assert_allclose(np.asarray(xv) / scale, np.asarray(xl) / scale,
                               atol=1e-13)

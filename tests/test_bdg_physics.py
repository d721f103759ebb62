"""BdG physics layer (physics/bdg.py) — the reference's planned
matmulK/matmulM/preconditioner capability (`TODO.md:281-291`)."""

import numpy as np
import jax
import jax.numpy as jnp

from lobpcg_tpu import Laplacian1D, SolverConfig, ilobpcg
from lobpcg_tpu.physics.bdg import (
    bdg_operators,
    bdg_positive_start,
    bdg_preconditioner,
)


def _setup(m, g, dtype=jnp.float64):
    """Uniform condensate in a Dirichlet box (psi = 1, mu = g): K and M
    share the discrete sine eigenbasis, so the Bogoliubov dispersion
    omega_k = sqrt(eps_k (eps_k + 2 g)) with eps_k the kinetic
    eigenvalues is exact for the discrete operators."""
    h = 1.0 / (m + 1)
    kinetic = Laplacian1D(scale=jnp.asarray(0.5 / (h * h), dtype), n=m)
    psi = jnp.ones((m,), dtype)
    A, B, K, M = bdg_operators(kinetic, psi, g=g, mu=g)
    eps = 2.0 / h**2 * np.sin(np.arange(1, m + 1) * np.pi * h / 2) ** 2
    omega = np.sqrt(eps * (eps + 2 * g))
    return A, B, K, M, np.sort(omega)


def test_k_and_m_operators():
    """K = H0 + V - mu + g n and M = K + 2 g n on the grid."""
    m, g = 32, 5.0
    h = 1.0 / (m + 1)
    kin = Laplacian1D(scale=jnp.asarray(0.5 / (h * h), jnp.float64), n=m)
    psi = jnp.asarray(np.linspace(0.5, 1.5, m))
    vt = jnp.asarray(np.linspace(0.0, 2.0, m))
    mu = 3.0
    _, _, K, M = bdg_operators(kin, psi, g=g, mu=mu, v_trap=vt)
    X = jnp.asarray(np.random.RandomState(0).randn(m, 3))
    n_dens = np.asarray(psi) ** 2
    K_exp = np.asarray(kin.matmat(X)) + (
        (np.asarray(vt) - mu + g * n_dens)[:, None] * np.asarray(X)
    )
    M_exp = K_exp + (2 * g * n_dens)[:, None] * np.asarray(X)
    np.testing.assert_allclose(np.asarray(K.matmat(X)), K_exp, atol=1e-10)
    np.testing.assert_allclose(np.asarray(M.matmat(X)), M_exp, atol=1e-10)


def test_bogoliubov_dispersion():
    """ilobpcg on the BdG pencil reproduces omega = sqrt(eps(eps+2g))."""
    m, g, nev, ss = 128, 50.0, 4, 8
    A, B, K, M, omega = _setup(m, g)
    X0 = bdg_positive_start(jax.random.PRNGKey(42), m, ss, jnp.float64)
    cfg = SolverConfig(nev=nev, size_sub=ss, tol=1e-8, max_iter=400)
    r = ilobpcg(A, X0, B, config=cfg)
    assert int(r.converged) == nev
    got = np.asarray(r.eigenvalues)
    np.testing.assert_allclose(got, omega[:nev], rtol=1e-6)
    assert np.all(np.asarray(r.signature) == 1)


def test_phonon_regime():
    """Low modes are phonon-like: omega ~ c k with c = sqrt(g) (units of
    the uniform gas), i.e. omega_1/omega_2 ~ 1/2 — not the free-particle
    1/4."""
    m, g = 256, 200.0
    _, _, _, _, omega = _setup(m, g)
    ratio = omega[0] / omega[1]
    assert abs(ratio - 0.5) < 0.05, ratio  # phonons: linear dispersion


def test_preconditioners():
    m, g, nev, ss = 128, 50.0, 3, 6
    A, B, K, M, omega = _setup(m, g)
    dt = jnp.float64
    h = 1.0 / (m + 1)
    diag_k = 1.0 / h**2 + 0.0 + g  # diag of kinetic + g n (mu = g)
    diag_A = jnp.concatenate([
        jnp.full((m,), diag_k + 2 * g, dt), jnp.full((m,), diag_k, dt)
    ])
    for T in (
        bdg_preconditioner(A, diag_A, kind="jacobi"),
        bdg_preconditioner(A, diag_A, kind="chebyshev",
                           hi=2.0 / h**2 + 3 * g, degree=6),
    ):
        X0 = bdg_positive_start(jax.random.PRNGKey(7), m, ss, dt)
        cfg = SolverConfig(nev=nev, size_sub=ss, tol=1e-7, max_iter=400)
        r = ilobpcg(A, X0, B, T, config=cfg)
        got = np.asarray(r.eigenvalues)
        np.testing.assert_allclose(got, omega[:nev], rtol=1e-5)


def test_dipolar_hook():
    """An extra exchange operator lands in M only."""
    from lobpcg_tpu import DiagonalOperator

    m, g = 16, 1.0
    h = 1.0 / (m + 1)
    kin = Laplacian1D(scale=jnp.asarray(0.5 / (h * h), jnp.float64), n=m)
    psi = jnp.ones((m,), jnp.float64)
    extra = DiagonalOperator(jnp.full((m,), 7.0))
    _, _, K, M = bdg_operators(kin, psi, g=g, mu=g, dipolar=extra)
    X = jnp.ones((m, 1))
    diff = np.asarray(M.matmat(X)) - np.asarray(K.matmat(X))
    np.testing.assert_allclose(diff, 2 * g + 7.0, atol=1e-12)

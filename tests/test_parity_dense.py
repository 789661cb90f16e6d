"""Convention parity against dense linear algebra: on a tiny grid,
materialize the covariance operators as explicit pixel-pixel matrices
and check logpdf / logdet / solve / sqrt against numpy. This pins the
same conventions the reference encodes (Omega_pix units, rfft
degeneracy weights, unnormalized FFTs) independently of any FFT
bookkeeping."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cmblensing_tpu.core.proj import ProjLambert
from cmblensing_tpu.core import field as F
from cmblensing_tpu.core.field import Field
from cmblensing_tpu.core.basis import MAP
from cmblensing_tpu.core.cov import Cl_to_Cov
from cmblensing_tpu.core.ops import logdet as op_logdet
from cmblensing_tpu.models.distributions import MvNormal
from cmblensing_tpu.utils.cls import Cls


@pytest.fixture(scope="module", autouse=True)
def _x64_module():
    prev = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", prev)


@pytest.fixture(scope="module")
def dense_setup(_x64_module):
    N = 8
    proj = ProjLambert(N, N, thetapix=30, T=np.float64)
    lmax = 1000  # beyond the grid's corner |l| so every mode is covered
    ell = np.arange(lmax + 1)
    # strictly positive spectrum over the whole grid so C is nonsingular
    Cl = Cls(ell, 1e-3 / (1 + ell) ** 2 + 1e-6)
    C = Cl_to_Cov("I", proj, Cl)
    # materialize dense pixel-pixel matrix by applying C to unit vectors
    cols = []
    for i in range(N * N):
        e = np.zeros((1, N, N))
        e[0, i // N, i % N] = 1.0
        col = (C @ Field(jnp.asarray(e), MAP, proj)).to(MAP).arr
        cols.append(np.asarray(col).ravel())
    M = np.stack(cols, axis=1)
    return proj, C, M, N


def test_dense_symmetric_posdef(dense_setup):
    proj, C, M, N = dense_setup
    assert np.abs(M - M.T).max() < 1e-10 * np.abs(M).max()
    evals = np.linalg.eigvalsh(M)
    assert evals.min() > 0


def test_logdet_matches_dense(dense_setup):
    proj, C, M, N = dense_setup
    ld_ops = float(op_logdet(C))
    sign, ld_dense = np.linalg.slogdet(M)
    assert sign > 0
    assert abs(ld_ops - ld_dense) < 1e-6 * abs(ld_dense)


def test_quadratic_form_matches_dense(dense_setup):
    proj, C, M, N = dense_setup
    rng = np.random.default_rng(0)
    z = rng.normal(size=(1, N, N))
    zf = Field(jnp.asarray(z), MAP, proj)
    q_ops = float(F.dot(zf, C.solve(zf)))
    q_dense = z.ravel() @ np.linalg.solve(M, z.ravel())
    assert abs(q_ops - q_dense) < 1e-8 * abs(q_dense)


def test_mvnormal_logpdf_matches_scipy(dense_setup):
    proj, C, M, N = dense_setup
    from scipy.stats import multivariate_normal
    rng = np.random.default_rng(1)
    z = rng.normal(size=(1, N, N)) * np.sqrt(np.diag(M).mean())
    zf = Field(jnp.asarray(z), MAP, proj)
    lp_ops = float(MvNormal(0, C).logpdf(zf))
    # our convention drops the n/2 log(2pi) constant (as the reference does)
    lp_scipy = multivariate_normal(mean=np.zeros(N * N), cov=M).logpdf(z.ravel())
    const = -0.5 * N * N * np.log(2 * np.pi)
    assert abs(lp_ops - (lp_scipy - const)) < 1e-6 * abs(lp_ops)


def test_sqrt_matches_dense(dense_setup):
    proj, C, M, N = dense_setup
    S = C.sqrt()
    rng = np.random.default_rng(2)
    z = rng.normal(size=(1, N, N))
    zf = Field(jnp.asarray(z), MAP, proj)
    s_ops = np.asarray((S @ (S @ zf)).to(MAP).arr).ravel()
    s_dense = M @ z.ravel()
    assert np.abs(s_ops - s_dense).max() < 1e-8 * np.abs(s_dense).max()


def test_simulation_covariance_matches_dense(dense_setup):
    """Empirical covariance of simulate() draws converges to the dense
    matrix (the reference's 'simulate = sqrt(C) randn' convention,
    src/specialops.jl:6)."""
    proj, C, M, N = dense_setup
    from cmblensing_tpu.core.ops import simulate_op
    keys = jax.random.split(jax.random.PRNGKey(0), 3000)
    xs = np.stack([np.asarray(simulate_op(k, C).to(MAP).arr).ravel() for k in keys])
    emp = xs.T @ xs / len(xs)
    scale = np.abs(np.diag(M)).max()
    assert np.abs(emp - M).max() < 0.15 * scale

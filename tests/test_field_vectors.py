"""FieldVector / FieldMatrix algebra (reference src/field_vectors.jl:7-94)."""
import numpy as np
import jax
import jax.numpy as jnp

from cmblensing_tpu.core.proj import ProjLambert
from cmblensing_tpu.core.field import Field, dot as fdot
from cmblensing_tpu.core.basis import Basis
from cmblensing_tpu.core.field_vectors import (
    FieldVector, FieldMatrix, gradient_vector, hessian_matrix,
    magnification_matrix)


def _mk(seed=0, N=16):
    proj = ProjLambert(N, N, thetapix=3, T=np.float32)
    key = jax.random.PRNGKey(seed)
    f = Field(jax.random.normal(key, (1, N, N)), Basis("I", "map"), proj)
    return proj, f


def test_vector_algebra_and_dot():
    proj, f = _mk()
    _, g = _mk(1)
    v = FieldVector(f, g)
    w = v + v
    assert float(jnp.max(jnp.abs(w[0].arr - 2 * f.arr))) < 1e-6
    # v' w = sum_i <v_i, w_i>
    assert abs(float(v.dot(v)) - (float(fdot(f, f)) + float(fdot(g, g)))) < 1e-2
    # pointwise dot
    pd = v.pointwise_dot(v)
    assert float(jnp.max(jnp.abs(pd.arr - (f.arr ** 2 + g.arr ** 2)))) < 1e-5


def test_gradient_vector_matches_gradient():
    from cmblensing_tpu.core.ops import gradient
    proj, f = _mk()
    v = gradient_vector(f)   # map-basis components (pointwise algebra)
    gx, gy = gradient(f)
    gxm = gx.to(gx.basis.with_space("map"))
    gym = gy.to(gy.basis.with_space("map"))
    scale = float(jnp.max(jnp.abs(gxm.arr))) + 1e-30
    assert float(jnp.max(jnp.abs(v[0].arr - gxm.arr))) < 1e-5 * scale
    assert float(jnp.max(jnp.abs(v[1].arr - gym.arr))) < 1e-5 * scale


def test_magnification_pinv_identity():
    """M(t) @ pinv(M(t)) v == v for a weak-lensing phi
    (src/field_vectors.jl:86-94 closed-form 2x2 inverse)."""
    proj, _ = _mk()
    N = proj.Ny
    phi_f = jnp.zeros((1, N, N // 2 + 1), dtype=jnp.complex64)
    phi_f = phi_f.at[0, 1, 1].set(5e-3)
    phi = Field(jnp.fft.irfft2(phi_f, s=(N, N)), Basis("I", "map"), proj)
    M = magnification_matrix(phi, t=1.0)
    _, vx = _mk(2)
    _, vy = _mk(3)
    v = FieldVector(vx, vy)
    w = M @ (M.pinv() @ v)
    for i in range(2):
        a = w[i].to(v[i].basis).arr
        assert float(jnp.max(jnp.abs(a - v[i].arr))) < 1e-4 * float(jnp.max(jnp.abs(v[i].arr)))


def test_matrix_sqrt_spd():
    """sqrt(M) @ sqrt(M) == M for SPD field matrices."""
    proj, _ = _mk()
    N = proj.Ny
    key = jax.random.PRNGKey(7)
    # SPD: A = [[2+a^2, ab],[ab, 2+b^2]] pointwise
    a = 0.3 * jax.random.normal(key, (1, N, N))
    b = 0.3 * jax.random.normal(jax.random.fold_in(key, 1), (1, N, N))
    B = Basis("I", "map")
    F_ = lambda x: Field(x.astype(jnp.float32), B, proj)
    M = FieldMatrix(((F_(2 + a * a), F_(a * b)), (F_(a * b), F_(2 + b * b))))
    S = M.sqrt()
    M2 = S @ S
    for i in range(2):
        for j in range(2):
            d = float(jnp.max(jnp.abs(M2[i, j].arr - M[i, j].arr)))
            assert d < 1e-5 * float(jnp.max(jnp.abs(M[i, j].arr))), (i, j, d)


def test_hessian_symmetry():
    proj, f = _mk()
    H = hessian_matrix(f)
    assert float(jnp.max(jnp.abs(H[0, 1].arr - H[1, 0].arr))) < 1e-6


def test_gradient_vector_pointwise_norm2():
    """gradient_vector components are map-basis, so norm2 is a true
    pointwise |grad f|^2 (code-review regression: Fourier-basis
    components made pointwise algebra coefficient-wise products)."""
    from cmblensing_tpu.core.ops import gradient
    proj, f = _mk(5)
    v = gradient_vector(f)
    gx, gy = gradient(f)
    gxm = gx.to(gx.basis.with_space("map")).arr
    gym = gy.to(gy.basis.with_space("map")).arr
    n2 = v.norm2().to(v.norm2().basis.with_space("map")).arr
    rel = float(jnp.max(jnp.abs(n2 - (gxm ** 2 + gym ** 2)))
                / jnp.max(jnp.abs(gxm ** 2 + gym ** 2)))
    assert rel < 1e-5, rel

"""Field-abstraction overhead: the reference asserts field ops cost
<=5% over raw array broadcasts (test/runbenchmarks.jl:77-93). Under
jit the abstraction is traced away entirely, so we can assert the
stronger property: the jaxpr of a field expression contains exactly
the same primitive operations as the raw-array expression — zero
overhead by construction."""
import numpy as np
import jax
import jax.numpy as jnp

from cmblensing_tpu.core.proj import ProjLambert
from cmblensing_tpu.core import field as F


def _eqn_prims(jaxpr):
    return sorted(str(e.primitive) for e in jaxpr.jaxpr.eqns)


def test_map_algebra_zero_overhead():
    proj = ProjLambert(16, 16, thetapix=3, T=np.float32)
    f = F.randn(jax.random.PRNGKey(0), proj, pol="I")
    g = F.randn(jax.random.PRNGKey(1), proj, pol="I")

    jx_field = jax.make_jaxpr(lambda a, b: (2.0 * a + b * a).arr)(f, g)
    jx_raw = jax.make_jaxpr(lambda a, b: 2.0 * a + b * a)(f.arr, g.arr)
    assert _eqn_prims(jx_field) == _eqn_prims(jx_raw)


def test_diag_apply_zero_overhead():
    from cmblensing_tpu.core.ops import Diag
    from cmblensing_tpu.core.field import Field
    from cmblensing_tpu.core.basis import MAP
    proj = ProjLambert(16, 16, thetapix=3, T=np.float32)
    f = F.randn(jax.random.PRNGKey(0), proj, pol="I")
    D = Diag(Field(jnp.ones_like(f.arr) * 2, MAP, proj))

    jx_field = jax.make_jaxpr(lambda D, f: (D @ f).arr)(D, f)
    jx_raw = jax.make_jaxpr(lambda d, a: d * a)(D.diag.arr, f.arr)
    assert _eqn_prims(jx_field) == _eqn_prims(jx_raw)


def test_fourier_conversion_is_just_fft():
    proj = ProjLambert(16, 16, thetapix=3, T=np.float32)
    f = F.randn(jax.random.PRNGKey(0), proj, pol="I")
    from cmblensing_tpu.ops import fft as cfft
    cfft.set_fft_mode("xla")
    try:
        jx = jax.make_jaxpr(lambda f: f.to(f.basis.with_space("fourier")).arr)(f)
        # jnp.fft.rfft2 wraps the fft primitive in an inner jit
        flat = str(jx)
        assert flat.count("fft[") == 1 and "add" not in flat, flat
    finally:
        cfft.set_fft_mode("auto")

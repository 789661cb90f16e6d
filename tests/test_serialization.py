"""Serialization round-trips (reference runtests.jl:83-113): fields,
projections (by-parameter, rehydrating through the memoized
constructor), operators, and datasets via pickle."""
import pickle

import numpy as np
import jax
import jax.numpy as jnp

from cmblensing_tpu.core.proj import ProjLambert
from cmblensing_tpu.core import field as F
from cmblensing_tpu.core.field import Field
from cmblensing_tpu.utils.transfer import device_get_safe


def _roundtrip(x):
    return pickle.loads(pickle.dumps(x))


def test_proj_singleton_roundtrip():
    p = ProjLambert(16, 16, thetapix=3, T=np.float32)
    p2 = _roundtrip(p)
    assert p2 is p  # rehydrates through the memoized constructor


def test_field_roundtrip():
    p = ProjLambert(16, 16, thetapix=3, T=np.float32)
    for pol in ["I", "QU", "IQU"]:
        f = F.randn(jax.random.PRNGKey(0), p, pol=pol)
        # pickle the host-side representation
        host = Field(device_get_safe(f.arr), f.basis, f.proj)
        f2 = _roundtrip(host)
        assert f2.basis == f.basis
        assert f2.proj is f.proj
        assert np.array_equal(np.asarray(f2.arr), np.asarray(f.arr))
        # fourier (complex) storage too
        g = f.to(f.basis.with_space("fourier"))
        g2 = _roundtrip(Field(device_get_safe(g.arr), g.basis, g.proj))
        assert np.allclose(np.asarray(g2.arr), np.asarray(g.arr))


def test_dataset_roundtrip():
    from cmblensing_tpu.models.dataset import load_sim
    out = load_sim(thetapix=3, Nside=16, pol="I", T=np.float32, seed=0)
    ds = out["ds"]
    host = jax.tree_util.tree_map(lambda x: device_get_safe(x) if hasattr(x, "shape") else x, ds)
    ds2 = _roundtrip(host)
    lp1 = float(ds.logpdf(f=out["f"], phi=out["phi"]))
    lp2 = float(ds2.logpdf(f=out["f"], phi=out["phi"]))
    assert abs(lp1 - lp2) < 1e-3 * abs(lp1)


def test_device_put_safe_complex_roundtrip():
    """device_put_safe stages complex leaves as float pairs (the
    tunneled-TPU transfer limitation); values must round-trip exactly
    on any device, including fields and DataSets."""
    import jax
    from cmblensing_tpu.utils.transfer import device_put_safe, cpu
    from cmblensing_tpu.core.proj import ProjLambert
    from cmblensing_tpu.core.field import Field
    from cmblensing_tpu.core.basis import Basis

    proj = ProjLambert(8, 8, thetapix=3, T=np.float32)
    key = jax.random.PRNGKey(0)
    arr = (jax.random.normal(key, (1, 8, 5))
           + 1j * jax.random.normal(jax.random.fold_in(key, 1), (1, 8, 5))
           ).astype(jnp.complex64)
    f = Field(arr, Basis("I", "fourier"), proj)
    dev = jax.devices("cpu")[0]
    f2 = device_put_safe(f, dev)
    assert f2.arr.dtype == jnp.complex64
    assert np.array_equal(np.asarray(f2.arr), np.asarray(arr))
    f3 = cpu(f2)
    assert np.array_equal(np.asarray(f3.arr), np.asarray(arr))

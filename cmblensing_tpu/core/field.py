"""Flat-sky fields as JAX pytrees.

TPU-native analog of the reference's BaseField{B,M,T,A}
(src/base_fields.jl:14) and its broadcasting machinery
(src/base_fields.jl:62-143): a Field wraps one jnp array of shape

    (*batch, ncomp, Ny, Nx)        in any map basis
    (*batch, ncomp, Ny, Nx//2+1)   (complex) in any fourier basis

plus static (basis, proj) metadata carried as pytree aux-data, so
Fields pass transparently through jit / grad / vmap / shard_map.

Basis conversions (src/proj_lambert.jl:243-300) are pure functions;
arithmetic between fields auto-promotes bases like the reference's
broadcast-style promotion (src/generic.jl:185-221).

The batch axis is *leading* (reference uses trailing dim 4,
src/proj_cartesian.jl:62-68) because XLA prefers minor-dim contiguity
for the FFT axes and a leading axis shards naturally over a device
mesh.
"""
from __future__ import annotations

import operator
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from .basis import (
    Basis, MAP, FOURIER, QU_MAP, QU_FOURIER, EB_MAP, EB_FOURIER,
    IQU_MAP, IQU_FOURIER, IEB_MAP, IEB_FOURIER,
    promote_basis, lense_basis, deriv_basis, harmonic_basis,
)
from .proj import ProjLambert
from ..ops import fft as _fft


@jax.tree_util.register_pytree_node_class
class Field:
    """A (possibly batched) flat-sky field in a given basis."""

    __slots__ = ("arr", "basis", "proj")

    def __init__(self, arr, basis: Basis, proj: ProjLambert):
        self.arr = arr
        self.basis = basis
        self.proj = proj

    # --- pytree protocol -------------------------------------------------
    def tree_flatten(self):
        return (self.arr,), (self.basis, self.proj)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)

    # --- convenience -----------------------------------------------------
    @property
    def ncomp(self):
        return self.basis.ncomp

    @property
    def batch_shape(self):
        return tuple(self.arr.shape[:-3])

    @property
    def Nbatch(self):
        bs = self.batch_shape
        return int(np.prod(bs)) if bs else 1

    @property
    def dtype(self):
        return self.arr.dtype

    @property
    def real_dtype(self):
        return jnp.float32 if self.arr.dtype in (jnp.float32, jnp.complex64) else jnp.float64

    def __repr__(self):
        return (f"Field<{self.basis!r}, {self.arr.shape}, {self.arr.dtype}, "
                f"{self.proj.Ny}x{self.proj.Nx}@{self.proj.thetapix}'>")

    # --- basis conversion ------------------------------------------------
    def to(self, basis) -> "Field":
        """Convert to the given basis (or basis-function)."""
        if callable(basis) and not isinstance(basis, Basis):
            basis = basis(self.basis)
        if basis == self.basis:
            return self
        return _convert(self, basis)

    # shorthand functional-basis conversions
    def to_lense(self):   # Ł
        return self.to(lense_basis(self.basis))

    def to_deriv(self):   # Ð
        return self.to(deriv_basis(self.basis))

    def to_harmonic(self):
        return self.to(harmonic_basis(self.basis))

    # --- component access ------------------------------------------------
    def __getitem__(self, k):
        """f['I'], f['E'], f['Q'], ... — extract a spin-0 sub-field, with
        automatic basis conversion like the reference's f[:El] etc.
        (src/proj_cartesian.jl:80-118). f['P'] extracts the spin-2 part
        of a spin-(0,2) field."""
        if not isinstance(k, str):
            raise TypeError("index fields with component names like f['E']")
        pol, space = self.basis.pol, self.basis.space
        if k == "P" and pol in ("IQU", "IEB"):
            sub = "QU" if pol == "IQU" else "EB"
            return Field(self.arr[..., 1:, :, :], Basis(sub, space), self.proj)
        if k == "IP":
            return self
        if k in ("I",):
            if pol == "I":
                target = self
            elif pol in ("IQU", "IEB"):
                target = self
            else:
                raise KeyError(k)
            i = 0
            return Field(target.arr[..., i:i + 1, :, :], Basis("I", space), self.proj)
        if k in ("Q", "U"):
            if pol in ("QU", "IQU"):
                target = self
            elif pol in ("EB", "IEB"):
                target = self.to(self.basis.with_pol("QU" if pol == "EB" else "IQU"))
            else:
                raise KeyError(k)
            off = 0 if target.basis.pol == "QU" else 1
            i = off + ("QU".index(k))
            return Field(target.arr[..., i:i + 1, :, :], Basis("I", target.basis.space), self.proj)
        if k in ("E", "B"):
            if pol in ("EB", "IEB"):
                target = self
            elif pol in ("QU", "IQU"):
                # E/B only defined in fourier; convert
                tb = Basis("EB" if pol == "QU" else "IEB", "fourier")
                target = self.to(tb)
            else:
                raise KeyError(k)
            off = 0 if target.basis.pol == "EB" else 1
            i = off + ("EB".index(k))
            return Field(target.arr[..., i:i + 1, :, :], Basis("I", target.basis.space), self.proj)
        raise KeyError(k)

    # --- arithmetic ------------------------------------------------------
    def _binop(self, other, op, reverse=False):
        if isinstance(other, Field):
            if other.proj is not self.proj:
                raise ValueError(
                    f"Can't combine fields with differing projections: "
                    f"{self.proj!r} vs {other.proj!r}")
            b = promote_basis(self.basis, other.basis)
            a1, a2 = self.to(b).arr, other.to(b).arr
            if reverse:
                a1, a2 = a2, a1
            return Field(op(a1, a2), b, self.proj)
        elif isinstance(other, (int, float, np.ndarray, jnp.ndarray)) or jnp.isscalar(other) or hasattr(other, "shape"):
            o = batch_broadcast(other, self)
            a1, a2 = (o, self.arr) if reverse else (self.arr, o)
            return Field(op(a1, a2), self.basis, self.proj)
        return NotImplemented

    def __add__(self, o):
        return self._binop(o, operator.add)

    def __radd__(self, o):
        return self._binop(o, operator.add, reverse=True)

    def __sub__(self, o):
        return self._binop(o, operator.sub)

    def __rsub__(self, o):
        return self._binop(o, operator.sub, reverse=True)

    def __mul__(self, o):
        return self._binop(o, operator.mul)

    def __rmul__(self, o):
        return self._binop(o, operator.mul, reverse=True)

    def __truediv__(self, o):
        return self._binop(o, operator.truediv)

    def __rtruediv__(self, o):
        return self._binop(o, operator.truediv, reverse=True)

    def __pow__(self, p):
        return Field(self.arr ** p, self.basis, self.proj)

    def __neg__(self):
        return Field(-self.arr, self.basis, self.proj)

    def __pos__(self):
        return self

    # --- linear-algebra-ish ----------------------------------------------
    def conj(self):
        return Field(jnp.conj(self.arr), self.basis, self.proj)

    def flatten(self):
        return self.arr.reshape(self.batch_shape + (-1,))


def batch_broadcast(x, f: Field):
    """Make a scalar or batched-scalar broadcastable against f.arr.

    A batched scalar (shape == f.batch_shape) is reshaped to
    (*batch, 1, 1, 1), mirroring the reference's BatchedReal
    (src/batching.jl:9, src/proj_lambert.jl:136-137)."""
    if jnp.isscalar(x) or (hasattr(x, "ndim") and x.ndim == 0):
        return x
    x = jnp.asarray(x)
    if x.shape == f.batch_shape:
        return x.reshape(x.shape + (1, 1, 1))
    return x


# --- basis conversion implementations ------------------------------------

def _qu_to_eb_fourier(arr, proj, has_i):
    """QU fourier -> EB fourier rotation (src/proj_lambert.jl:266-271):
       El = -Ql c2 - Ul s2 ;  Bl = Ql s2 - Ul c2"""
    c2 = jnp.asarray(proj.cos2phi)
    s2 = jnp.asarray(proj.sin2phi)
    off = 1 if has_i else 0
    Ql = arr[..., off, :, :]
    Ul = arr[..., off + 1, :, :]
    El = -Ql * c2 - Ul * s2
    Bl = Ql * s2 - Ul * c2
    parts = ([arr[..., 0, :, :]] if has_i else []) + [El, Bl]
    return jnp.stack(parts, axis=-3)


def _eb_to_qu_fourier(arr, proj, has_i):
    """EB fourier -> QU fourier rotation (src/proj_lambert.jl:253-258):
       Ql = -El c2 + Bl s2 ;  Ul = -El s2 - Bl c2"""
    c2 = jnp.asarray(proj.cos2phi)
    s2 = jnp.asarray(proj.sin2phi)
    off = 1 if has_i else 0
    El = arr[..., off, :, :]
    Bl = arr[..., off + 1, :, :]
    Ql = -El * c2 + Bl * s2
    Ul = -El * s2 - Bl * c2
    parts = ([arr[..., 0, :, :]] if has_i else []) + [Ql, Ul]
    return jnp.stack(parts, axis=-3)


def _convert(f: Field, b: Basis) -> Field:
    cur = f.basis
    arr = f.arr
    proj = f.proj
    # Path: (pol conversions happen in fourier space)
    # 1. if pol differs and we're in map space, go to fourier first
    if cur.pol != b.pol and cur.is_map:
        arr = _fft.rfft2(arr)
        cur = cur.with_space("fourier")
    # 2. pol rotation in fourier
    if cur.pol != b.pol:
        has_i = cur.pol.startswith("I")
        if (cur.pol in ("QU", "IQU")) and (b.pol in ("EB", "IEB")):
            arr = _qu_to_eb_fourier(arr, proj, has_i)
        elif (cur.pol in ("EB", "IEB")) and (b.pol in ("QU", "IQU")):
            arr = _eb_to_qu_fourier(arr, proj, has_i)
        else:
            raise ValueError(f"no conversion {cur} -> {b}")
        cur = cur.with_pol(b.pol)
    # 3. space conversion
    if cur.space != b.space:
        if b.is_fourier:
            arr = _fft.rfft2(arr)
        else:
            arr = _fft.irfft2(arr, proj.Nx)
        cur = cur.with_space(b.space)
    assert cur == b
    return Field(arr, b, proj)


# --- constructors ---------------------------------------------------------

def from_maps(arr, proj: ProjLambert, pol=None) -> Field:
    """Construct a map-basis Field from a raw array.

    arr: (Ny,Nx) or (ncomp,Ny,Nx) or (*batch,ncomp,Ny,Nx).
    pol: 'I', 'QU' or 'IQU' (inferred from ncomp if None).
    """
    arr = jnp.asarray(arr, dtype=proj.T.type)
    if arr.ndim == 2:
        arr = arr[None]
    ncomp = arr.shape[-3]
    if pol is None:
        pol = {1: "I", 2: "QU", 3: "IQU"}[ncomp]
    return Field(arr, Basis(pol, "map"), proj)


def zeros(proj: ProjLambert, basis: Basis = MAP, batch_shape=()) -> Field:
    shape = batch_shape + (basis.ncomp,) + (proj.shape_fourier if basis.is_fourier else proj.shape_map)
    dt = proj.complex_T if basis.is_fourier else proj.T
    return Field(jnp.zeros(shape, dtype=dt.type), basis, proj)


def zeros_like_field(f) -> Field:
    # duck-typed (arr, basis, proj) constructor: works for Field and
    # EquiRectField alike, keeping the generic inference stack
    # (argmaxf_logpdf etc.) curved-sky capable
    return type(f)(jnp.zeros_like(f.arr), f.basis, f.proj)


def randn(key, proj: ProjLambert, pol="I", batch_shape=()) -> Field:
    """Standard-normal white noise in the map basis (the reference's
    randn! convention, src/base_fields.jl:169-170)."""
    b = Basis(pol, "map")
    shape = batch_shape + (b.ncomp, proj.Ny, proj.Nx)
    return Field(jax.random.normal(key, shape, dtype=proj.T.type), b, proj)


def white_noise_like(key, f: Field, batch_shape=None) -> Field:
    """White noise matching f's pol/batch (or an explicit batch_shape),
    in map basis."""
    b = f.basis.with_space("map")
    bs = f.batch_shape if batch_shape is None else tuple(batch_shape)
    shape = bs + (b.ncomp, f.proj.Ny, f.proj.Nx)
    return Field(jax.random.normal(key, shape, dtype=f.proj.T.type), b, f.proj)


# --- reductions -----------------------------------------------------------

def dot(a: Field, b: Field):
    """Inner product (equals the pixel-space dot product). Computed in
    the harmonic basis by default with rfft degeneracy weights
    (src/proj_lambert.jl:318-328). Returns per-batch scalars. The
    reduction honors utils.summation.set_sum_mode
    (fast/kahan/float64 — reference src/util.jl:288-316)."""
    from ..utils.summation import asum
    if a.basis.is_map and b.basis.is_map and a.basis == b.basis:
        z = a.arr * b.arr
        return asum(z)
    ah = a.to_harmonic()
    bh = b.to(ah.basis)
    lam = jnp.asarray(ah.proj.lam_rfft)
    z = jnp.real(jnp.conj(ah.arr) * bh.arr) * lam
    return asum(z) / (ah.proj.Ny * ah.proj.Nx)


def norm(f: Field):
    return jnp.sqrt(dot(f, f))


def sum_field(f: Field):
    """Sum of all (pixel-basis) values (sum-mode aware)."""
    from ..utils.summation import asum
    fm = f.to(f.basis.with_space("map"))
    return asum(fm.arr)


# --- gradients w.r.t. fields ----------------------------------------------
#
# The mathematical gradient of a functional wrt a field satisfies
# dL = <g, df> under the *field* inner product (pixel-space dot). For a
# MAP-basis Field the raw-array cotangent from jax.grad coincides with
# that gradient; for a Fourier-stored field it differs by rfft
# degeneracy/normalization factors (the reference burns ~60 lines of
# adjoint bookkeeping on exactly this, src/autodiff.jl:27-57). We adopt
# the convention: field-gradients are taken wrt the map-space pixel
# DOF. fgrad/fvalue_and_grad convert the primal to its map basis, take
# jax.grad there, and return an honest gradient Field.

def _map_basis_of(f):
    return f.basis.with_space("map")


def fgrad(fn):
    """Gradient of scalar fn(field) as a map-basis gradient Field."""

    def gradfn(f: Field, *args, **kwargs):
        fm = f.to(_map_basis_of(f))

        def fa(arr):
            return fn(Field(arr, fm.basis, fm.proj), *args, **kwargs)

        g = jax.grad(fa)(fm.arr)
        return Field(g, fm.basis, fm.proj)

    return gradfn


def fvalue_and_grad(fn):
    def vg(f: Field, *args, **kwargs):
        fm = f.to(_map_basis_of(f))

        def fa(arr):
            return fn(Field(arr, fm.basis, fm.proj), *args, **kwargs)

        v, g = jax.value_and_grad(fa)(fm.arr)
        return v, Field(g, fm.basis, fm.proj)

    return vg


# --- batching (reference src/batching.jl, src/proj_lambert.jl:436-459) ----

def batch(fs):
    """Concatenate Fields (or stack a list) along a new leading batch axis."""
    if isinstance(fs, Field):
        return fs
    fs = list(fs)
    b = fs[0].basis
    fs = [f.to(b) for f in fs]
    return Field(jnp.stack([f.arr for f in fs], axis=0), b, fs[0].proj)


def unbatch(f: Field):
    """List of per-batch-index Fields."""
    if not f.batch_shape:
        return [f]
    arr = f.arr.reshape((-1,) + f.arr.shape[len(f.batch_shape):])
    return [Field(arr[i], f.basis, f.proj) for i in range(arr.shape[0])]


def batch_index(f: Field, i):
    if not f.batch_shape:
        raise ValueError("field is not batched")
    return Field(f.arr[i], f.basis, f.proj)


def batch_length(f) -> int:
    if isinstance(f, Field):
        return f.Nbatch
    if hasattr(f, "shape"):
        return int(np.prod(f.shape)) if np.ndim(f) else 1
    return 1


def repeat_batch(f: Field, n: int) -> Field:
    """Replicate an unbatched field n times along a new batch axis."""
    return Field(jnp.broadcast_to(f.arr[None], (n,) + f.arr.shape), f.basis, f.proj)


def batch_map(fn, fs):
    """Apply fn over batch entries (reference batch_map,
    src/batching.jl:58) — prefer jax.vmap for traced fns; this is the
    simple eager version over unbatched slices."""
    if isinstance(fs, Field):
        return batch([fn(f) for f in unbatch(fs)])
    return [fn(f) for f in fs]


def batch_vmap(fn, f: Field):
    """vmap fn over the leading batch axis of a Field (the sharded/
    accelerated replacement for the reference's batch_pmap)."""
    return jax.vmap(fn)(f)

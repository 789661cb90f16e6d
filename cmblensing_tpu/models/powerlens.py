"""PowerLens: Taylor-series lensing to arbitrary order
(reference src/powerlens.jl):

    f(x + grad phi) ~= sum_{a+b<=order} d1^a d2^b f * (d1 phi)^a (d2 phi)^b / a!b!
"""
from __future__ import annotations

from math import factorial

import jax
import jax.numpy as jnp

from ..core.basis import lense_basis, deriv_basis
from ..core.field import Field
from ..ops import fft as _fft


def _phi_grad_powers(phi: Field, order: int):
    from .lenseflow import _grad_f
    pm = phi.to(phi.basis.with_space("map"))
    gx, gy = _grad_f(pm.arr, pm.proj)   # (...,1,Ny,Nx) each
    p1 = {p: (1.0 if p == 0 else gx ** p) for p in range(order + 1)}
    p2 = {p: (1.0 if p == 0 else gy ** p) for p in range(order + 1)}
    return p1, p2


def _deriv_ab(f_fourier, a, b, proj):
    ilx = (1j * jnp.asarray(proj.lx))[None, :]
    ily = (1j * jnp.asarray(proj.ly))[:, None]
    return f_fourier * (ilx ** a) * (ily ** b)


@jax.tree_util.register_pytree_node_class
class PowerLens:
    """Series-expansion lensing operator (src/powerlens.jl:16-48)."""

    __slots__ = ("phi", "order", "_adjoint", "_sign")

    def __init__(self, phi: Field, order: int = 4, _adjoint=False, _sign=1):
        self.phi = phi
        self.order = order
        self._adjoint = _adjoint
        self._sign = _sign  # -1 lenses by -phi (antilensing)

    def tree_flatten(self):
        return (self.phi,), (self.order, self._adjoint, self._sign)

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(ch[0], *aux)

    def __call__(self, phi_or_theta):
        if isinstance(phi_or_theta, Field):
            return PowerLens(phi_or_theta, self.order, self._adjoint, self._sign)
        return self

    @property
    def H(self):
        return PowerLens(self.phi, self.order, not self._adjoint, self._sign)

    def __matmul__(self, f: Field) -> Field:
        B = f.basis
        proj = f.proj
        p1, p2 = _phi_grad_powers(self.phi, self.order)
        if self._sign < 0:
            p1 = {p: v * ((-1.0) ** p) for p, v in p1.items()}
            p2 = {p: v * ((-1.0) ** p) for p, v in p2.items()}
        if not self._adjoint:
            fl = f.to(lense_basis(B))
            Ff = _fft.rfft2(fl.arr)
            out = fl.arr
            for n in range(1, self.order + 1):
                for a in range(0, n + 1):
                    b = n - a
                    dab = _fft.irfft2(_deriv_ab(Ff, a, b, proj), proj.Nx)
                    out = out + p1[a] * p2[b] * dab / (factorial(a) * factorial(b))
            return Field(out, fl.basis, proj).to(B)
        else:
            # adjoint (src/powerlens.jl:50-58):
            # r = Ð(f) + sum (-1)^n d1^a d2^b Ð( p1^a p2^b Łf ) / a!b!
            fl = f.to(lense_basis(B))
            out = _fft.rfft2(fl.arr)
            for n in range(1, self.order + 1):
                for a in range(0, n + 1):
                    b = n - a
                    term = _fft.rfft2(p1[a] * p2[b] * fl.arr)
                    out = out + ((-1.0) ** n) * _deriv_ab(term, a, b, proj) / (
                        factorial(a) * factorial(b))
            return Field(out, deriv_basis(B), proj).to(B)

    def __repr__(self):
        return f"PowerLens(order={self.order}{', adjoint' if self._adjoint else ''})"


def antilensing(L: PowerLens) -> PowerLens:
    """PowerLens lensing by -phi (src/powerlens.jl:36-38)."""
    return PowerLens(L.phi, L.order, L._adjoint, -L._sign)

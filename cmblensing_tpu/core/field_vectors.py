"""Small vectors/matrices of fields and diagonal operators.

TPU-native analog of the reference's StaticArrays-based FieldVector /
FieldOrOpMatrix algebra (src/field_vectors.jl:7-94): 2-vectors of
fields (gradients), 2x2 matrices of Diag operators (lensing
magnification matrices), with the hand-written mul / pinv / sqrt / det
the reference implements for the 2x2 Diagonal case.

LenseFlow's hot path deliberately does NOT use these (it rebuilds the
2x2 inverse elementwise in-flight, models/lenseflow.py:62-83); this
module is the general, user-facing algebra for everything else
(deflection fields, magnification matrices, custom operators).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .field import Field, dot as field_dot
from .ops import Diag, gradient, gradhess


@jax.tree_util.register_pytree_node_class
class FieldVector:
    """A length-2 (or n) vector of fields: v = [vx, vy]."""

    __slots__ = ("components",)

    def __init__(self, *components):
        if len(components) == 1 and isinstance(components[0], (list, tuple)):
            components = tuple(components[0])
        self.components = tuple(components)

    def tree_flatten(self):
        return self.components, len(self.components)

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch)

    def __len__(self):
        return len(self.components)

    def __iter__(self):
        return iter(self.components)

    def __getitem__(self, i):
        return self.components[i]

    def _zip(self, other, op):
        if isinstance(other, FieldVector):
            assert len(other) == len(self)
            return FieldVector(*(op(a, b) for a, b in zip(self, other)))
        return FieldVector(*(op(a, other) for a in self))

    def __add__(self, o):
        return self._zip(o, lambda a, b: a + b)

    def __sub__(self, o):
        return self._zip(o, lambda a, b: a - b)

    def __mul__(self, o):
        return self._zip(o, lambda a, b: a * b)

    __rmul__ = __mul__

    def __neg__(self):
        return FieldVector(*(-a for a in self))

    def dot(self, other: "FieldVector"):
        """v' w = sum_i <v_i, w_i> (scalar, per batch)."""
        tot = None
        for a, b in zip(self, other):
            d = field_dot(a, b)
            tot = d if tot is None else tot + d
        return tot

    def outer(self, other: "FieldVector"):
        """v w' as a matrix of pointwise-product fields (map basis)."""
        rows = []
        for a in self:
            rows.append(tuple(a * b for b in other))
        return FieldMatrix(tuple(rows))

    def pointwise_dot(self, other: "FieldVector") -> Field:
        """sum_i v_i * w_i as a field (pointwise, e.g. p . grad f)."""
        out = None
        for a, b in zip(self, other):
            p = a * b
            out = p if out is None else out + p
        return out

    def norm2(self) -> Field:
        """Pointwise |v|^2 field."""
        return self.pointwise_dot(self)

    def __repr__(self):
        return f"FieldVector({len(self)} components)"


@jax.tree_util.register_pytree_node_class
class FieldMatrix:
    """An n x n matrix whose entries are fields or Diag-like operators
    (anything supporting +, *, @). Mirrors the reference's
    FieldOrOpMatrix with closed-form 2x2 pinv/sqrt/det
    (src/field_vectors.jl:42-94)."""

    __slots__ = ("rows",)

    def __init__(self, rows):
        self.rows = tuple(tuple(r) for r in rows)

    def tree_flatten(self):
        flat = [e for r in self.rows for e in r]
        return tuple(flat), (len(self.rows), len(self.rows[0]))

    @classmethod
    def tree_unflatten(cls, aux, ch):
        n, m = aux
        return cls(tuple(tuple(ch[i * m + j] for j in range(m)) for i in range(n)))

    @property
    def shape(self):
        return (len(self.rows), len(self.rows[0]))

    def __getitem__(self, ij):
        i, j = ij
        return self.rows[i][j]

    def _apply_entry(self, e, f):
        return e @ f if hasattr(e, "__matmul__") and not isinstance(e, Field) else e * f

    def __matmul__(self, v):
        if isinstance(v, FieldVector):
            out = []
            for row in self.rows:
                acc = None
                for e, c in zip(row, v):
                    t = self._apply_entry(e, c)
                    acc = t if acc is None else acc + t
                out.append(acc)
            return FieldVector(*out)
        if isinstance(v, FieldMatrix):
            n, m = self.shape
            _, p = v.shape
            rows = []
            for i in range(n):
                row = []
                for j in range(p):
                    acc = None
                    for k in range(m):
                        t = self.rows[i][k] * v.rows[k][j]
                        acc = t if acc is None else acc + t
                    row.append(acc)
                rows.append(tuple(row))
            return FieldMatrix(rows)
        return NotImplemented

    def __add__(self, o):
        assert isinstance(o, FieldMatrix) and o.shape == self.shape
        return FieldMatrix(tuple(tuple(a + b for a, b in zip(r1, r2))
                                 for r1, r2 in zip(self.rows, o.rows)))

    def __mul__(self, s):
        return FieldMatrix(tuple(tuple(s * e for e in r) for r in self.rows))

    __rmul__ = __mul__

    @property
    def T(self):
        n, m = self.shape
        return FieldMatrix(tuple(tuple(self.rows[j][i] for j in range(n))
                                 for i in range(m)))

    def det(self):
        """2x2 determinant (field/operator-valued)."""
        assert self.shape == (2, 2)
        (a, b), (c, d) = self.rows
        return a * d - b * c

    def _map_entries(self, fn):
        return FieldMatrix(tuple(tuple(fn(e) for e in r) for r in self.rows))

    def pinv(self):
        """Closed-form 2x2 inverse of a matrix of Diag ops / fields
        (src/field_vectors.jl:86-94)."""
        assert self.shape == (2, 2)
        (a, b), (c, d) = self.rows

        def _inv_entry(x):
            if isinstance(x, Diag):
                return Diag(Field(1.0 / x.diag.arr, x.diag.basis, x.diag.proj))
            if isinstance(x, Field):
                return Field(1.0 / x.arr, x.basis, x.proj)
            return 1.0 / x

        idet = _inv_entry(self.det())
        mul = lambda p, q: p * q
        return FieldMatrix(((mul(idet, d), mul(idet, -1 * b)),
                            (mul(idet, -1 * c), mul(idet, a))))

    def sqrt(self):
        """Principal square root of an SPD 2x2 matrix of Diag/field
        entries, via the closed form sqrt(M) = (M + sqrt(det) I) /
        sqrt(tr + 2 sqrt(det)) applied elementwise."""
        assert self.shape == (2, 2)
        (a, b), (c, d) = self.rows

        def _sqrt_e(x):
            if isinstance(x, Diag):
                return Diag(Field(jnp.sqrt(x.diag.arr), x.diag.basis, x.diag.proj))
            if isinstance(x, Field):
                return Field(jnp.sqrt(x.arr), x.basis, x.proj)
            return x ** 0.5

        def _rsqrt_e(x):
            if isinstance(x, Diag):
                return Diag(Field(1.0 / jnp.sqrt(x.diag.arr), x.diag.basis, x.diag.proj))
            if isinstance(x, Field):
                return Field(1.0 / jnp.sqrt(x.arr), x.basis, x.proj)
            return x ** -0.5

        s = _sqrt_e(self.det())
        t = _rsqrt_e(a + d + s + s)
        return FieldMatrix(((t * (a + s), t * b), (t * c, t * (d + s))))

    def __repr__(self):
        return f"FieldMatrix({self.shape})"


def _to_map(x):
    return x.to(x.basis.with_space("map"))


def gradient_vector(f: Field) -> FieldVector:
    """∇f as a FieldVector (reference ∇*f). Components are returned in
    the MAP basis: FieldVector/FieldMatrix algebra (pointwise_dot,
    norm2, outer, det, pinv, sqrt) is pointwise in pixel space, which
    would silently become coefficient-wise products on Fourier-basis
    components."""
    return FieldVector(*(_to_map(g) for g in gradient(f)))


def hessian_matrix(f: Field) -> FieldMatrix:
    """∇∇f as a 2x2 FieldMatrix (map-basis entries; see
    gradient_vector)."""
    _, H = gradhess(f)
    return FieldMatrix(tuple(tuple(_to_map(e) for e in row) for row in H))


def magnification_matrix(phi: Field, t=1.0) -> FieldMatrix:
    """M(t) = I + t ∇∇phi as a FieldMatrix of map-space fields — the
    lensing magnification matrix the reference builds with
    FieldOrOpMatrix (src/lenseflow.jl:137-140)."""
    _, H = gradhess(phi)
    to_map = lambda x: x.to(x.basis.with_space("map"))
    one = Field(jnp.ones_like(to_map(H[0][0]).arr),
                to_map(H[0][0]).basis, phi.proj)
    return FieldMatrix((
        (one + t * to_map(H[0][0]), t * to_map(H[0][1])),
        (t * to_map(H[1][0]), one + t * to_map(H[1][1]))))

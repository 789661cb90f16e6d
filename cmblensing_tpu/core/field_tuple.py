"""FieldTuple: a named tuple of fields acting as one field
(reference src/field_tuples.jl). In JAX most uses are served by plain
pytrees, but the explicit type provides the reference's API: component
arithmetic, dot products, basis conversion per component, and use as
the state in solvers/HMC."""
from __future__ import annotations

import operator

import jax
import jax.numpy as jnp

from .field import Field, dot as field_dot


@jax.tree_util.register_pytree_node_class
class FieldTuple:
    __slots__ = ("fields",)

    def __init__(self, **fields):
        self.fields = dict(fields)

    @classmethod
    def from_dict(cls, d):
        ft = cls()
        ft.fields.update(d)
        return ft

    def tree_flatten(self):
        keys = tuple(self.fields.keys())
        return tuple(self.fields[k] for k in keys), keys

    @classmethod
    def tree_unflatten(cls, keys, ch):
        return cls.from_dict(dict(zip(keys, ch)))

    def __getitem__(self, k):
        return self.fields[k]

    def __getattr__(self, k):
        try:
            return self.fields[k]
        except KeyError:
            raise AttributeError(k)

    def keys(self):
        return self.fields.keys()

    def items(self):
        return self.fields.items()

    def _binop(self, other, op):
        if isinstance(other, FieldTuple):
            return FieldTuple.from_dict(
                {k: op(v, other.fields[k]) for k, v in self.fields.items()})
        return FieldTuple.from_dict({k: op(v, other) for k, v in self.fields.items()})

    def __add__(self, o):
        return self._binop(o, operator.add)

    def __sub__(self, o):
        return self._binop(o, operator.sub)

    def __mul__(self, o):
        return self._binop(o, operator.mul)

    def __rmul__(self, o):
        return self._binop(o, lambda a, b: b * a)

    def __neg__(self):
        return FieldTuple.from_dict({k: -v for k, v in self.fields.items()})

    def to(self, basis):
        return FieldTuple.from_dict(
            {k: (v.to(basis) if isinstance(v, Field) else v)
             for k, v in self.fields.items()})

    def __repr__(self):
        return f"FieldTuple({', '.join(self.fields)})"


def ft_dot(a: FieldTuple, b: FieldTuple):
    tot = None
    for k in a.fields:
        d = field_dot(a.fields[k], b.fields[k]) if isinstance(a.fields[k], Field) \
            else jnp.sum(a.fields[k] * b.fields[k])
        tot = d if tot is None else tot + d
    return tot


class DiagFieldTuple:
    """Block-diagonal operator over a FieldTuple: one operator per
    component (reference Diagonal-of-FieldTuple,
    src/field_tuples.jl:131-141)."""

    def __init__(self, **ops):
        self.ops = dict(ops)

    def __matmul__(self, ft: FieldTuple):
        return FieldTuple.from_dict({k: (self.ops[k] @ v if k in self.ops else v)
                                     for k, v in ft.fields.items()})

    def solve(self, ft: FieldTuple):
        return FieldTuple.from_dict({k: (self.ops[k].solve(v) if k in self.ops else v)
                                     for k, v in ft.fields.items()})

    @property
    def H(self):
        return DiagFieldTuple(**{k: op.H for k, op in self.ops.items()})

    def pinv(self):
        return DiagFieldTuple(**{k: op.pinv() for k, op in self.ops.items()})


jax.tree_util.register_pytree_node(
    DiagFieldTuple,
    lambda d: (tuple(d.ops.values()), tuple(d.ops.keys())),
    lambda keys, ch: DiagFieldTuple(**dict(zip(keys, ch))),
)

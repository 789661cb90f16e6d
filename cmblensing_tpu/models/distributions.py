"""Gaussian distributions over fields (reference src/distributions.jl).

logpdf(MvNormal(mu, Sigma), f) = -( (f-mu)' Sigma^-1 (f-mu) + logdet Sigma ) / 2
rand = mu + sqrt(Sigma) @ whitenoise
"""
from __future__ import annotations

import jax

from ..core.field import Field, dot as field_dot
from ..core.ops import logdet as op_logdet, simulate_op


def _dot(a, b):
    from ..core.proj_equirect import EquiRectField, er_dot
    if isinstance(a, EquiRectField):
        return er_dot(a, b)
    return field_dot(a, b)


def _logdet(op):
    from ..core.proj_equirect import BlockDiagEquiRect
    if isinstance(op, BlockDiagEquiRect):
        return op.logabsdet()[0]
    return op_logdet(op)


def _simulate(key, op, batch_shape=()):
    from ..core.proj_equirect import BlockDiagEquiRect
    if isinstance(op, BlockDiagEquiRect):
        return op.simulate(key, batch_shape=batch_shape)
    return simulate_op(key, op, batch_shape=batch_shape)


class MvNormal:
    """Gaussian over fields with a field-operator covariance. Works for
    both Lambert Fields (Diag/BlockDiagIEB covariances) and EquiRect
    fields (BlockDiagEquiRect covariances, reference
    src/proj_equirect.jl:395-405)."""

    def __init__(self, mu, Sigma):
        self.mu = mu          # field or 0
        self.Sigma = Sigma    # operator

    def sample(self, key, batch_shape=()):
        xi = _simulate(key, self.Sigma, batch_shape=batch_shape)
        if not isinstance(self.mu, (int, float)):
            return self.mu + xi
        return xi

    def logpdf(self, f):
        z = f - self.mu if not isinstance(self.mu, (int, float)) else f
        quad = _dot(z, self.Sigma.solve(z))
        return -(quad + _logdet(self.Sigma)) / 2


jax.tree_util.register_pytree_node(
    MvNormal,
    lambda d: ((d.mu, d.Sigma), None),
    lambda aux, ch: MvNormal(*ch),
)

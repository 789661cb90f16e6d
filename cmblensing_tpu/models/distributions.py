"""Gaussian distributions over fields (reference src/distributions.jl).

logpdf(MvNormal(mu, Sigma), f) = -( (f-mu)' Sigma^-1 (f-mu) + logdet Sigma ) / 2
rand = mu + sqrt(Sigma) @ whitenoise
"""
from __future__ import annotations

import jax

from ..core.field import Field, dot as field_dot
from ..core.ops import logdet as op_logdet, simulate_op


class MvNormal:
    """Gaussian over fields with a field-operator covariance."""

    def __init__(self, mu, Sigma):
        self.mu = mu          # Field or 0
        self.Sigma = Sigma    # operator

    def sample(self, key, batch_shape=()):
        xi = simulate_op(key, self.Sigma, batch_shape=batch_shape)
        if isinstance(self.mu, Field):
            return self.mu + xi
        return xi

    def logpdf(self, f: Field):
        z = f - self.mu if isinstance(self.mu, Field) else f
        quad = field_dot(z, self.Sigma.solve(z))
        return -(quad + op_logdet(self.Sigma)) / 2


jax.tree_util.register_pytree_node(
    MvNormal,
    lambda d: ((d.mu, d.Sigma), None),
    lambda aux, ch: MvNormal(*ch),
)

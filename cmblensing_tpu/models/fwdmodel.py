"""Mini-PPL: generative models as plain Python functions with `sample`
statements, compiled into paired simulate/logpdf by effect handlers.

TPU-native equivalent of the reference's @fwdmodel macro
(src/simpleppl.jl:7-101), which AST-rewrites `~` statements. Here the
model author writes

    def model(ds, theta, sample):
        f   = sample("f",   MvNormal(0, ds.Cf(theta)))
        phi = sample("phi", MvNormal(0, ds.Cphi(theta)))
        ft  = ds.L(phi) @ f
        mu  = ds.M(theta) @ (ds.B(theta) @ ft)
        d   = sample("d",   MvNormal(mu, ds.Cn(theta)))
        return dict(f=f, phi=phi, ft=ft, d=d)

and gets `simulate(model)` / `logpdf(model)`: conditioning = passing a
value for a named variable; unconditioned variables are drawn
(simulate) or must be provided (logpdf). Everything stays jit-able:
keys are split deterministically per site name.
"""
from __future__ import annotations

import jax


def simulate(model):
    """Returns sim(key, *args, **conditioned) drawing all unconditioned
    sample sites and returning the model's return value."""

    def sim(key, *args, **conditioned):
        import zlib
        seen = set()

        def sample(name, dist):
            seen.add(name)
            if name in conditioned and conditioned[name] is not None:
                return conditioned[name]
            # key by a stable hash of the SITE NAME, not a positional
            # counter: conditioning on one site must not change the
            # draws of the others (and two sites must never share a key)
            k = jax.random.fold_in(key, zlib.crc32(name.encode()))
            return dist.sample(k)

        out = model(*args, sample=sample)
        unknown = set(conditioned) - seen
        if unknown:
            raise ValueError(f"conditioned on unknown site(s) {sorted(unknown)}; "
                             f"model sites are {sorted(seen)}")
        return out

    return sim


def logpdf(model):
    """Returns lp(*args, **values) summing site logpdfs of all provided
    values (sites without a value raise)."""

    def lp(*args, **values):
        total = [0.0]

        def sample(name, dist):
            if name not in values or values[name] is None:
                raise ValueError(f"logpdf requires a value for site '{name}'")
            v = values[name]
            total[0] = total[0] + dist.logpdf(v)
            return v

        model(*args, sample=sample)
        return total[0]

    return lp


def loglikelihood(model, latents):
    """logpdf of only the sites NOT in `latents` (the likelihood part),
    reference src/simpleppl.jl:94."""

    def ll(*args, **values):
        total = [0.0]

        def sample(name, dist):
            if name not in values or values[name] is None:
                raise ValueError(
                    f"loglikelihood requires a value for site '{name}'")
            v = values[name]
            if name not in latents:
                total[0] = total[0] + dist.logpdf(v)
            return v

        model(*args, sample=sample)
        return total[0]

    return ll

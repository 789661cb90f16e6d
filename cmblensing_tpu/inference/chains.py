"""Chain containers, loading, and statistics (reference src/chains.jl)."""
from __future__ import annotations

import os
import pickle

import numpy as np

from ..core.field import Field, batch_index, batch_length


class Chain(list):
    """One chain: a list of state dicts, with recursive key indexing:
    chain['phi'] returns the list of phi samples (reference Chain,
    src/chains.jl:90-111)."""

    def __getitem__(self, k):
        if isinstance(k, str):
            return [state.get(k) for state in self]
        return super().__getitem__(k)

    def last(self, k):
        for state in reversed(self):
            if k in state and state[k] is not None:
                return state[k]
        return None


class Chains(list):
    """A list of Chain (src/chains.jl:113-138)."""

    def __init__(self, chains):
        super().__init__([c if isinstance(c, Chain) else Chain(c) for c in chains])

    def __getitem__(self, k):
        if isinstance(k, str):
            return [c[k] for c in self]
        return super().__getitem__(k)


def load_chains(filename, burnin=0, thin=1, join=False, unbatch_chains=True):
    """Reassemble chains from the checkpoint record file written by
    sample_joint (reference load_chains, src/chains.jl:45-86)."""
    from ..native import read_records
    path = f"{filename}.ckpt"
    if not os.path.exists(path):
        raise FileNotFoundError(f"no chain checkpoint at {path}")
    chunks = [pickle.loads(r)["chunk"] for r in read_records(path)]
    if not chunks:
        raise FileNotFoundError(f"no valid records in {path}")
    chain = [s for ch in chunks for s in ch]
    chain = chain[burnin::thin]

    # a batched chain (leading chain axis on fields) unbatches into
    # per-chain Chains (src/chains.jl:151-177)
    if unbatch_chains:
        nb = 1
        for s in chain:
            for v in s.values():
                if isinstance(v, Field) and v.batch_shape:
                    nb = max(nb, v.batch_shape[0])
        if nb > 1:
            out = []
            for b in range(nb):
                cb = []
                for s in chain:
                    sb = {}
                    for k, v in s.items():
                        if isinstance(v, Field) and v.batch_shape:
                            sb[k] = batch_index(v, b)
                        elif isinstance(v, np.ndarray) and v.ndim >= 1 and v.shape[0] == nb:
                            sb[k] = v[b]
                        else:
                            sb[k] = v
                    cb.append(sb)
                out.append(cb)
            chains = Chains(out)
        else:
            chains = Chains([chain])
    else:
        chains = Chains([chain])
    if join:
        joined = Chain([s for c in chains for s in c])
        return Chains([joined])
    return chains


def effective_sample_size(x):
    """ESS via the initial-positive-sequence autocorrelation estimator."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    if n < 4:
        return float(n)
    x = x - x.mean()
    acf = np.correlate(x, x, mode="full")[n - 1:] / (np.arange(n, 0, -1) * (x.var() + 1e-300))
    # sum pairs until a pair goes negative (Geyer)
    tau = 1.0
    for k in range(1, n // 2):
        pair = acf[2 * k - 1] + acf[2 * k] if 2 * k < n else acf[2 * k - 1]
        if pair < 0:
            break
        tau += 2 * pair
    return float(n / max(tau, 1.0))


def mean_std_and_errors(samples, nbootstrap=200, seed=0):
    """Mean/std with bootstrap + ESS uncertainties on each
    (reference mean_std_and_errors, src/chains.jl:188-200)."""
    x = np.asarray(samples, dtype=np.float64)
    ess = effective_sample_size(x)
    rng = np.random.default_rng(seed)
    means, stds = [], []
    n = len(x)
    block = max(1, int(n / max(ess, 1)))
    nblocks = n // block
    for _ in range(nbootstrap):
        idx = rng.integers(0, nblocks, nblocks)
        resampled = np.concatenate([x[i * block:(i + 1) * block] for i in idx])
        means.append(resampled.mean())
        stds.append(resampled.std())
    return dict(mean=float(x.mean()), std=float(x.std()),
                mean_err=float(np.std(means)), std_err=float(np.std(stds)),
                ess=ess)


def kde(samples, grid=None, bw_scale=1.0):
    """1-D or 2-D KDE of samples (reference uses getdist,
    src/chains.jl:236-260; here scipy's gaussian_kde)."""
    from scipy.stats import gaussian_kde
    x = np.asarray(samples, dtype=np.float64)
    k = gaussian_kde(x.T if x.ndim == 2 else x)
    k.set_bandwidth(k.factor * bw_scale)
    if grid is None:
        if x.ndim == 1:
            grid = np.linspace(x.min(), x.max(), 200)
        else:
            gx = np.linspace(x[:, 0].min(), x[:, 0].max(), 100)
            gy = np.linspace(x[:, 1].min(), x[:, 1].max(), 100)
            XX, YY = np.meshgrid(gx, gy)
            return (gx, gy, k(np.stack([XX.ravel(), YY.ravel()])).reshape(100, 100))
    return grid, k(grid)

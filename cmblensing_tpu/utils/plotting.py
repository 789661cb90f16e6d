"""Plotting of fields, spectra, and chains (reference src/plots.jl and
ext/CMBLensingPythonPlotExt.jl). Host-side matplotlib; import is lazy
so headless/batch use never pays for it."""
from __future__ import annotations

import numpy as np

from ..core.field import Field, unbatch


def _plt():
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt
    return plt


def plot_map(f: Field, comp=None, ax=None, title=None, vlim=None, cmap="RdBu_r",
             colorbar=True):
    """Heatmap of a (component of a) field in map basis with physical
    axes in degrees (reference plot recipe, src/plots.jl:4-38)."""
    plt = _plt()
    if comp is not None:
        f = f[comp]
    fm = f.to(f.basis.with_space("map"))
    arr = np.asarray(fm.arr)
    while arr.ndim > 2:
        arr = arr[0]
    proj = f.proj
    ext_x = proj.Nx * proj.thetapix / 60
    ext_y = proj.Ny * proj.thetapix / 60
    if ax is None:
        _, ax = plt.subplots()
    if vlim is None:
        vlim = np.percentile(np.abs(arr), 99.5)
    im = ax.imshow(arr, extent=[-ext_x / 2, ext_x / 2, -ext_y / 2, ext_y / 2],
                   vmin=-vlim, vmax=vlim, cmap=cmap, origin="lower")
    ax.set_xlabel("x [deg]")
    ax.set_ylabel("y [deg]")
    if title:
        ax.set_title(title)
    if colorbar:
        plt.colorbar(im, ax=ax)
    return ax


def plot_maps(fields, titles=None, ncol=None, **kwargs):
    """Grid of map plots, like plot([f1 f2; ...]) in the reference."""
    plt = _plt()
    fields = list(fields)
    n = len(fields)
    ncol = ncol or min(n, 3)
    nrow = (n + ncol - 1) // ncol
    fig, axes = plt.subplots(nrow, ncol, figsize=(4 * ncol, 3.2 * nrow), squeeze=False)
    for i, f in enumerate(fields):
        ax = axes[i // ncol][i % ncol]
        plot_map(f, ax=ax, title=(titles[i] if titles else None), **kwargs)
    for j in range(n, nrow * ncol):
        axes[j // ncol][j % ncol].axis("off")
    fig.tight_layout()
    return fig


def plot_cls(cls_list, labels=None, ax=None, Dl=True, loglog=True):
    """Plot one or more Cls (reference Cℓ recipe, src/plots.jl:40)."""
    plt = _plt()
    if ax is None:
        _, ax = plt.subplots()
    if not isinstance(cls_list, (list, tuple)):
        cls_list = [cls_list]
    for i, cl in enumerate(cls_list):
        ell = np.asarray(cl.ell)
        y = np.asarray(cl.Cl)
        if Dl:
            y = ell * (ell + 1) * y / (2 * np.pi)
        lbl = labels[i] if labels else None
        ax.plot(ell, y, label=lbl)
    if loglog:
        ax.set_xscale("log")
        ax.set_yscale("log")
    ax.set_xlabel(r"$\ell$")
    ax.set_ylabel(r"$D_\ell$" if Dl else r"$C_\ell$")
    if labels:
        ax.legend()
    return ax


def plot_kde(samples, samples2=None, ax=None, levels=(0.68, 0.95), label=None):
    """1-D or 2-D KDE plot of chain samples (reference KDE contour
    recipes, src/plots.jl:44-62)."""
    plt = _plt()
    from ..inference.chains import kde
    if ax is None:
        _, ax = plt.subplots()
    if samples2 is None:
        grid, dens = kde(np.asarray(samples))
        ax.plot(grid, dens, label=label)
        ax.set_ylabel("density")
    else:
        xy = np.stack([np.asarray(samples), np.asarray(samples2)], axis=1)
        gx, gy, dens = kde(xy)
        # contour levels enclosing the requested probability mass
        d = np.sort(dens.ravel())[::-1]
        cum = np.cumsum(d) / d.sum()
        lvls = sorted(d[np.searchsorted(cum, lv)] for lv in levels)
        ax.contour(gx, gy, dens, levels=lvls)
    return ax


def animate(fields, filename, fps=5, **kwargs):
    """Write an animation of a list of fields (reference `animate`,
    ext/CMBLensingPythonPlotExt.jl)."""
    plt = _plt()
    import matplotlib.animation as manim
    fig, ax = plt.subplots()
    ims = []
    for f in fields:
        fm = f.to(f.basis.with_space("map"))
        arr = np.asarray(fm.arr)
        while arr.ndim > 2:
            arr = arr[0]
        im = ax.imshow(arr, animated=True, **kwargs)
        ims.append([im])
    ani = manim.ArtistAnimation(fig, ims, interval=1000 // fps)
    ani.save(filename, fps=fps)
    return filename

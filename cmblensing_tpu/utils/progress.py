"""Progress reporting — the TPU-side analog of the reference's
ProgressMeter bars (src/maximization.jl:150,209-216; src/sampling.jl
:457-462; DistributedProgress src/util_parallel.jl:127-146).

In the single-controller SPMD model there are no remote workers to
merge bars from — one host drives every chip — so a plain tqdm bar on
the host loop with per-step postfix values covers both the local and
the "distributed" progress story. Falls back to prints when tqdm is
unavailable or progress is a falsy value.

Use:
    with progress_bar(total=nsteps, desc="MAP_joint", enabled=progress) as pb:
        ...
        pb.update(logpdf=lp, alpha=alpha)
"""
from __future__ import annotations

import contextlib


class _Bar:
    def __init__(self, total, desc, enabled):
        self.enabled = bool(enabled)
        self._tqdm = None
        self._n = 0
        self._total = total
        self._desc = desc
        if self.enabled:
            try:
                from tqdm import tqdm
                self._tqdm = tqdm(total=total, desc=desc, leave=True,
                                  dynamic_ncols=True)
            except Exception:
                self._tqdm = None

    def update(self, **showvalues):
        """Advance one step, displaying showvalues (reference's
        `showvalues` pairs) as the bar postfix."""
        if not self.enabled:
            return
        self._n += 1
        if self._tqdm is not None:
            if showvalues:
                self._tqdm.set_postfix(
                    {k: (f"{v:.4g}" if isinstance(v, float) else v)
                     for k, v in showvalues.items()}, refresh=False)
            self._tqdm.update(1)
        else:
            vals = " ".join(f"{k}={v:.4g}" if isinstance(v, float)
                            else f"{k}={v}" for k, v in showvalues.items())
            print(f"{self._desc} {self._n}/{self._total}: {vals}", flush=True)

    def close(self):
        if self._tqdm is not None:
            self._tqdm.close()


@contextlib.contextmanager
def progress_bar(total, desc, enabled=True):
    bar = _Bar(total, desc, enabled)
    try:
        yield bar
    finally:
        bar.close()

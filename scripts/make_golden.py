"""Generate tests/golden_values.json.

Two classes of golden numbers (PARITY.md discusses why there is no
live Julia runtime in this environment):

1. *External anchors* — lensed band spectra compared against CAMB's
   lensed_scalar theory (dat/default_camb_cls.npz, produced by CAMB
   itself, fully independent of this implementation). The Julia
   reference reproduces CAMB lensed spectra by construction, so
   agreement with CAMB to sample variance pins agreement with the
   reference (docs/src/01_lense_a_map.md).

2. *Frozen regression values* — fiducial logpdf / MAP correlation at
   fixed seeds, frozen from the implementation at the commit that
   generated this file, to catch any future numerical drift. Dense
   convention parity vs the reference is covered separately
   (tests/test_parity_dense.py).
"""
import json
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_default_device", jax.devices("cpu")[0])

from cmblensing_tpu.models.dataset import load_sim
from cmblensing_tpu.models.lenseflow import LenseFlow
from cmblensing_tpu.utils.cls import camb
from cmblensing_tpu.utils.spectra import get_Cl
from cmblensing_tpu.inference.maximization import MAP_joint
from cmblensing_tpu.core import field as F


def lensed_spectra_anchor(nseeds=4):
    """Mean lensed TT/EE/BB band power over CAMB lensed theory, per
    100-wide ell bin in [300, 2000], averaged over seeds."""
    Cl = camb()
    ledges = np.arange(300, 2001, 100)
    out = {}
    camb_key = {"I": "TT", "E": "EE", "B": "BB"}
    for pol, comps in [("I", ["I"]), ("P", ["E", "B"])]:
        ratios = {c: [] for c in comps}
        for seed in range(nseeds):
            o = load_sim(thetapix=3, Nside=256, pol=pol, T=np.float32,
                         seed=seed)
            f = o["f"].to(o["f"].basis.with_space("map"))
            phi = o["phi"].to(o["phi"].basis.with_space("map"))
            f_len = LenseFlow(phi, 7) @ f
            for c in comps:
                bp = get_Cl(f_len[c], ledges=ledges)
                th = Cl["lensed_scalar"][camb_key[c]](bp.ell)
                ratios[c].append(np.asarray(bp.Cl) / np.asarray(th))
        for c in comps:
            r = np.mean(ratios[c], axis=0)
            out[f"lensed_{camb_key[c]}_over_camb"] = dict(
                ell=[float(x) for x in bp.ell],
                ratio=[float(x) for x in r])
    return out


def frozen_values():
    o = load_sim(thetapix=3, Nside=64, pol="P", T=np.float32, seed=0)
    ds, f, phi = o["ds"], o["f"], o["phi"]
    lp = float(jax.jit(lambda ds, f, phi: jnp.sum(ds.logpdf(f=f, phi=phi)))(
        ds, f, phi))
    oi = load_sim(thetapix=3, Nside=64, pol="I", T=np.float32, seed=0)
    lpi = float(jax.jit(lambda ds, f, phi: jnp.sum(ds.logpdf(f=f, phi=phi)))(
        oi["ds"], oi["f"], oi["phi"]))

    # 128^2 pol MAP correlation, unmasked
    o2 = load_sim(thetapix=3, Nside=128, pol="P", T=np.float32, seed=0)
    res = MAP_joint(o2["ds"], nsteps=8,
                    conjgrad_kwargs=dict(tol=1e-1, nsteps=100))
    pt = o2["phi"]
    pm = res["phi"].to(pt.basis)
    corr = float(F.dot(pm, pt) / (F.norm(pm) * F.norm(pt)))
    return dict(logpdf_P_64=lp, logpdf_I_64=lpi, map_corr_P_128=corr)


if __name__ == "__main__":
    golden = dict(anchors=lensed_spectra_anchor(), frozen=frozen_values())
    path = os.path.join(os.path.dirname(__file__), "..", "tests",
                        "golden_values.json")
    with open(path, "w") as fh:
        json.dump(golden, fh, indent=1)
    print(json.dumps(golden["frozen"], indent=1))
    print("wrote", path)

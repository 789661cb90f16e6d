"""One-time algebraic correction of dat/default_camb_cls.npz phiphi.

The shipped fiducial was converted from the reference's cached
dat/default_camb_Cls.jld2, whose Cl^phiphi was produced by the
reference's live camb path dividing CAMB's [L(L+1)]^2 C_L^pp / 2pi
output by ell^4 (src/cls.jl:186) instead of (ell(ell+1))^2 — the
convention CAMB documents and the reference's own file-reading path
uses (src/cls.jl:236). That leaves the stored spectrum biased high by
(1+1/L)^2 (21% at L=10, 2% at L=100).

The fix is exact algebra on the stored arrays (no CAMB needed):
multiply every *_pp spectrum by (L/(L+1))^2. Idempotence is guarded by
a marker key so rerunning is a no-op.
"""
import os
import sys

import numpy as np

DAT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "cmblensing_tpu", "dat", "default_camb_cls.npz")
MARKER = "pp_convention"


def main():
    z = dict(np.load(DAT))
    if MARKER in z:
        print(f"already corrected ({z[MARKER]}); nothing to do")
        return 0
    n = 0
    for k in list(z):
        if k.endswith("_pp"):
            ell = z[k + "_l"].astype(np.float64)
            z[k] = z[k] * (ell / (ell + 1.0)) ** 2
            n += 1
    z[MARKER] = np.array("camb:[L(L+1)]^2/2pi")
    np.savez_compressed(DAT, **z)
    print(f"corrected {n} phiphi spectra in {DAT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

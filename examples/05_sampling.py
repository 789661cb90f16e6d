"""Gibbs/HMC sampling of the joint lensing posterior
(mirrors the reference's sampling workflow, docs/src + sample_joint).

Runs short chains with theta (Aphi) slice-sampling, checkpoints them,
and reloads with burn-in removal.
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
FAST = bool(int(os.environ.get("CMBL_EXAMPLE_FAST", "0")))  # CI smoke lane


import numpy as np
import jax

# pin the CPU platform unless the user asks for an accelerator: the
# tunneled-TPU plugin's backend init blocks indefinitely when its
# tunnel is down, which would hang any jax.devices() call below
if os.environ.get("CMBL_EXAMPLE_DEVICE", "cpu") == "cpu":
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass


cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    from cmblensing_tpu import load_sim, sample_joint, load_chains, mean_std_and_errors

    out = load_sim(thetapix=3, Nside=16 if FAST else 64, pol="I", T=np.float32, seed=1)
    ds = out["ds"]

    fn = "/tmp/example_chains"
    for f in os.listdir("/tmp"):
        if f.startswith("example_chains"):
            os.remove(os.path.join("/tmp", f))

    chains = sample_joint(
        ds,
        nsamps_per_chain=3 if FAST else 10,
        nchains=2,
        theta_range=dict(Aphi=np.linspace(0.5, 1.5, 15)),
        symp_kwargs=[dict(N=3 if FAST else 10, eps=0.02)],
        conjgrad_kwargs=dict(tol=1e-1, nsteps=20 if FAST else 100),
        filename=fn,
        progress=True,
    )

    loaded = load_chains(fn, burnin=1 if FAST else 2)
    print(f"{len(loaded)} chains x {len(loaded[0])} samples")
    aphis = [s["theta"]["Aphi"] for c in loaded for s in c if "theta" in s]
    print("Aphi samples:", np.round(aphis, 3))
    lps = np.array([np.atleast_1d(s["logpdf"])[0] for c in loaded for s in c])
    print("logpdf mean/std:", lps.mean(), lps.std())

"""Field basics (mirrors docs/src/05_field_basics.md): bases,
conversions, algebra, operators, batching."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

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

import jax.numpy as jnp

cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    from cmblensing_tpu import ProjLambert, Cl_to_Cov, camb, Diag, HighPass
    from cmblensing_tpu.core import field as F
    from cmblensing_tpu.core.basis import MAP, FOURIER, EB_FOURIER, QU_MAP

    proj = ProjLambert(128, 128, thetapix=3)
    key = jax.random.PRNGKey(0)

    # construct, convert, index
    f = F.randn(key, proj, pol="QU")
    print("f:", f)
    print("as EB fourier:", f.to(EB_FOURIER))
    print("E component:", f["E"])

    # algebra with automatic basis promotion
    g = 2.0 * f + f.to(EB_FOURIER)
    print("mixed-basis sum lands in:", g.basis)

    # operators
    Cl = camb()
    Cf = Cl_to_Cov("P", proj, Cl["unlensed_scalar"]["EE"], Cl["unlensed_scalar"]["BB"])
    xi = Cf.sqrt() @ f            # colored field
    hp = HighPass(500).on(proj, pol="EB")
    filtered = hp @ xi
    print("dot(xi, Cf^-1 xi) =", float(F.dot(xi, Cf.solve(xi))))

    # batching: one leading axis, vmap/shard ready
    fb = F.batch([F.randn(jax.random.fold_in(key, i), proj, pol="I") for i in range(4)])
    print("batched:", fb.batch_shape, "norms:", np.round(np.asarray(F.norm(fb)), 1))

    # jit/grad through everything
    energy = jax.jit(lambda f: F.dot(f, Cf.solve(f)))
    print("jitted energy:", float(energy(xi)))

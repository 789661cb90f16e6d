"""Device transfer helpers.

Some TPU attachment paths (e.g. remote-tunneled chips) cannot transfer
complex arrays host<->device. device_put_safe moves any pytree by
splitting complex leaves into (real, imag) float pairs for the wire
and recombining them on the target device with a trivial jitted op.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _is_complex(x):
    return hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.complexfloating)


@jax.jit
def _recombine(re, im):
    return jax.lax.complex(re, im)


def device_put_safe(tree, device):
    """jax.device_put that works even when complex transfers are
    unsupported by the backend. All leaves are staged through host
    numpy first — direct CPU-backend-to-accelerator device transfers
    are another unreliable path on tunneled attachments."""
    import numpy as np
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out = []
    for leaf in leaves:
        if not hasattr(leaf, "dtype"):
            out.append(leaf)
            continue
        if _is_complex(leaf):
            host = np.asarray(leaf)
            re = jax.device_put(np.ascontiguousarray(host.real), device)
            im = jax.device_put(np.ascontiguousarray(host.imag), device)
            out.append(_recombine(re, im))
        else:
            out.append(jax.device_put(np.asarray(leaf), device))
    return jax.tree_util.tree_unflatten(treedef, out)


def device_get_safe(tree):
    """jax.device_get that splits complex leaves on device first."""
    import numpy as np
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out = []
    for leaf in leaves:
        if _is_complex(leaf):
            # split on the device the leaf lives on: commit it there
            # first, since jit would otherwise dispatch (and transfer)
            # to the default backend
            try:
                dev = list(leaf.devices())[0]
                leaf = jax.device_put(leaf, dev)
            except Exception:
                pass
            re, im = _split(leaf)
            out.append(np.asarray(re) + 1j * np.asarray(im))
        else:
            out.append(np.asarray(leaf) if hasattr(leaf, "dtype") else leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


@jax.jit
def _split(z):
    return jnp.real(z), jnp.imag(z)


def cpu(x):
    """Move a pytree of arrays/fields to host CPU (reference `cpu`,
    src/util.jl:235-246)."""
    import jax
    return device_put_safe(x, jax.devices("cpu")[0])


def tpu(x, index=0):
    """Move a pytree of arrays/fields to a TPU chip (reference `gpu`,
    ext/CMBLensingCUDAExt.jl:43), complex-safe on tunneled
    attachments."""
    import jax
    return device_put_safe(x, jax.devices("tpu")[index])

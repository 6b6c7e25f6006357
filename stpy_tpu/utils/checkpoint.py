"""Checkpoint / resume for param pytrees and fitted factors.

SURVEY §5: the reference only pickles hyperopt results
(stpy/estimator.py:206-214) and torch-saves positive bases
(optimal_positive_basis.py:53-60). Here any pytree of jnp/np arrays saves to
one .npz (flat key paths), with orbax available for full training state.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def save_pytree(path, tree):
    flat = _flatten(tree)
    np.savez(path, **flat)


def load_pytree(path, like=None):
    """Load a flat npz back into a nested dict (or into the structure of
    `like` if given)."""
    dat = np.load(path if str(path).endswith(".npz") else str(path) + ".npz")
    nested = {}
    for key in dat.files:
        parts = key.split("/")
        cur = nested
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = jnp.asarray(dat[key])
    if like is not None:
        leaves_like, treedef = jax.tree.flatten(like)
        flat = _flatten(nested)
        # match by insertion order
        vals = [jnp.asarray(v) for v in flat.values()]
        return jax.tree.unflatten(treedef, vals)
    return nested


def save_model(path, model, attrs=("L", "A", "x", "y", "rate", "W")):
    """Persist fitted factors of an estimator (Cholesky, solves, data)."""
    tree = {}
    for a in attrs:
        v = getattr(model, a, None)
        if v is not None and hasattr(v, "shape"):
            tree[a] = v
    if hasattr(model, "kernel_object") and model.kernel_object is not None:
        tree["params_dict"] = model.kernel_object.params_dict
    save_pytree(path, tree)


def load_model(path, model):
    tree = load_pytree(path)
    for k, v in tree.items():
        if k == "params_dict":
            for idx, pd in v.items():
                model.kernel_object.params_dict[idx].update(pd)
        else:
            setattr(model, k, v)
    model.fitted = True
    return model

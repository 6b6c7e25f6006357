"""Shared double-float (hi, lo) Gram planning over `KernelFunction` atoms.

Interprets a KernelFunction's static atom list into a df evaluation plan
and evaluates the (possibly composite) df Gram — used by the dense double
tier (`GaussianProcess(precision="double")`, models/exact_gp.py) and the
matrix-free double tier (`IterativeGP(precision="double")`,
parallel/iterative.py). Covers SE/ARD/Matérn(½, 3/2, 5/2)/laplace atoms
and their `+`/`*` algebra; anything else raises — an honest capability
boundary. Reference parity: the torch reference is float64 end-to-end for
every kernel (stpy/continuous_processes/gauss_procc.py:152,367-399).
"""

from __future__ import annotations

import jax.numpy as jnp


def df_atom_desc(kernel_object):
    """Static per-atom (index, family, nu, gamma_key, group, op) plan for
    the double-float Gram. Raises for atoms outside the df families."""
    ko = kernel_object
    full = list(range(ko.d))
    desc = []
    for i, atom in enumerate(ko._atoms):
        if atom.static.get("groups") is not None:
            raise NotImplementedError(
                "precision='double' does not cover additive-over-groups "
                f"atoms (got {atom.name})"
            )
        group = atom.static.get("group")
        if group is not None and list(group) == full:
            group = None
        nu = float(atom.static.get("nu", 1.5))
        name = atom.name
        if name == "squared_exponential":
            fam, gkey, nu = "se", "gamma", 1.0
        elif name == "ard":
            fam, gkey, nu = "se", "ard_gamma", 1.0
        elif name == "matern" and nu in (0.5, 1.5, 2.5):
            fam, gkey = "matern", "gamma"
        elif name == "ard_matern" and nu in (0.5, 1.5, 2.5):
            fam, gkey = "matern", "ard_gamma"
        elif name == "laplace":
            fam, gkey, nu = "matern", "gamma", 0.5
        else:
            raise NotImplementedError(
                "precision='double' supports SE/ARD/Matérn(½,3/2,5/2)/"
                f"laplace atoms and their +/* algebra (got {name})"
            )
        desc.append((i, fam, nu, gkey,
                     None if group is None else tuple(group),
                     ko.operations[i]))
    return desc


def df_gram_from_desc(kernel_object, params_dict, a, b, desc):
    """(hi, lo) Gram of the (possibly composite) kernel: per-atom df
    Pallas Grams folded with barrier-guarded df add/mul.

    Hyperparameter semantics: `<key>__lo` leaves (KernelFunction.
    params_with_lo) restore the f64 meaning of f32-stored params —
    γ = γ_hi + γ_lo through a df reciprocal. When absent and the call is
    EAGER (IterativeGP's chunked df tier), the value-keyed shadow is
    consulted directly; a traced call without lo leaves falls back to
    f32-rounded semantics (γ = f32(γ))."""
    import jax

    from stpy_tpu.ops.pallas_gram_df import _df_add, _df_mul, gram_df

    outh = outl = None
    for (i, fam, nu, gkey, group, op) in desc:
        p = {**kernel_object.params_dict[str(i)],
             **params_dict.get(str(i), {})}
        gamma = p[gkey]
        kappa = p.get("kappa", 1.0)
        gamma_lo = p.get(gkey + "__lo")
        kappa_lo = p.get("kappa__lo")
        if gamma_lo is None and not isinstance(gamma, jax.core.Tracer):
            lo = kernel_object.lo_limbs(str(i))
            gamma_lo = lo.get(gkey)
            if kappa_lo is None and lo.get("kappa") is not None:
                kappa_lo = lo["kappa"].reshape(jnp.shape(kappa))
        aa = a if group is None else a[:, jnp.asarray(group)]
        bb = b if group is None else b[:, jnp.asarray(group)]
        if gkey == "ard_gamma" and group is not None:
            idx = jnp.asarray(group)
            gamma = jnp.asarray(gamma).reshape(-1)[idx]
            if gamma_lo is not None:
                gamma_lo = jnp.asarray(gamma_lo).reshape(-1)[idx]
        if not isinstance(kappa, jax.core.Tracer):
            # concrete κ keeps the host fast path in gram_df (which does
            # its own f64 split); only a traced κ needs the lo leaf
            kappa = kappa if isinstance(kappa, (int, float)) else (
                jnp.asarray(kappa))
        Kh, Kl = gram_df(aa, bb, gamma, kappa, family=fam, nu=nu,
                         gamma_lo=gamma_lo, kappa_lo=kappa_lo)
        if op == "+":
            outh, outl = _df_add(outh, outl, Kh, Kl)
        elif op == "*":
            outh, outl = _df_mul(outh, outl, Kh, Kl)
        else:
            outh, outl = Kh, Kl
    return outh, outl

"""Shared double-float (hi, lo) Gram planning over `KernelFunction` atoms.

Interprets a KernelFunction's static atom list into a df evaluation plan
and evaluates the (possibly composite) df Gram — used by the dense double
tier (`GaussianProcess(precision="double")`, models/exact_gp.py) and the
matrix-free double tier (`IterativeGP(precision="double")`,
parallel/iterative.py).

Three tiers per atom:
  * SE/ARD/Matérn(½, 3/2, 5/2)/laplace → the fused Pallas df Gram
    (ops/pallas_gram_df.py), MXU speed;
  * general-ν Matérn → the dedicated node-scanned df Bessel Gram
    (ops/matern_df.py): the K_ν quadrature evaluated by scanning nodes
    with compensated (hi, lo) accumulation, 2048-row chunks where the
    interpreter's broadcast trace forces ~40 (r5 ROADMAP item);
  * ANY other jnp-expressible family (gibbs, polynomial, tanh, linear,
    step, wiener, spectral, custom, …) → the generic jaxpr df interpreter
    (ops/df_interp.py), ~5-10x the f32 cost, pure VPU — a correctness
    tier that closes the last capability asymmetry vs the f64 reference
    (the torch reference is float64 end-to-end for EVERY kernel,
    stpy/continuous_processes/gauss_procc.py:152,367-399).
Atoms whose trace contains a primitive the interpreter has no df rule
for still raise, listing the blocking primitives. No shipped kernel
family hits that boundary (general-ν matern's scatter-free quadrature,
kernels/functions.py:bessel_kv, remains df-expressible through the
generic tier too — the dedicated family is the fast path).
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
        group = atom.static.get("group")
        if group is not None and list(group) == full:
            group = None
        nu = float(atom.static.get("nu", 1.5))
        name = atom.name
        fam = None
        if atom.static.get("groups") is None:
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
            elif name == "matern":
                # general ν: the dedicated node-scanned df Bessel tier
                # (ops/matern_df.py) — 2048-row chunks where the generic
                # interpreter's broadcast trace forces ~40 (r5 ROADMAP)
                fam, gkey = "matern_gen", "gamma"
            elif name == "ard_matern":
                fam, gkey = "matern_gen", "ard_gamma"
        if fam is None:
            # generic jaxpr-interpreter tier: supported iff every
            # primitive in the atom's trace has a df rule
            missing = _generic_atom_missing(ko, i, atom)
            if missing:
                raise NotImplementedError(
                    "precision='double' cannot express kernel atom "
                    f"'{name}' in double-float: its trace contains "
                    f"primitives with no df rule: {sorted(missing)} "
                    "(ops/df_interp.py)"
                )
            fam, gkey, nu = "generic", None, 0.0
            group = None  # generic atoms receive full inputs (the atom
            #               fn does its own group slicing, as eval_params)
        desc.append((i, fam, nu, gkey,
                     None if group is None else tuple(group),
                     ko.operations[i]))
    return desc


def _generic_atom_missing(kernel_object, i, atom):
    """Primitives in atom i's trace with no df-interpreter rule."""
    from stpy_tpu.ops.df_interp import missing_primitives

    a = jnp.zeros((2, kernel_object.d), jnp.float32)
    b = jnp.zeros((3, kernel_object.d), jnp.float32)
    p = kernel_object.params_dict[str(i)]
    return missing_primitives(lambda aa, bb: atom(p, aa, bb), a, b)


def df_gram_from_desc(kernel_object, params_dict, a, b, desc,
                      strip_fold=None):
    """(hi, lo) Gram of the (possibly composite) kernel: per-atom df
    Pallas Grams folded with barrier-guarded df add/mul.

    Hyperparameter semantics: `<key>__lo` leaves (KernelFunction.
    params_with_lo) restore the f64 meaning of f32-stored params —
    γ = γ_hi + γ_lo through a df reciprocal. When absent and the call is
    EAGER (IterativeGP's chunked df tier), the value-keyed shadow is
    consulted directly; a traced call without lo leaves falls back to
    f32-rounded semantics (γ = f32(γ)).

    strip_fold (int, default off): for atoms AFTER the first, build the
    atom's Gram in `strip_fold`-row strips and fold each strip into the
    accumulated pair in place (dynamic_update_slice — XLA reuses the
    dead buffer), so the fold's peak is 2n² + strip instead of out-pair
    + atom-pair = 4n². This is what lets a COMPOSITE dense-double fit
    reach n=32k on one 16 GB chip (GaussianProcess(fold_noise=True)
    passes 4096); off by default — at n ≤ 24k the full-atom fold is one
    Pallas call per atom and equally fast."""
    import jax

    from stpy_tpu.ops.pallas_gram_df import _df_add, _df_mul, gram_df

    outh = outl = None
    for (i, fam, nu, gkey, group, op) in desc:
        p = {**kernel_object.params_dict[str(i)],
             **params_dict.get(str(i), {})}
        if fam == "generic":
            def build(ar, _i=i, _p=p):
                return _generic_df_gram(kernel_object, _i, _p, ar, b)
        else:
            gamma = p[gkey]
            kappa = p.get("kappa", 1.0)
            gamma_lo = p.get(gkey + "__lo")
            kappa_lo = p.get("kappa__lo")
            if gamma_lo is None and not isinstance(gamma, jax.core.Tracer):
                lo = kernel_object.lo_limbs(str(i))
                gamma_lo = lo.get(gkey)
                if kappa_lo is None and lo.get("kappa") is not None:
                    kappa_lo = lo["kappa"].reshape(jnp.shape(kappa))
            bb = b if group is None else b[:, jnp.asarray(group)]
            if gkey == "ard_gamma" and group is not None:
                idx = jnp.asarray(group)
                gamma = jnp.asarray(gamma).reshape(-1)[idx]
                if gamma_lo is not None:
                    gamma_lo = jnp.asarray(gamma_lo).reshape(-1)[idx]
            if not isinstance(kappa, jax.core.Tracer):
                # concrete κ keeps the host fast path in gram_df (which
                # does its own f64 split); only a traced κ needs the lo
                # leaf
                kappa = kappa if isinstance(kappa, (int, float)) else (
                    jnp.asarray(kappa))

            def build(ar, _fam=fam, _nu=nu, _g=gamma, _k=kappa,
                      _gl=gamma_lo, _kl=kappa_lo, _bb=bb, _group=group):
                ar = ar if _group is None else ar[:, jnp.asarray(_group)]
                if _fam == "matern_gen":
                    from stpy_tpu.ops.matern_df import gram_matern_gen_df

                    return gram_matern_gen_df(ar, _bb, _g, _k, nu=_nu,
                                              gamma_lo=_gl, kappa_lo=_kl)
                return gram_df(ar, _bb, _g, _k, family=_fam, nu=_nu,
                               gamma_lo=_gl, kappa_lo=_kl)

        fold = _df_add if op == "+" else (_df_mul if op == "*" else None)
        if (fold is None or outh is None or not strip_fold
                or a.shape[0] <= strip_fold):
            Kh, Kl = build(a)
            if fold is None:
                outh, outl = Kh, Kl
            else:
                outh, outl = fold(outh, outl, Kh, Kl)
        else:
            for r0 in range(0, a.shape[0], strip_fold):
                kh, kl = build(a[r0:r0 + strip_fold])
                c = kh.shape[0]
                oh, ol = fold(outh[r0:r0 + c], outl[r0:r0 + c], kh, kl)
                outh = jax.lax.dynamic_update_slice(outh, oh, (r0, 0))
                outl = jax.lax.dynamic_update_slice(outl, ol, (r0, 0))
    return outh, outl


def _generic_df_gram(kernel_object, i, p, a, b):
    """(hi, lo) Gram of one non-fused atom via the jaxpr df interpreter
    (ops/df_interp.py).

    Float hyperparameters enter as ARGUMENTS with explicit lo limbs —
    `<key>__lo` leaves when present (params_with_lo / traced hyperopt
    calls), else the value-keyed shadows for eager calls, the same
    contract as the fused tier. f64 params/data (CPU x64 tests) are
    split, not truncated, inside df_call."""
    import jax

    from stpy_tpu.ops.df_interp import df_call

    atom = kernel_object._atoms[i]
    base = {k: v for k, v in p.items() if not k.endswith("__lo")}
    keys = sorted(base)
    lo_shadow = {}
    if not any(isinstance(v, jax.core.Tracer) for v in base.values()):
        lo_shadow = kernel_object.lo_limbs(str(i))
    los = [None, None]
    for k in keys:
        v = p.get(k + "__lo")
        if v is None:
            sv = lo_shadow.get(k)
            v = None if sv is None else jnp.asarray(sv)
        los.append(v)

    def fn(aa, bb, *vals):
        return atom(dict(zip(keys, vals)), aa, bb)

    vals = [base[k] for k in keys]
    n = a.shape[0]
    # row-chunk large Grams: the interpreter materializes ~a dozen (rows,
    # n_b) pair intermediates per trace; at n = 16k that is multiple GiB
    # of HBM. lax.map over row chunks bounds the live set while tracing
    # the chunk body once. The chunk ADAPTS to the trace's largest
    # per-row intermediate: plain (rows, n_b) pair traces keep 2048-row
    # chunks, but e.g. general-ν matern broadcasts a (rows, n_b, n_quad)
    # Bessel exponent — 2048-row chunks there are a single 25.8 GB fusion
    # output at n_b=8192, n_quad=384 (measured compile OOM, r5 generic
    # done-bar run). Probed on an 8-row abstract trace.
    chunk = _row_chunk_for_trace(fn, a, b, vals)
    if n > chunk and a.ndim == 2:
        pad = (-n) % chunk
        ap = jnp.pad(a, ((0, pad), (0, 0))) if pad else a
        ac = ap.reshape(-1, chunk, a.shape[1])

        def body(arow):
            (pr,) = df_call(fn, [arow, b] + vals, los)
            return pr

        hs, ls = jax.lax.map(body, ac)
        hs = hs.reshape(-1, hs.shape[-1])[:n]
        ls = ls.reshape(-1, ls.shape[-1])[:n]
        return hs, ls
    (pair,) = df_call(fn, [a, b] + vals, los)
    return pair


def _row_chunk_for_trace(fn, a, b, vals, budget_elems=768 * 1024 * 1024,
                         probe_rows=8):
    """Row-chunk size whose rows-proportional trace intermediates fit
    `budget_elems` f32 elements (3 GB) IN AGGREGATE. The df trace is
    barrier-guarded EFT code (optimization_barrier blocks both fusion
    and buffer reuse), so on big-broadcast traces ~all of its
    rows-proportional intermediates are live at once — the first version
    of this probe budgeted only the single largest one and a (512, 512,
    384) Bessel diag chunk still runtime-OOM'd the chip with ~20 384 MB
    temps resident (r5 generic done-bar run, take 2). Probed by
    abstract-tracing the atom on `probe_rows` rows: per_row = the
    largest intermediate's per-row elements, multiplicity = how many
    intermediates are STRICTLY bigger than a plain (rows, n_b) pair row
    (only those dominate; plain traces keep multiplicity 1 and the fast
    2048-row chunks). Falls back to the historical 2048 if the probe
    fails (e.g. an atom that closes over non-traceable state)."""
    import numpy as np
    import jax

    try:
        probe = [jax.ShapeDtypeStruct((probe_rows,) + tuple(a.shape[1:]),
                                      jnp.asarray(a).dtype),
                 jax.ShapeDtypeStruct(tuple(jnp.shape(b)),
                                      jnp.asarray(b).dtype)]
        for v in vals:
            probe.append(jax.ShapeDtypeStruct(tuple(jnp.shape(v)),
                                              jnp.result_type(v)))
        jaxpr = jax.make_jaxpr(fn)(*probe)
        n_b = int(jnp.shape(b)[0]) if jnp.shape(b) else 1
        per_row, mult = 1, 0
        for eqn in jaxpr.jaxpr.eqns:
            for ov in eqn.outvars:
                sh = getattr(ov.aval, "shape", ())
                if sh and sh[0] == probe_rows:
                    elems = int(np.prod(sh)) // probe_rows
                    per_row = max(per_row, elems)
                    if elems > 2 * n_b:      # bigger than a pair row
                        mult += 1
        # the probe traces the PLAIN atom; the df interpreter expands
        # every float primitive into ~8 barrier-guarded EFT ops whose
        # intermediates all stay live (barriers block buffer reuse), so
        # scale the big-intermediate count by that expansion factor
        chunk = int(min(2048, max(
            probe_rows, budget_elems // (per_row * max(1, 8 * mult)))))
        return max(probe_rows, (chunk // 8) * 8)
    except Exception:
        return 2048


def df_diag_from_desc(kernel_object, params_dict, x, desc, chunk=512):
    """df (hi, lo) prior diagonal k**(x) — chunked df Grams of x slices
    with the diagonal extracted, so EVERY atom family (fused Pallas and
    generic-interpreter alike) gets a double-float-exact k**.

    Why it matters: the predictive variance is the catastrophic
    cancellation k** − q. With q carried in df (ops/pallas_qform_df) but
    k** in f32, the variance floors at eps·k**/var — invisible for
    kappa-normalized families (k** = 1 is exact in f32) but fatal for
    large-magnitude kernels: polynomial deg-3 has k** ≈ 729 and measured
    var rel err 1.3e-1 at n=8k from the f32 k** alone (r5 generic
    done-bar run). Cost: t/chunk tiny (chunk, chunk) df Grams — ~0.1% of
    the (t, n) cross-Gram. Parity: gauss_procc.py:391-399 (f64 kss)."""
    hs, ls = [], []
    n = x.shape[0]
    for r0 in range(0, n, chunk):
        xt = x[r0:r0 + chunk]
        Dh, Dl = df_gram_from_desc(kernel_object, params_dict, xt, xt, desc)
        hs.append(jnp.diagonal(Dh))
        ls.append(jnp.diagonal(Dl))
    if len(hs) == 1:
        return hs[0], ls[0]
    return jnp.concatenate(hs), jnp.concatenate(ls)

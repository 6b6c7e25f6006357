"""KernelFunction: named-kernel object with `+`/`*` algebra and a params
pytree — the user-facing kernel API (parity with stpy/kernels.py:10).

Architecture (TPU-first, not a translation):
  * every atom is a pure function `f(params, a, b)` from
    `stpy_tpu.kernels.functions`; numeric params live in `params_dict`
    (a nested dict pytree that jit/grad/vmap traverse), static structure
    (groups, nu, degree, callables) lives outside the pytree;
  * the `+`/`*` algebra is a static combinator list folded at trace time —
    XLA sees one fused expression, the reference's closure interpreter
    (stpy/kernels.py:136-158) disappears after tracing;
  * SE/ARD/Matérn Grams route through the fused Pallas MXU kernel
    (`stpy_tpu.ops.pallas_gram`) on TPU.

Convention: `cross(a, b)` and `gram(x)` return the standard K[i,j]=k(a_i,b_j)
shape (n_a, n_b). The reference's `kernel(a, b)` returns the transpose
(n_b, n_a) (stpy/kernels.py:393 computes b@a.T); we keep that for drop-in
compatibility.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from stpy_tpu.config import as_array, default_dtype
from stpy_tpu.kernels import functions as F
from stpy_tpu.ops import pallas_gram


# families with a fused Pallas fast path
_PALLAS_FAMILIES = {
    "squared_exponential": "se",
    "ard": "se",
    "matern": "matern",
    "ard_matern": "matern",
}


class _Atom:
    """One named kernel with its static options."""

    def __init__(self, name: str, static: dict, fn):
        self.name = name
        self.static = static  # group/groups/nu/degree/callables...
        self.fn = fn          # f(params, a, b) -> (n_a, n_b)

    def __call__(self, params, a, b):
        return self.fn(params, a, b)


class KernelFunction:
    def __init__(
        self,
        kernel_function=None,
        kernel_name: str = "squared_exponential",
        freq=None,
        groups=None,
        d: int = 1,
        gamma=1.0,
        ard_gamma=None,
        nu=1.5,
        kappa=1.0,
        map=None,
        power=2,
        cov=None,
        params=None,
        group=None,
        offset=0.0,
        gamma_fun=None,
    ):
        self.d = d
        self.group = list(range(d)) if group is None else list(group)
        self.groups = groups
        dt = default_dtype()

        if kernel_function is not None:
            name = "custom"
            p = dict(params or {})
            p.setdefault("kappa", jnp.asarray(kappa, dt))
            fn = lambda pr, a, b, kf=kernel_function: kf(pr, a, b)
            static = {"group": self.group}
        else:
            name = kernel_name
            p = {"kappa": jnp.asarray(kappa, dt)}
            static = {"group": self.group}
            if ard_gamma is None:
                ard_gamma_arr = jnp.ones(d, dt)
            else:
                ard_gamma_arr = as_array(ard_gamma).reshape(-1)
                if ard_gamma_arr.shape[0] == 1 and d > 1:
                    ard_gamma_arr = jnp.full((d,), ard_gamma_arr[0], dt)

            if name == "squared_exponential":
                p["gamma"] = jnp.asarray(gamma, dt)
            elif name == "ard" and groups is None:
                p["ard_gamma"] = ard_gamma_arr
            elif name == "ard" and groups is not None:
                p["ard_gamma"] = ard_gamma_arr
                static["groups"] = groups
            elif name == "laplace":
                p["gamma"] = jnp.asarray(gamma, dt)
            elif name in ("matern", "modified_matern"):
                p["gamma"] = jnp.asarray(gamma, dt)
                static["nu"] = nu
            elif name == "ard_matern":
                p["ard_gamma"] = ard_gamma_arr
                static["nu"] = nu
            elif name in ("full_covariance_se", "full_covariance_matern"):
                p["cov"] = (
                    jnp.eye(d, dtype=dt) if cov is None else as_array(cov)
                )
                if name.endswith("matern"):
                    static["nu"] = nu
            elif name == "linear":
                p["offset"] = jnp.asarray(offset, dt)
            elif name == "polynomial":
                static["degree"] = power
                if groups is not None:
                    static["groups"] = groups
            elif name == "squared_exponential_per_group":
                assert groups is not None
                static["groups"] = groups
                p["gamma_per_group"] = jnp.full((len(groups),), gamma, dt)
            elif name == "ard_per_group":
                assert groups is not None
                static["groups"] = groups
                total = sum(len(g) for g in groups)
                p["ard_per_group"] = jnp.ones(total, dt)
            elif name in ("gibbs", "gibbs_custom"):
                static["gamma_fun"] = gamma_fun
            elif name == "spectral":
                assert freq is not None, "spectral kernel needs `freq`"
                p["freq"] = as_array(freq)
            elif name in ("step", "wiener", "tanh", "angsim", "custom_map",
                          "random_map"):
                if name in ("custom_map", "random_map"):
                    # random_map = linear kernel through a (random NN)
                    # feature map (parity: stpy/kernels.py:257)
                    static["map_fn"] = (
                        map.map if hasattr(map, "map") else map
                    )
            else:
                raise AssertionError(f"Kernel '{name}' not implemented.")
            if params:
                p.update({k: as_array(v) for k, v in params.items()})
            fn = self._make_fn(name, static)

        self.optkernel = name
        self._atoms = [_Atom(name, static, fn)]
        self.operations = ["-"]
        self.params_dict = {"0": p}
        self.kernel_items = 1
        # value-keyed f64 lo-limb shadows of numeric hyperparameters: the
        # stored params are f32 on TPU (default_dtype), which silently
        # rounds e.g. γ=1.1 by 2.4e-8 — enough to shift double-float Gram
        # entries by ~2e-8 at the t = 1+√3 band (the r3 "matern anomaly",
        # benchmarks/exp_r4_anomaly.py). The shadow records γ − f32(γ) at
        # construction, keyed by the f32 bytes so it self-invalidates when
        # hyperopt overwrites the stored value (the fitted value then IS
        # the f32 number). Consumed by the df tier via params_with_lo().
        self._params_lo = {}
        host_src = {"gamma": gamma, "kappa": kappa}
        if ard_gamma is not None:
            host_src["ard_gamma"] = ard_gamma
        if params:
            host_src.update(params)
        for key in ("gamma", "ard_gamma", "kappa"):
            if key in p and key in host_src and isinstance(
                host_src[key], (int, float, np.ndarray, np.floating, list)
            ):
                self._record_lo("0", key, host_src[key])

    # -- f64 lo-limb shadows (df tier) ----------------------------------------
    def _record_lo(self, idx, key, host_val):
        """Record γ − f32(γ) for a host-specified numeric param, keyed by
        the stored f32 bytes (self-invalidating on overwrite). Only when
        the stored dtype IS f32 — f64 storage (CPU x64 tests) keeps the
        full meaning already, and a shadow would double-count."""
        sarr = np.asarray(self.params_dict[idx][key])
        if sarr.dtype != np.float32:
            return
        stored = sarr.reshape(-1)
        try:
            arr64 = np.broadcast_to(
                np.asarray(host_val, np.float64).reshape(-1), stored.shape
            ).astype(np.float64)
        except (ValueError, TypeError):
            return
        if not np.array_equal(arr64.astype(np.float32), stored):
            return  # stored value is not the rounding of this host value
        lo = (arr64 - stored.astype(np.float64)).astype(np.float32)
        if np.any(lo):
            self._params_lo[(str(idx), key)] = (stored.tobytes(), lo)

    def lo_limbs(self, idx, params=None):
        """(gamma_lo, ard_gamma_lo, kappa_lo) f32 arrays (or None) for atom
        `idx`, validated against the CURRENT stored values — a stale
        shadow (hyperopt overwrote the param) returns None."""
        p = (params or self.params_dict)[idx]
        out = {}
        shadows = getattr(self, "_params_lo", {})
        for key in ("gamma", "ard_gamma", "kappa"):
            rec = shadows.get((idx, key))
            if rec is None or key not in p:
                out[key] = None
                continue
            cur = np.asarray(p[key], np.float32).reshape(-1)
            out[key] = rec[1] if rec[0] == cur.tobytes() else None
        return out

    def params_with_lo(self, params_dict=None):
        """Copy of params_dict augmented with `<key>__lo` f32 leaves for
        gamma/ard_gamma/kappa (zeros when no valid shadow exists) — the
        df tier's call-time params. Must be built OUTSIDE jit (values are
        compared by bytes); inside jit the lo leaves are ordinary traced
        arrays, so the augmented pytree structure is stable across refits."""
        pd = params_dict or self.params_dict
        out = {}
        for idx, p in pd.items():
            q = dict(p)
            lo = self.lo_limbs(idx, pd)
            for key in ("gamma", "ard_gamma", "kappa"):
                if key in p:
                    shape = jnp.shape(p[key])
                    v = lo[key]
                    if v is None:
                        q[key + "__lo"] = jnp.zeros(shape, jnp.float32)
                    else:
                        q[key + "__lo"] = jnp.asarray(
                            v.reshape(shape), jnp.float32)
            out[idx] = q
        return out

    # -- functional dispatch -------------------------------------------------
    @staticmethod
    def _make_fn(name, static):
        group = static.get("group")
        groups = static.get("groups")
        nu = static.get("nu", 1.5)

        if name == "squared_exponential":
            def fn(p, a, b):
                ga = a if group is None else a[:, jnp.asarray(group)]
                gb = b if group is None else b[:, jnp.asarray(group)]
                return pallas_gram.gram_se(ga, gb, p["gamma"], p.get("kappa", 1.0))
            return fn
        if name == "ard" and groups is None:
            def fn(p, a, b):
                idx = jnp.asarray(group)
                return pallas_gram.gram_se(
                    a[:, idx], b[:, idx], p["ard_gamma"][idx], p.get("kappa", 1.0)
                )
            return fn
        if name == "matern":
            if nu in (0.5, 1.5, 2.5):
                def fn(p, a, b):
                    ga = a if group is None else a[:, jnp.asarray(group)]
                    gb = b if group is None else b[:, jnp.asarray(group)]
                    return pallas_gram.gram_matern(
                        ga, gb, p["gamma"], p.get("kappa", 1.0), nu=nu
                    )
                return fn
            # general ν: on-device Bessel K_ν path (no Pallas fast path)
            return functools.partial(F.matern, group=group, nu=nu)
        if name == "ard_matern":
            if nu in (0.5, 1.5, 2.5):
                def fn(p, a, b):
                    idx = jnp.asarray(group)
                    return pallas_gram.gram_matern(
                        a[:, idx], b[:, idx], p["ard_gamma"][idx],
                        p.get("kappa", 1.0), nu=nu,
                    )
                return fn
            return functools.partial(F.ard_matern, group=group, nu=nu)

        if name == "laplace":
            def fn(p, a, b):
                ga = a if group is None else a[:, jnp.asarray(group)]
                gb = b if group is None else b[:, jnp.asarray(group)]
                return pallas_gram.gram_laplace(
                    ga, gb, p["gamma"], p.get("kappa", 1.0)
                )
            return fn

        table = {
            "modified_matern": functools.partial(
                F.modified_matern, group=group, nu=int(static.get("nu", 2))
            ),
            "full_covariance_se": functools.partial(F.covar_se, group=group),
            "full_covariance_matern": functools.partial(
                F.covar_matern, group=group, nu=nu
            ),
            "linear": functools.partial(F.linear, group=group),
            "step": functools.partial(F.step, group=group),
            "wiener": functools.partial(F.wiener, group=group),
            "tanh": functools.partial(F.tanh_kernel, group=group),
            "angsim": functools.partial(F.angsim, group=group),
            "spectral": functools.partial(F.spectral, group=group),
            "gibbs": functools.partial(
                F.gibbs, group=group, gamma_fun=static.get("gamma_fun")
            ),
            "gibbs_custom": functools.partial(
                F.gibbs_custom, group=group, gamma_fun=static.get("gamma_fun")
            ),
            "custom_map": functools.partial(
                F.custom_map, group=group, map_fn=static.get("map_fn")
            ),
            "random_map": functools.partial(
                F.custom_map, group=group, map_fn=static.get("map_fn")
            ),
        }
        if name == "polynomial" and groups is None:
            return functools.partial(
                F.polynomial, group=group, degree=static.get("degree", 2)
            )
        if name == "polynomial":
            return functools.partial(
                F.polynomial_additive, groups=groups,
                degree=static.get("degree", 2),
            )
        if name == "ard":  # additive over groups
            return functools.partial(F.ard_additive, groups=groups)
        if name == "squared_exponential_per_group":
            return functools.partial(
                F.squared_exponential_per_group_additive, groups=groups
            )
        if name == "ard_per_group":
            return functools.partial(F.ard_per_group_additive, groups=groups)
        if name in table:
            return lambda p, a, b, f=table[name]: f(p, a, b)
        raise AssertionError(f"Kernel '{name}' not implemented.")

    # -- algebra (parity: stpy/kernels.py:76-94) ------------------------------
    def _combine(self, other: "KernelFunction", op: str) -> "KernelFunction":
        self._atoms = self._atoms + other._atoms
        self.operations = self.operations + other.operations[1:]
        for okey, value in other.params_dict.items():
            new_idx = str(self.kernel_items)
            self.params_dict[new_idx] = value
            # carry the other kernel's lo shadows under the new index
            for (oidx, pkey), rec in getattr(other, "_params_lo",
                                             {}).items():
                if oidx == okey:
                    self._params_lo[(new_idx, pkey)] = rec
            self.kernel_items += 1
        self.operations.append(op)
        return self

    def __add__(self, other):
        diff = len(set(other.group) - set(self.group))
        self.d += diff
        return self._combine(other, "+")

    def __mul__(self, other):
        return self._combine(other, "*")

    # -- evaluation ------------------------------------------------------------
    def eval_params(self, params_dict, a, b) -> jnp.ndarray:
        """Pure evaluation with an explicit params pytree: clean convention
        (n_a, n_b). This is the function jit/grad close over."""
        out = None
        for i, atom in enumerate(self._atoms):
            # partial overrides fall back per-parameter to stored values
            p = {**self.params_dict[str(i)], **params_dict.get(str(i), {})}
            K = atom(p, a, b)
            op = self.operations[i]
            if op == "+":
                out = out + K
            elif op == "*":
                out = out * K
            else:
                out = K
        return out

    def cross(self, a, b, params_dict=None) -> jnp.ndarray:
        """K[i, j] = k(a_i, b_j), shape (n_a, n_b)."""
        a, b = as_array(a), as_array(b)
        return self.eval_params(params_dict or self.params_dict, a, b)

    def gram(self, x, params_dict=None) -> jnp.ndarray:
        x = as_array(x)
        K = self.eval_params(params_dict or self.params_dict, x, x)
        return 0.5 * (K + K.T)  # enforce exact symmetry for Cholesky

    def diag(self, x, params_dict=None) -> jnp.ndarray:
        """k(x_i, x_i) vectorized — replaces the per-point Python loop at
        stpy/continuous_processes/gauss_procc.py:347."""
        x = as_array(x)
        pd = params_dict or self.params_dict
        out = None
        for i, atom in enumerate(self._atoms):
            p = pd.get(str(i), self.params_dict[str(i)])
            v = self._atom_diag(atom, p, x)
            op = self.operations[i]
            out = v if op == "-" else (out + v if op == "+" else out * v)
        return out

    def _atom_diag(self, atom, p, x):
        n = x.shape[0]
        name = atom.name
        kappa = p.get("kappa", 1.0)
        if name in (
            "squared_exponential", "ard", "matern", "ard_matern", "laplace",
            "modified_matern", "full_covariance_se", "full_covariance_matern",
            "gibbs", "gibbs_custom",
        ):
            if atom.static.get("groups") is not None and name == "ard":
                return jnp.full((n,), kappa, x.dtype)  # mean of ones
            return jnp.full((n,), kappa, x.dtype)
        if name == "linear":
            g = atom.static.get("group")
            xs = x if g is None else x[:, jnp.asarray(g)]
            return kappa * jnp.sum(xs * xs, axis=1) + p.get("offset", 0.0)
        # generic fall-back: vmapped singleton evaluations k(x_i, x_i) —
        # O(n) work and memory (a full (n, n) Gram for its diagonal alone
        # is 1 GiB at n = 16k inside the predict jit)
        return jax.vmap(
            lambda r: atom(p, r[None, :], r[None, :])[0, 0])(x)

    # -- reference-compatible surface -------------------------------------------
    def kernel(self, a, b, **kwargs):
        """Reference convention (stpy/kernels.py:136): returns (n_b, n_a)."""
        pd = kwargs if kwargs else None
        return self.cross(a, b, params_dict=pd).T

    def kernel_diag(self, a, b, **kwargs):
        pd = kwargs if kwargs else None
        return self.diag(a, params_dict=pd).reshape(-1, 1)

    def get_kernel(self):
        return self.kernel

    def get_param_refs(self):
        return self.params_dict

    def set_params(self, params_dict):
        """Write optimized numeric params back (hyperopt write-back,
        parity: stpy/estimator.py:236-245)."""
        for k, v in params_dict.items():
            self.params_dict[k].update(v)

    def description(self) -> str:
        lines = ["Kernel description:"]
        for i, atom in enumerate(self._atoms):
            lines.append(f"  kernel: {atom.name}  op: {self.operations[i]}")
            for k, v in self.params_dict[str(i)].items():
                lines.append(f"    {k}={v}")
        return "\n".join(lines)

    # analytic kernel derivatives (parity: stpy/kernels.py:1065-1111; SE has
    # the closed form, everything else differentiates through the atom)
    def derivative_1(self, fixed, x):
        """d/dx k(fixed_i, x_j): (n_fixed, n_x, d)."""
        fixed, x = as_array(fixed), as_array(x)
        if self.kernel_items == 1 and self.optkernel == "squared_exponential":
            return F.squared_exponential_derivative_1(
                self.params_dict["0"], fixed, x
            )
        import jax

        f = lambda pt: self.eval_params(self.params_dict, fixed, pt[None, :])[
            :, 0
        ]
        return jnp.swapaxes(jax.vmap(jax.jacobian(f))(x), 0, 1)

    def derivative_2(self, fixed, x):
        """d²/dx² k(fixed_i, x_j): (n_fixed, n_x, d, d)."""
        fixed, x = as_array(fixed), as_array(x)
        if self.kernel_items == 1 and self.optkernel == "squared_exponential":
            return F.squared_exponential_derivative_2(
                self.params_dict["0"], fixed, x
            )
        import jax

        f = lambda pt: self.eval_params(self.params_dict, fixed, pt[None, :])[
            :, 0
        ]
        return jnp.swapaxes(jax.vmap(jax.hessian(f))(x), 0, 1)

    get_1_der = derivative_1  # reference aliases (gauss_procc.py:452-453)
    get_2_der = derivative_2

    # finite embedding (only linear kernel supports one; parity :263-273)
    def embed(self, x):
        if self.optkernel == "linear" and self.kernel_items == 1:
            return as_array(x)
        raise AttributeError(
            "This type of kernel does not support a finite dimensional embedding"
        )

    def get_basis_size(self):
        if self.optkernel == "linear" and self.kernel_items == 1:
            return self.d
        raise AttributeError(
            "This type of kernel does not support a finite dimensional embedding"
        )

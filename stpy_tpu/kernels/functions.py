"""Pure-function kernel catalogue: k(params, X, Y) -> (n_x, n_y).

TPU-native rewrite of the kernel catalogue inside stpy/kernels.py (reference
lines cited per function). Everything is a pure jnp function over a params
dict (a pytree), so kernels compose with jit/grad/vmap and hyperparameters
optimize by autodiff. Convention here is the mathematically standard
K[i, j] = k(X[i], Y[j]) with shape (n_x, n_y); the `KernelFunction` compat
wrapper transposes to match the reference's (n_y, n_x) convention.

The reference's O(n·m) Python loops (step/wiener/spectral kernels,
stpy/kernels.py:275,1026,1043) are broadcasting one-liners here.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


# ---------------------------------------------------------------------------
# distance primitives
# ---------------------------------------------------------------------------

def sq_dist(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared euclidean distances, (n, m). MXU-friendly: one matmul
    plus rank-1 norm corrections (same trick as stpy/kernels.py:383-393)."""
    nx = jnp.sum(x * x, axis=1)[:, None]
    ny = jnp.sum(y * y, axis=1)[None, :]
    d2 = nx + ny - 2.0 * (x @ y.T)
    return jnp.maximum(d2, 0.0)


def euclid_dist(x, y, eps=1e-36):
    # sqrt has an infinite derivative at 0; clamp for grad stability at x==y
    return jnp.sqrt(sq_dist(x, y) + eps)


def manhattan_dist(x, y):
    return jnp.sum(jnp.abs(x[:, None, :] - y[None, :, :]), axis=-1)


def _sel(x, group):
    if group is None:
        return x
    return x[:, jnp.asarray(group)]


# ---------------------------------------------------------------------------
# stationary kernels
# ---------------------------------------------------------------------------

def squared_exponential(params, x, y, group=None):
    """kappa * exp(-||x-y||^2 / (2 gamma^2)). Ref: stpy/kernels.py:368."""
    x, y = _sel(x, group), _sel(y, group)
    g = params["gamma"]
    return params.get("kappa", 1.0) * jnp.exp(
        (-0.5 / (g * g)) * sq_dist(x, y)
    )


def ard(params, x, y, group=None):
    """SE with per-dimension lengthscales `ard_gamma`. Ref: stpy/kernels.py:552."""
    x, y = _sel(x, group), _sel(y, group)
    g = params["ard_gamma"]
    if group is not None:
        g = g[jnp.asarray(group)]
    return params.get("kappa", 1.0) * jnp.exp(-0.5 * sq_dist(x / g, y / g))


def laplace(params, x, y, group=None):
    """kappa * exp(-manhattan(x,y)/gamma^2). Ref: stpy/kernels.py:347."""
    x, y = _sel(x, group), _sel(y, group)
    g = params["gamma"]
    return params.get("kappa", 1.0) * jnp.exp(-manhattan_dist(x, y) / (g * g))


def bessel_kv(nu, x, T=24.0, n_quad=384):
    """Modified Bessel K_ν(x) for x > 0 via the integral representation
        K_ν(x) = ∫₀^∞ exp(-x cosh t) cosh(ν t) dt
    on a fixed trapezoid grid (superconvergent for this integrand: measured
    < 1e-13 relative error for ν ∈ [0.3, 3.3] and x ∈ [1e-6, 30] in f64).
    Stable in log-space: exp(-x cosh t + logcosh(ν t)); keep ν·T below the
    dtype's exp overflow (ν ≲ 3.5 in f32 with T=24; unbounded in f64).
    Replaces scipy.special.kv (used at stpy/kernels.py:852-858) on device."""
    x = jnp.asarray(x)
    t = jnp.linspace(0.0, T, n_quad).astype(x.dtype)
    # endpoint halving via where (not .at[].mul): keeps the trace free of
    # scatter primitives so the df interpreter (ops/df_interp.py) can run
    # general-nu matern under precision="double"
    i = jnp.arange(n_quad)
    w = jnp.where((i == 0) | (i == n_quad - 1), 0.5, 1.0).astype(x.dtype) * (
        T / (n_quad - 1)
    )
    z = nu * t
    logcosh = jnp.abs(z) + jnp.log1p(jnp.exp(-2.0 * jnp.abs(z))) - math.log(2.0)
    # (..., n_quad) broadcast: exponent = -x cosh t + logcosh(nu t)
    expo = -x[..., None] * jnp.cosh(t) + logcosh
    return jnp.sum(jnp.exp(expo) * w, axis=-1)


def _matern_shape_general(dists, nu):
    """General-ν Matérn correlation via on-device K_ν:
    k(r) = 2^{1-ν}/Γ(ν) (√(2ν) r)^ν K_ν(√(2ν) r)."""
    arg = jnp.maximum(math.sqrt(2.0 * nu) * dists, 1e-6)
    const = 2.0 ** (1.0 - nu) / math.gamma(nu)
    val = const * arg**nu * bessel_kv(nu, arg)
    # exact limit 1 at r -> 0 (keeps the Gram diagonal PSD-exact)
    val = jnp.where(math.sqrt(2.0 * nu) * dists < 1e-6, 1.0, val)
    return jnp.clip(val, 0.0, 1.0)


def _matern_shape(dists, nu):
    """Matérn correlation given scaled distances; half-integer fast paths
    (ref: stpy/kernels.py:832-858), general ν via quadrature K_ν."""
    if nu == 0.5:
        return jnp.exp(-dists)
    if nu == 1.5:
        k = dists * math.sqrt(3.0)
        return (1.0 + k) * jnp.exp(-k)
    if nu == 2.5:
        k = dists * math.sqrt(5.0)
        return (1.0 + k + k * k / 3.0) * jnp.exp(-k)
    return _matern_shape_general(dists, nu)


def matern(params, x, y, group=None, *, nu=1.5):
    """Isotropic Matérn; lengthscale `gamma`. Ref: stpy/kernels.py:811."""
    x, y = _sel(x, group), _sel(y, group)
    g = params["gamma"]
    return params.get("kappa", 1.0) * _matern_shape(euclid_dist(x / g, y / g), nu)


def ard_matern(params, x, y, group=None, *, nu=1.5):
    """Matérn with per-dim lengthscales. Ref: stpy/kernels.py:917."""
    x, y = _sel(x, group), _sel(y, group)
    g = params["ard_gamma"]
    if group is not None:
        g = g[jnp.asarray(group)]
    return params.get("kappa", 1.0) * _matern_shape(euclid_dist(x / g, y / g), nu)


def modified_matern(params, x, y, group=None, *, nu=2):
    """Product over dims of 1-D Matérn-like shapes (integer nu 1..4).
    Ref: stpy/kernels.py:972."""
    x, y = _sel(x, group), _sel(y, group)
    g = params["gamma"]
    d = jnp.abs(x[:, None, :] - y[None, :, :]) / g  # (n, m, dim)
    if nu == 1:
        K = jnp.exp(-d)
    elif nu == 2:
        K = (1.0 + d) * jnp.exp(-d)
    elif nu == 3:
        K = (d**2 + 3.0 * d + 3.0) * jnp.exp(-d) / 3.0
    elif nu == 4:
        K = (d**3 + 6.0 * d**2 + 15.0 * d + 15.0) * jnp.exp(-d) / 15.0
    else:
        raise NotImplementedError(f"modified_matern nu={nu}")
    return params.get("kappa", 1.0) * jnp.prod(K, axis=-1)


def covar_se(params, x, y, group=None):
    """Full-covariance SE: inputs mapped through sqrt-covariance `cov`.
    Ref: stpy/kernels.py:464."""
    x, y = _sel(x, group), _sel(y, group)
    C = params["cov"]
    return params.get("kappa", 1.0) * jnp.exp(-0.5 * sq_dist(x @ C, y @ C))


def covar_matern(params, x, y, group=None, *, nu=1.5):
    """Full-covariance Matérn. Ref: stpy/kernels.py:501."""
    x, y = _sel(x, group), _sel(y, group)
    C = params["cov"]
    return params.get("kappa", 1.0) * _matern_shape(euclid_dist(x @ C, y @ C), nu)


def gibbs(params, x, y, group=None, *, gamma_fun=None):
    """Input-dependent lengthscale: l(x)^2 + l(y)^2 denominator.
    Ref: stpy/kernels.py:431."""
    x, y = _sel(x, group), _sel(y, group)
    lx = gamma_fun(x).reshape(-1, 1)
    ly = gamma_fun(y).reshape(-1, 1)
    ls = lx**2 + ly.T**2
    return params.get("kappa", 1.0) * jnp.exp(-0.5 * sq_dist(x, y) / ls)


def gibbs_custom(params, x, y, group=None, *, gamma_fun=None):
    """Lengthscale matrix given directly by gamma_fun(x, y).
    Ref: stpy/kernels.py:400."""
    x, y = _sel(x, group), _sel(y, group)
    ls = gamma_fun(x, y)
    return params.get("kappa", 1.0) * jnp.exp(-0.5 * sq_dist(x, y) / ls)


# ---------------------------------------------------------------------------
# dot-product / non-stationary kernels
# ---------------------------------------------------------------------------

def linear(params, x, y, group=None):
    """kappa * x.y + offset. Ref: stpy/kernels.py:300."""
    x, y = _sel(x, group), _sel(y, group)
    return params.get("kappa", 1.0) * (x @ y.T) + params.get("offset", 0.0)


def polynomial(params, x, y, group=None, *, degree=2):
    """kappa * (x.y + 1)^degree. Ref: stpy/kernels.py:766."""
    x, y = _sel(x, group), _sel(y, group)
    return params.get("kappa", 1.0) * (x @ y.T + 1.0) ** degree


def tanh_kernel(params, x, y, group=None, *, q=3, eps=1e-9):
    """tanh(d)^q / d^q over manhattan distance. Ref: stpy/kernels.py:731."""
    x, y = _sel(x, group), _sel(y, group)
    K = manhattan_dist(x, y)
    return params.get("kappa", 1.0) * (jnp.tanh(K) ** q) / (eps + K**q)


def step(params, x, y, group=None):
    """sum_k (x_k + y_k - |x_k - y_k|) = 2 sum_k min(x_k, y_k).
    Ref: stpy/kernels.py:275 (O(nm) loop there; broadcast here)."""
    x, y = _sel(x, group), _sel(y, group)
    s = x[:, None, :] + y[None, :, :] - jnp.abs(x[:, None, :] - y[None, :, :])
    return params.get("kappa", 1.0) * jnp.sum(s, axis=-1)


def wiener(params, x, y, group=None):
    """k(x,y) = sum_k min(x_k, y_k). Ref: stpy/kernels.py:1043."""
    x, y = _sel(x, group), _sel(y, group)
    return params.get("kappa", 1.0) * jnp.sum(
        jnp.minimum(x[:, None, :], y[None, :, :]), axis=-1
    )


def angsim(params, x, y, group=None):
    """Angular similarity (2/pi) asin(cos-sim). Ref: stpy/kernels.py:758."""
    x, y = _sel(x, group), _sel(y, group)
    nx = jnp.linalg.norm(x, axis=1)[:, None]
    ny = jnp.linalg.norm(y, axis=1)[None, :]
    c = jnp.clip((x @ y.T) / (nx * ny), -1.0, 1.0)
    return params.get("kappa", 1.0) * (2.0 / jnp.pi) * jnp.arcsin(c)


def spectral(params, x, y, group=None):
    """Spectral mixture over fixed frequencies `freq` (F, d).
    Ref: stpy/kernels.py:1026 (O(nm) loop there)."""
    x, y = _sel(x, group), _sel(y, group)
    freq = params["freq"]
    # phase (n, m, F) = (x_i - y_j) . f
    px = x @ freq.T  # (n, F)
    py = y @ freq.T  # (m, F)
    phase = px[:, None, :] - py[None, :, :]
    return jnp.mean(jnp.cos(phase), axis=-1)


def custom_map(params, x, y, group=None, *, map_fn=None):
    """Linear kernel in a feature map. Ref: stpy/kernels.py:322."""
    x, y = _sel(x, group), _sel(y, group)
    if map_fn is not None:
        x, y = map_fn(x), map_fn(y)
    return params.get("kappa", 1.0) * (x @ y.T)


# ---------------------------------------------------------------------------
# additive (per-group) kernels — ref: stpy/kernels.py:620-729
# ---------------------------------------------------------------------------

def squared_exponential_per_group_additive(params, x, y, groups=None):
    """Mean over groups of SE with per-group scalar lengthscale
    `gamma_per_group` (vector, one entry per group). Ref: stpy/kernels.py:665."""
    gs = params["gamma_per_group"]
    acc = 0.0
    for i, group in enumerate(groups):
        acc = acc + squared_exponential({"gamma": gs[i]}, x, y, group=group)
    return params.get("kappa", 1.0) * acc / float(len(groups))


def ard_per_group_additive(params, x, y, groups=None):
    """Mean over groups of ARD with per-group lengthscale segments packed in
    `ard_per_group` (concatenated by group). Ref: stpy/kernels.py:620."""
    g_all = params["ard_per_group"]
    acc = 0.0
    idx = 0
    for group in groups:
        seg = g_all[idx : idx + len(group)]
        idx += len(group)
        xs, ys = x[:, jnp.asarray(group)], y[:, jnp.asarray(group)]
        acc = acc + jnp.exp(-0.5 * sq_dist(xs / seg, ys / seg))
    return params.get("kappa", 1.0) * acc / float(len(groups))


def ard_additive(params, x, y, groups=None):
    """Mean over groups of ARD sharing one `ard_gamma`. Ref: stpy/kernels.py:700."""
    acc = 0.0
    for group in groups:
        acc = acc + ard(params, x, y, group=group)
    return acc / float(len(groups))


def polynomial_additive(params, x, y, groups=None, *, degree=2):
    """Mean over groups of polynomial kernels. Ref: stpy/kernels.py:786."""
    acc = 0.0
    for group in groups:
        acc = acc + polynomial(params, x, y, group=group, degree=degree)
    return acc / float(len(groups))


# ---------------------------------------------------------------------------
# analytic derivatives of the SE kernel — ref: stpy/kernels.py:1065-1111
# ---------------------------------------------------------------------------

def squared_exponential_derivative_1(params, fixed, x):
    """d/dx k(fixed_i, x_j): shape (n_fixed, n_x, d)."""
    g2 = params["gamma"] ** 2
    K = squared_exponential(params, fixed, x)
    diff = (fixed[:, None, :] - x[None, :, :]) / g2
    return K[:, :, None] * diff


def squared_exponential_derivative_2(params, fixed, x):
    """Second derivative tensor, shape (n_fixed, n_x, d, d)."""
    g2 = params["gamma"] ** 2
    K = squared_exponential(params, fixed, x)
    diff = (fixed[:, None, :] - x[None, :, :]) / g2
    outer = diff[..., :, None] * diff[..., None, :]
    eye = jnp.eye(x.shape[1]) / g2
    return K[:, :, None, None] * (outer - eye)

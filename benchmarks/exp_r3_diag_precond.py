"""Round-3 TPU diagnostic — WHY does preconditioned CG stall at n=65k?

The sum-kernel (se γ=0.6 + matern32 γ=1.0, s=0.2) n=65,536 lazy PCG
converges on CPU/LAPACK (rank 512 → 13 iters) but stalled at ~2e-1 on the
chip for BOTH constructions tried (pivoted-Cholesky batch C4a, Nyström
batch C4b), while unpreconditioned CG merely stalls at 4.7e-2. This
script isolates the failing stage ON DEVICE:

  1. matvec health: symmetry v᷀Kw vs w᷀Kv, plus 256 rows of K·v checked
     against a host-f64 dense computation;
  2. pivoted-Cholesky factor health: residual diagonal (approximation
     quality), M⁻¹ PSD-ness (Rayleigh quotients), apply symmetry;
  3. Nyström health: TPU-f32 eigh spectra of Wm and BᵀB vs host-f64
     numpy eigh of the SAME matrices; M⁻¹ PSD/symmetry;
  4. 60-iteration PCG traces (plain / pivchol / nystrom), residual
     printed every 5 iterations — divergence vs slow-convergence
     signatures.

Run on the TPU host: timeout 5400 python benchmarks/exp_r3_diag_precond.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

N, D, S = 65536, 3, 0.2


def build():
    from stpy_tpu.kernels import KernelFunction

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(-1, 1, (N, D)), jnp.float32)
    y = jnp.sin(3 * x[:, :1]) + 0.1 * jnp.asarray(
        rng.standard_normal((N, 1)), jnp.float32)
    k = (KernelFunction(kernel_name="squared_exponential", gamma=0.6, d=D)
         + KernelFunction(kernel_name="matern", gamma=1.0, nu=1.5, d=D))
    return x, y, k


def host_rows(xh, rows, v64):
    """f64 K[rows]·v for the sum kernel on host."""
    a = xh[rows]

    def sq(a, b, g):
        a = a / g
        b = b / g
        return np.maximum(
            (a * a).sum(1)[:, None] + (b * b).sum(1)[None, :]
            - 2.0 * (a @ b.T), 0.0)

    Kse = np.exp(-sq(a, xh, 0.6) / 2.0)
    t = np.sqrt(3.0 * sq(a, xh, 1.0))
    Km = (1.0 + t) * np.exp(-t)
    return (Kse + Km) @ v64


def main():
    from stpy_tpu.parallel.iterative import (
        make_pivchol_precond, nystrom_precond_from_cross,
        pivoted_cholesky_kernel,
    )

    x, y, k = build()
    xh = np.asarray(x, np.float64)
    rng = np.random.default_rng(5)

    # --- lazy matvec, exactly as IterativeGP(lazy=True) builds it
    from stpy_tpu.parallel.lazy_kernel import (
        atom_params, fast_atoms, make_sum_matvec,
    )
    atoms = fast_atoms(k)
    gk = [atom_params(k, a) for a in atoms]
    mv = make_sum_matvec(x, atoms, [g for g, _ in gk], [kk for _, kk in gk],
                         noise=S)

    v = jnp.asarray(rng.standard_normal(N), jnp.float32)
    w = jnp.asarray(rng.standard_normal(N), jnp.float32)
    Kv, Kw = mv(v), mv(w)
    sym = abs(float(jnp.vdot(w, Kv)) - float(jnp.vdot(v, Kw)))
    scale = float(jnp.linalg.norm(Kv)) * float(jnp.linalg.norm(w)) / N
    print(f"[1] matvec symmetry |wKv - vKw| = {sym:.3e} (scale {scale:.3e})",
          flush=True)
    rows = np.sort(rng.choice(N, 256, replace=False))
    want = host_rows(xh, rows, np.asarray(v, np.float64)) + \
        S * S * np.asarray(v, np.float64)[rows]
    got = np.asarray(Kv, np.float64)[rows]
    print(f"[1] matvec 256-row err vs f64: max abs "
          f"{np.max(np.abs(got - want)):.3e}  rel "
          f"{np.max(np.abs(got - want)) / np.max(np.abs(want)):.3e}",
          flush=True)

    def psd_sym_check(name, M_inv):
        Z = jnp.asarray(rng.standard_normal((N, 8)), jnp.float32)
        MZ = M_inv(Z)
        ray = np.asarray(jnp.sum(Z * MZ, axis=0), np.float64)
        a1 = float(jnp.vdot(Z[:, 0], MZ[:, 1]))
        a2 = float(jnp.vdot(Z[:, 1], MZ[:, 0]))
        print(f"[{name}] Rayleigh min {ray.min():.3e} (PSD iff > 0); "
              f"symmetry {abs(a1 - a2):.3e} vs {abs(a1):.3e}", flush=True)

    def pcg_trace(name, M_inv, iters=60):
        r = jnp.asarray(y).ravel()
        xk = jnp.zeros_like(r)
        z = M_inv(r) if M_inv is not None else r
        p = z
        rz = jnp.vdot(r, z)
        b = float(jnp.linalg.norm(r))
        out = []
        for i in range(iters):
            Ap = mv(p)
            al = rz / jnp.vdot(p, Ap)
            xk = xk + al * p
            r = r - al * Ap
            if i % 5 == 4:
                out.append(float(jnp.linalg.norm(r)) / b)
            z = M_inv(r) if M_inv is not None else r
            rz_n = jnp.vdot(r, z)
            p = z + (rz_n / rz) * p
            rz = rz_n
        print(f"[{name}] residual trace (every 5): "
              + " ".join(f"{t:.2e}" for t in out), flush=True)

    # --- 2: pivoted Cholesky
    Lm = pivoted_cholesky_kernel(k, x, 512)
    Lm_np = np.asarray(Lm, np.float64)
    diagK = 2.0  # se + matern diag = 1 + 1
    resid = diagK - (Lm_np ** 2).sum(0)
    print(f"[2] pivchol residual diag: min {resid.min():.3e} "
          f"max {resid.max():.3e} mean {resid.mean():.3e}", flush=True)
    M1 = make_pivchol_precond(Lm, S)
    psd_sym_check("2 pivchol", M1)

    # --- 3: Nystrom (as fit_evidence_lazy builds it)
    idx = jax.random.choice(jax.random.fold_in(jax.random.PRNGKey(0), 7),
                            N, (512,), replace=False)
    C = k.eval_params(k.params_dict, x, x[idx])
    Wm = np.asarray(C, np.float64)[np.asarray(idx)]
    lw_dev = np.asarray(jnp.linalg.eigh(jnp.asarray(C)[jnp.asarray(idx)])[0],
                        np.float64)
    lw_host = np.linalg.eigvalsh(Wm)
    print(f"[3] Wm eigh  device: [{lw_dev[0]:.3e} .. {lw_dev[-1]:.3e}], "
          f"host f64: [{lw_host[0]:.3e} .. {lw_host[-1]:.3e}], "
          f"top-5 rel dev "
          f"{np.max(np.abs(lw_dev[-5:] - lw_host[-5:]) / lw_host[-5:]):.2e}",
          flush=True)
    M2 = nystrom_precond_from_cross(C, idx, S)
    psd_sym_check("3 nystrom", M2)

    # --- 4: traces
    pcg_trace("4 plain  ", None)
    pcg_trace("4 pivchol", M1)
    pcg_trace("4 nystrom", M2)


if __name__ == "__main__":
    main()

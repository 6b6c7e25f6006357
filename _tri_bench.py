import numpy as np, jax, jax.numpy as jnp, time
from stpy_tpu.kernels import KernelFunction
from stpy_tpu.linalg import safe_cholesky, tri_solve_chunked, tri_solve_blocked

N = 16384; D = 8
rng = np.random.default_rng(0)
x = jnp.asarray(rng.uniform(-1,1,(N,D)), jnp.float32)
kernel = KernelFunction(kernel_name="squared_exponential", gamma=0.5, d=D)
pd = kernel.params_dict

def timed(name, f, *a, reps=3):
    float(f(*a)); ts=[]
    for _ in range(reps):
        t0=time.perf_counter(); float(f(*a)); ts.append(time.perf_counter()-t0)
    print(f"{name}: {sorted(ts)[1]*1e3:.1f} ms", flush=True)

def make(fsolve):
    @jax.jit
    def g(x):
        K = kernel.eval_params(pd,x,x)
        K = K + 0.01*jnp.eye(N, dtype=K.dtype)
        L = safe_cholesky(K).L
        V = fsolve(L, K)
        return jnp.sum(V*V)
    return g

timed("chunked(1024)", make(lambda L,B: tri_solve_chunked(L,B,chunk=1024)), x)
timed("blocked(2048)", make(lambda L,B: tri_solve_blocked(L,B,nb=2048)), x)
timed("blocked(1024)", make(lambda L,B: tri_solve_blocked(L,B,nb=1024)), x)
timed("blocked(4096)", make(lambda L,B: tri_solve_blocked(L,B,nb=4096)), x)
# accuracy check on-device
@jax.jit
def acc(x):
    K = kernel.eval_params(pd,x,x)
    K = K + 0.01*jnp.eye(N, dtype=K.dtype)
    L = safe_cholesky(K).L
    V1 = tri_solve_blocked(L, K[:, :128], nb=2048)
    V2 = jax.scipy.linalg.solve_triangular(L, K[:, :128], lower=True)
    return jnp.max(jnp.abs(V1-V2))
print("blocked vs xla max err:", float(acc(x)), flush=True)

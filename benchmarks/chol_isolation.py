"""Isolate blocked-Cholesky N=16k costs: mm ceiling, no-chol, no-solve."""
import sys, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular
from george_tpu.profiling import timeit

variant = sys.argv[1]
n, B, REP = 16384, 1024, 5
rng = np.random.default_rng(0)
x = jnp.asarray(np.sort(rng.uniform(0, 10, n)).astype(np.float32))


def build(bump):
    d = x[:, None] - x[None, :]
    return jnp.exp(-0.5 * d * d) + (0.01 + bump) * jnp.eye(
        n, dtype=jnp.float32)


def mm(a, b):
    return jnp.matmul(a, b, precision="high")


def ld_blocked(K, diag_chol, panel_solve):
    L = jnp.zeros_like(K)
    ld = jnp.float32(0)
    for j0 in range(0, n, B):
        j1 = min(j0 + B, n)
        D = K[j0:j1, j0:j1]
        A21 = K[j1:, j0:j1]
        if j0:
            Lrow = L[j0:j1, :j0]
            D = D - mm(Lrow, Lrow.T)
            if j1 < n:
                A21 = A21 - mm(L[j1:, :j0], Lrow.T)
        Ld = diag_chol(D)
        ld = ld + 2.0 * jnp.sum(jnp.log(jnp.abs(jnp.diagonal(Ld)) + 1e-30))
        col = [jnp.zeros((j0, j1 - j0), K.dtype), Ld]
        if j1 < n:
            col.append(panel_solve(Ld, A21))
        L = L.at[:, j0:j1].set(jnp.concatenate(col, axis=0))
    return ld


solve = lambda Ld, A21: solve_triangular(Ld, A21.T, lower=True).T
fake_solve = lambda Ld, A21: mm(A21, Ld)         # same flops, no solve
fake_chol = lambda D: jnp.tril(D) + jnp.eye(B)   # no factorization


def rep(fn, arg, nrep=REP):
    @jax.jit
    def f(a):
        def body(c, i):
            return c + fn(a, 1e-6 * i), None
        return jax.lax.scan(body, jnp.float32(0),
                            jnp.arange(nrep, dtype=jnp.float32))[0]
    f(arg).block_until_ready()
    return timeit(f, arg, repeats=3) / nrep


if variant == "mm":
    m = 8192
    A = jnp.asarray(rng.standard_normal((m, m)).astype(np.float32))
    t = rep(lambda a, b: jnp.sum(mm(a + b, a)), A, 3)
    print(f"mm {m}^3 HIGH: {t*1e3:.1f} ms -> {2*m**3/t/1e12:.1f} "
          f"TFLOP/s (flops=2m^3)")
elif variant == "buildonly":
    t = rep(lambda _, b: jnp.sum(build(b)), jnp.float32(0))
    print(f"build only: {t*1e3:.1f} ms")
elif variant == "nochol":
    t = rep(lambda _, b: ld_blocked(build(b), fake_chol, solve),
            jnp.float32(0))
    print(f"nochol: {t*1e3:.1f} ms")
elif variant == "nosolve":
    t = rep(lambda _, b: ld_blocked(build(b), jnp.linalg.cholesky,
                                    fake_solve), jnp.float32(0))
    print(f"nosolve: {t*1e3:.1f} ms")
elif variant == "neither":
    t = rep(lambda _, b: ld_blocked(build(b), fake_chol, fake_solve),
            jnp.float32(0))
    print(f"neither: {t*1e3:.1f} ms")

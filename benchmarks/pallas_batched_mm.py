# -*- coding: utf-8 -*-
"""Can a Pallas chain-major kernel beat XLA's batched-small-matmul emitter?

Round-4 measured limit (BENCH_NOTES.md "MXU dense engine"): XLA emits the
(B, 128, 128) @ (B, 128, 128)^T downdate matmuls of the MXU dense engine
at ~3.1 TFLOP/s — ~9% of the chip's 33 TFLOP/s f32-accurate (3-pass bf16)
matmul ceiling — and this binds the whole engine.  This benchmark measures
Pallas formulations of the SAME unit of work:

  * ``xla``      — the einsum the engine uses today (baseline);
  * ``chunkC``   — Pallas, grid over chain chunks of C, per-step loop of
    per-chain (128, 128) MXU dots (chain-major refs);
  * ``batchdimC`` — Pallas, per-step ONE dot_general with a batch dim.

Device-time methodology: REP iterations inside one jitted lax.scan with
per-iteration input perturbation (nothing memoized), wall / REP.
"""

import argparse
import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--b", type=int, default=4096)
    p.add_argument("--n", type=int, default=128)
    p.add_argument("--rep", type=int, default=20)
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from george_tpu.profiling import timeit

    B, N = args.b, args.n
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((B, N, N)), jnp.float32)
    Bm = jnp.asarray(rng.standard_normal((B, N, N)), jnp.float32)
    flops = 2.0 * B * N * N * N

    def bench(fn, name):
        @jax.jit
        def run(a, b):
            def body(carry, i):
                out = fn(a + i * 1e-6, b)
                return carry + out[0, 0, 0], None
            acc, _ = jax.lax.scan(
                body, jnp.float32(0),
                jnp.arange(args.rep, dtype=jnp.float32),
            )
            return acc

        sec = timeit(run, A, Bm, repeats=3) / args.rep
        print("{0:12s}: {1:7.3f} ms  {2:6.2f} TFLOP/s".format(
            name, 1e3 * sec, flops / sec / 1e12))

    def xla(a, b):
        return jnp.einsum("bij,bkj->bik", a, b,
                          precision=jax.lax.Precision.HIGHEST)

    bench(xla, "xla")

    def make_chunk(C, unroll):
        def kernel(a_ref, b_ref, o_ref):
            def one(c, _):
                o_ref[c] = jax.lax.dot_general(
                    a_ref[c], b_ref[c],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                return ()

            if unroll:
                for c in range(C):
                    one(c, ())
            else:
                jax.lax.fori_loop(0, C, one, ())

        @functools.partial(jax.jit, static_argnums=())
        def run(a, b):
            return pl.pallas_call(
                kernel,
                grid=(B // C,),
                in_specs=[
                    pl.BlockSpec((C, N, N), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((C, N, N), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((C, N, N), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, N, N), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=110 * 1024 * 1024,
                ),
            )(a, b)

        return run

    for C in (8, 32, 64):
        try:
            bench(make_chunk(C, unroll=True), "chunk{0}u".format(C))
        except Exception as e:  # noqa: BLE001
            print("chunk{0}u failed: {1}".format(C, str(e)[:200]))
    for C in (32, 64):
        try:
            bench(make_chunk(C, unroll=False), "chunk{0}f".format(C))
        except Exception as e:  # noqa: BLE001
            print("chunk{0}f failed: {1}".format(C, str(e)[:200]))

    def make_batchdim(C):
        def kernel(a_ref, b_ref, o_ref):
            o_ref[...] = jax.lax.dot_general(
                a_ref[...], b_ref[...],
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        @jax.jit
        def run(a, b):
            return pl.pallas_call(
                kernel,
                grid=(B // C,),
                in_specs=[
                    pl.BlockSpec((C, N, N), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((C, N, N), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((C, N, N), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, N, N), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=110 * 1024 * 1024,
                ),
            )(a, b)

        return run

    for C in (8, 32):
        try:
            bench(make_batchdim(C), "batchdim{0}".format(C))
        except Exception as e:  # noqa: BLE001
            print("batchdim{0} failed: {1}".format(C, str(e)[:200]))


if __name__ == "__main__":
    main()

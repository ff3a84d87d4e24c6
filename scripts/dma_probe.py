"""Manual-DMA input-bandwidth probe (VERDICT r2 next-step #5).

Question to settle: the r2 reduce-only probes showed Pallas AUTO-PIPELINED
input consumption capping far below XLA on this backend. Is the cap
fundamental to the backend's kernel data path, or an artifact of the
auto-pipeliner? This probe reads the same (B, L, 128) bf16 array with
EXPLICIT double-buffered ``pltpu.make_async_copy`` from an HBM-resident
ref (memory_space=ANY) and reduces each chunk, sweeping chunk sizes and
buffer counts.

ANSWER (r3, after fixing the loop-hoisting timing artifact — CLAUDE.md
TIMING TRAP): manual DMA hits the same backend cap as the auto-pipeliner
(~12-23 GB/s effective with per-iteration data); the question is closed
and no same-shape kernel beats XLA here (docs/DESIGN.md r3 table).

Run: ``python scripts/dma_probe.py`` (real chip). One JSON line on stdout.
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

B, L, C = 128, 8000, 128  # 262 MB bf16: the r2 probe shape


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_manual_probe(n_rows, chunk_rows, n_buffers):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    num_chunks = n_rows // chunk_rows
    assert n_rows % chunk_rows == 0

    def kernel(x_hbm, o_ref):
        def body(scratch, acc, sem):
            def get_dma(slot, chunk_idx):
                return pltpu.make_async_copy(
                    x_hbm.at[pl.ds(chunk_idx * chunk_rows, chunk_rows), :],
                    scratch.at[slot],
                    sem.at[slot],
                )

            acc[...] = jnp.zeros_like(acc)
            for i in range(n_buffers):
                get_dma(i, i).start()

            def loop(chunk_idx, _):
                slot = chunk_idx % n_buffers

                @pl.when(chunk_idx + n_buffers < num_chunks)
                def _():
                    get_dma(slot, chunk_idx + n_buffers).start()

                get_dma(slot, chunk_idx).wait()
                c = scratch[slot].astype(jnp.float32)
                acc[...] += jnp.sum(
                    c.reshape(chunk_rows // 8, 8, C), axis=0)
                return ()

            jax.lax.fori_loop(0, num_chunks, loop, (), unroll=False)
            o_ref[...] = acc[...]

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((n_buffers, chunk_rows, C), jnp.bfloat16),
            acc=pltpu.VMEM((8, C), jnp.float32),
            sem=pltpu.SemaphoreType.DMA((n_buffers,)),
        )

    @jax.jit
    def probe(x):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, C), jnp.float32),
        )(x)

    return probe


def timed(fn, x, reps=3, k=4):
    """ms per call via a scanned stream of k DISTINCT array copies.

    The body must consume per-iteration data: with a loop-invariant input
    XLA's WhileLICM hoists the whole computation out of the scan and the
    result is one execution divided by k (CLAUDE.md TIMING TRAP — this
    probe's first numbers were exactly that artifact)."""
    import jax
    import jax.numpy as jnp

    xs = jnp.stack([x + jnp.asarray(i, x.dtype) for i in range(k)])

    @jax.jit
    def run(xs):
        def step(c, xi):
            return c + jnp.sum(fn(xi)), ()

        tot, _ = jax.lax.scan(step, jnp.float32(0), xs)
        return tot

    np.asarray(run(xs))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(run(xs))
        best = min(best, time.perf_counter() - t0)
    return best / k * 1e3


def main():
    import jax
    import jax.numpy as jnp

    log(f"device: {jax.devices()[0]}")
    nbytes = B * L * C * 2
    x2d = jnp.asarray(
        np.random.default_rng(0).standard_normal((B * L, C)),
        jnp.bfloat16)

    results = {"shape_gb": round(nbytes / 1e9, 3)}

    # XLA reduce baseline on the same data
    ms = timed(lambda x: jnp.sum(
        x.astype(jnp.float32).reshape(-1, 8, C), axis=0), x2d)
    results["xla_reduce_gbps"] = round(nbytes / ms / 1e6, 1)
    log(f"xla reduce: {ms:.3f} ms -> {results['xla_reduce_gbps']} GB/s")

    # trivial-kernel canary first (CLAUDE.md: distinguishes our kernel
    # failing from the Mosaic helper being down)
    from jax.experimental import pallas as pl

    def triv(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0

    c = pl.pallas_call(
        triv, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(
            jnp.ones((8, 128), jnp.float32))
    np.asarray(c)
    log("mosaic canary ok")

    for chunk_rows, n_buf in [(2048, 2), (4096, 2), (8192, 2), (16384, 2),
                              (4096, 4), (8192, 4), (2048, 8)]:
        vmem_mb = n_buf * chunk_rows * C * 2 / 1e6
        key = f"dma_c{chunk_rows}_b{n_buf}"
        try:
            probe = make_manual_probe(B * L, chunk_rows, n_buf)
            # correctness: the reduce must see all the data
            got = np.asarray(probe(x2d)).sum()
            want = float(np.asarray(
                jnp.sum(x2d.astype(jnp.float32))))
            if not np.isclose(got, want, rtol=1e-3):
                results[key] = f"WRONG sum {got} vs {want}"
                log(f"{key}: WRONG ({got} vs {want})")
                continue
            ms = timed(probe, x2d)
            results[key] = round(nbytes / ms / 1e6, 1)
            log(f"{key} (vmem {vmem_mb:.1f} MB): {ms:.3f} ms -> "
                f"{results[key]} GB/s")
        except Exception as e:  # noqa: BLE001
            results[key] = f"{type(e).__name__}: {str(e)[:100]}"
            log(f"{key}: FAILED {results[key]}")

    print(json.dumps({"metric": "manual_dma_bandwidth", **results}))


if __name__ == "__main__":
    main()

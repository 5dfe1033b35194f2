"""Mosaic probe: does batching Q questions' store rows into one
[Q*200, 2048] x [2048, 512] matmul beat Q separate [200, 2048] matmuls?

Hypothesis: M=200 costs ceil(200/128)=2 MXU row-passes (256 rows' time for
200 useful = 78% tile efficiency); M=600 costs 5 passes (640/600 = 94%).
The no-win "two-questions-per-pass" A/B used M=400 (4 passes, 512/400 =
78% — no change, consistent). If the per-question amortized time drops
>=8% at Q=3/4, the resident kernels are worth restructuring; if not, the
70% figure is not row-tile padding and the idea is discarded.

Each variant runs the SAME total work: B=252 questions (divisible by 1,
2, 3, 4), one grid program per Q-question group, each program does one
[Q*200, 2048] bf16 x [2048, 512] bf16 -> f32 dot from VMEM blocks.
Store rows are fed as Q separate scalar-prefetch-indexed operands and
concatenated in-kernel (what the real restructure would do), so the
probe includes the concat cost. Timing loops ITERS pallas_calls inside
one jitted fori_loop (rows rolled per iteration so nothing hoists) —
one dispatch + one fetch, sidestepping the ~35 ms/dispatch relay block.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, Np, C, H = 64, 200, 2048, 512
B = 252  # divisible by 1, 2, 3, 4 (and 6)
ITERS = 96


def make_call(q):
    def kernel(rows_ref, *refs):
        v_refs = refs[:q]
        wv_ref, out_ref = refs[q], refs[q + 1]
        if q == 1:
            v = v_refs[0][0]
        else:
            v = jnp.concatenate([r[0] for r in v_refs], axis=0)
        out_ref[0] = jnp.dot(v, wv_ref[:],
                             preferred_element_type=jnp.float32)

    def idx(j):
        return lambda i, rows: (rows[i * q + j], 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // q,),
        in_specs=(
            [pl.BlockSpec((1, Np, C), idx(j)) for j in range(q)]
            + [pl.BlockSpec((C, H), lambda i, rows: (0, 0))]),
        out_specs=pl.BlockSpec((1, q * Np, H), lambda i, rows: (i, 0, 0)),
    )
    call = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B // q, q * Np, H), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Np * C * H,
            bytes_accessed=B * Np * C * 2,
            transcendentals=0),
    )

    @jax.jit
    def run_once(store, rows, wv):
        return call(rows, *([store] * q), wv)

    @jax.jit
    def run_many(store, rows, wv):
        def body(i, carry):
            acc, rows = carry
            out = call(rows, *([store] * q), wv)
            return acc + out[0, 0, 0], jnp.roll(rows, 1)

        acc, _ = jax.lax.fori_loop(0, ITERS, body, (0.0, rows))
        return acc

    return run_once, run_many


def main():
    rng = np.random.default_rng(0)
    store = jnp.asarray(rng.normal(size=(M, Np, C)), jnp.bfloat16)
    wv = jnp.asarray(rng.normal(size=(C, H)) * 0.02, jnp.bfloat16)
    rows = jnp.asarray(rng.integers(0, M, size=B).astype(np.int32))
    ref = None
    for q in (1, 2, 3, 4):
        try:
            run_once, run_many = make_call(q)
            out = jax.device_get(run_once(store, rows, wv))
        except Exception as e:  # q=4 may exceed the VMEM budget
            print(f"Q={q}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        flat = out.reshape(B, Np, H)
        if ref is None:
            ref = flat
        else:
            np.testing.assert_allclose(flat, ref, rtol=1e-5)
        jax.device_get(run_many(store, rows, wv))  # compile warm
        t0 = time.time()
        acc = run_many(store, rows, wv)
        acc = jax.device_get(acc)  # sync (block_until_ready broken)
        dt = (time.time() - t0) / ITERS * 1000
        print(f"Q={q}: {dt:.3f} ms/call amortized "
              f"({dt*1000/B:.2f} us/question)  acc={acc:.1f}", flush=True)


if __name__ == "__main__":
    main()

"""Mosaic probe: the resident attention BACKWARD kernel vs the isolated
cost of its own MXU work (run manually on the real TPU:
``python tools/probe_bwd_ceiling.py``).

The production backward (`_make_bwd_kernel_multi`, G=1) measures 0.917
ms/step at B=256 (~64% of bf16 peak by FLOP count) vs the forward's
0.779 ms. This probe times, per question, ONLY the backward's two
matmul groups under the same scalar-prefetch DMA pattern:

  (a) dwv accumulate:  dwv += v^T @ dz      [2048, 200] x [200, 512]
      (accumulating into a constant-index [2048, 512] f32 VMEM block —
      the per-program 4 MB read-modify-write is part of the cost being
      measured)
  (b) dalpha:          g_row @ v^T          [1, 2048] x [2048, 200]

plus the [Np, H] h read the real kernel does. If the probe amortizes to
~0.9 ms at B=256-equivalent, the backward is certified at its Mosaic
ceiling like the forward (BASELINE.md round-4 probe); a significant gap
means the softmax-backward VPU chain or the one-hot packing is costing
real time and is worth attacking.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, Np, C, H = 64, 200, 2048, 512
B = 256
ITERS = 96


def make_call():
    def kernel(rows_ref, v_ref, h_ref, g_ref, dwv_ref, dal_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            dwv_ref[:] = jnp.zeros_like(dwv_ref)

        v = v_ref[0]                       # [Np, C] bf16 (store row DMA)
        h = h_ref[0].astype(jnp.float32)   # [Np, H] saved activations
        dz = h * 0.5                       # stand-in cotangent (VPU-cheap)
        # (b) dalpha: [1, C] x [C, Np]
        g_row = g_ref[0]                   # [1, C]
        dal = jax.lax.dot_general(
            g_row, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [1, Np]
        dal_ref[0] = dal
        # (a) dwv accumulate: [C, Np] x [Np, H] into a resident f32 block
        dwv_ref[:] += jax.lax.dot_general(
            v, dz.astype(v.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [C, H]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Np, C), lambda i, rows: (rows[i], 0, 0)),
            pl.BlockSpec((1, Np, H), lambda i, rows: (i, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda i, rows: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((C, H), lambda i, rows: (0, 0)),
            pl.BlockSpec((1, 1, Np), lambda i, rows: (i, 0, 0)),
        ],
    )
    call = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((C, H), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, Np), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Np * C * (H + 1),
            bytes_accessed=B * Np * (C + H) * 2,
            transcendentals=0),
    )

    @jax.jit
    def run_many(store, rows, h, g):
        def body(i, carry):
            acc, rows = carry
            dwv, dal = call(rows, store, h, g)
            return acc + dwv[0, 0] + dal[0, 0, 0], jnp.roll(rows, 1)

        acc, _ = jax.lax.fori_loop(0, ITERS, body, (0.0, rows))
        return acc

    return run_many


def main():
    rng = np.random.default_rng(0)
    store = jnp.asarray(rng.normal(size=(M, Np, C)), jnp.bfloat16)
    h = jnp.asarray(rng.normal(size=(B, Np, H)), jnp.bfloat16)
    g = jnp.asarray(rng.normal(size=(B, 1, C)), jnp.bfloat16)
    rows = jnp.asarray(rng.integers(0, M, size=B).astype(np.int32))
    run_many = make_call()
    acc = jax.device_get(run_many(store, rows, h, g))  # compile warm
    t0 = time.time()
    acc = jax.device_get(run_many(store, rows, h, g))
    dt = (time.time() - t0) / ITERS * 1000
    print(f"bwd matmul-only probe: {dt:.3f} ms/call at B={B} "
          f"({dt*1000/B:.2f} us/question)  acc={acc:.1f}", flush=True)
    print("production backward kernel: 0.917 ms/step (BASELINE.md)")


if __name__ == "__main__":
    main()

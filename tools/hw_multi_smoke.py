"""On-chip smoke for the G-glimpse resident attention kernels (run
manually on the real TPU: ``python tools/hw_multi_smoke.py``).

Compiles the G=2 fused fwd+bwd through Mosaic, checks the forward against
the gathered spatial_attention_multi oracle (rel err + argmax agreement),
and times 20 fwd+bwd calls. Interpret-mode parity lives in
tests/test_attention_resident.py; this script is the hardware-lowering
check those tests can't do (Mosaic enforces constraints interpret mode
ignores — see .claude/skills/verify/SKILL.md). Round-4 result recorded in
SURVEY.md section 11 (multi-glimpse kernels tested + gated).
"""
import numpy as np, jax, jax.numpy as jnp, time
from vqa_transfer_externaldata_tpu.ops.attention_resident import (
    pad_store_rows, spatial_attention_resident)
from vqa_transfer_externaldata_tpu.ops.attention import spatial_attention_multi

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)
M, N, C, H, B, G = 64, 196, 2048, 512, 256, 2
store = rng.normal(size=(M, N, C)).astype(np.float32)
g32 = store / np.sqrt(np.sum(store**2, -1, keepdims=True) + 1e-12)
padded = jnp.asarray(pad_store_rows(g32.astype(np.float32))).astype(jnp.bfloat16)
rows = jnp.asarray(rng.integers(0, M, size=B).astype(np.int32))
qh = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
wv = jnp.asarray((rng.normal(size=(C, H)) * 0.02).astype(np.float32))
ws_g = jnp.asarray((rng.normal(size=(H, G)) * 0.1).astype(np.float32))

def loss(qh, wv, ws):
    va, al = spatial_attention_resident(
        padded, rows, qh, wv, ws, n_valid=N, normalize=False,
        interpret=False)
    return jnp.sum(va ** 2) + jnp.sum(al ** 3)

t0 = time.time()
(l, g) = jax.value_and_grad(loss, argnums=(0, 1, 2))(qh, wv, ws_g)
l = jax.device_get(l); g = jax.device_get(g)
print(f"hw multi fwd+bwd ok, loss={l:.4f}, compile+run {time.time()-t0:.1f}s", flush=True)

v = jnp.asarray(g32)[np.asarray(rows)].astype(jnp.bfloat16)
va_ref, al_ref = spatial_attention_multi(v, qh, wv, ws_g)
va, al = spatial_attention_resident(padded, rows, qh, wv, ws_g,
                                    n_valid=N, normalize=False, interpret=False)
va, al = jax.device_get((va, al)); va_ref, al_ref = jax.device_get((va_ref, al_ref))
rel = np.linalg.norm(va - va_ref) / np.linalg.norm(va_ref)
print(f"fwd rel err vs gathered oracle: {rel:.2e}", flush=True)
assert rel < 2e-2, rel
print("argmax agreement:", (al.argmax(1) == al_ref.argmax(1)).mean())

# timing: 20 fwd+bwd iterations
f = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))
f(qh, wv, ws_g)[0].block_until_ready()
t0 = time.time()
for _ in range(20):
    r = f(qh, wv, ws_g)
jax.device_get(r[0])
print(f"multi G=2 fwd+bwd: {(time.time()-t0)/20*1000:.3f} ms/call")
print("HW MULTI-GLIMPSE SMOKE PASS")

"""TPU-first GRU question encoder (reference C8/C9: GloVe->GRU over <=26-token
padded questions).

Design (SURVEY.md section 7, hard part (c)): the reference runs a TF1
``GRUCell`` step per token inside the graph. On TPU the right shape is to
hoist the input projection out of the recurrence — one big MXU matmul
``[B*T, D] @ [D, 3H]`` for all timesteps — and keep only the small
``h @ Uh [H,3H]`` matmul + elementwise gates inside ``lax.scan``. Gate
convention is the CuDNN/cuDNN-GRU variant (reset gate applied after the
hidden matmul), which is what allows the hidden projection to stay fused:

    r = sigmoid(x W_r + h U_r + b_r)
    z = sigmoid(x W_z + h U_z + b_z)
    n = tanh  (x W_n + r * (h U_n + b_hn) + b_n)
    h' = (1 - z) * n + z * h

Padded positions (id == <pad> -> mask 0) leave the carry unchanged, so the
final carry equals the state at each row's true length — no gather needed.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class GRUEncoder(nn.Module):
    """Masked GRU over a padded [B, T, D] sequence; returns final state [B, H].

    ``unroll`` trades compile time for fewer scan iterations; T is ~26 so a
    modest unroll keeps XLA's loop overhead negligible.
    """

    hidden: int = 512
    dtype: Dtype = jnp.bfloat16
    unroll: int = 2
    reverse: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        B, T, D = x.shape
        H = self.hidden
        kinit = nn.initializers.glorot_uniform()

        wx = self.param("wx", kinit, (D, 3 * H), jnp.float32)
        uh = self.param("uh", kinit, (H, 3 * H), jnp.float32)
        b = self.param("b", nn.initializers.zeros, (3 * H,), jnp.float32)
        bhn = self.param("bhn", nn.initializers.zeros, (H,), jnp.float32)

        dt = self.dtype
        x = x.astype(dt)
        # Hoisted input projection: one [B*T, D] @ [D, 3H] MXU matmul.
        gx = jnp.dot(x.reshape(B * T, D), wx.astype(dt),
                     preferred_element_type=jnp.float32)
        gx = (gx + b).reshape(B, T, 3 * H)

        uh_c = uh.astype(dt)
        bhn_c = bhn

        def step(h: jnp.ndarray, inp: Tuple[jnp.ndarray, jnp.ndarray]):
            gx_t, m_t = inp  # [B, 3H] float32, [B] mask
            gh = jnp.dot(h.astype(dt), uh_c,
                         preferred_element_type=jnp.float32)  # [B, 3H]
            gx_r, gx_z, gx_n = jnp.split(gx_t, 3, axis=-1)
            gh_r, gh_z, gh_n = jnp.split(gh, 3, axis=-1)
            r = jax.nn.sigmoid(gx_r + gh_r)
            z = jax.nn.sigmoid(gx_z + gh_z)
            n = jnp.tanh(gx_n + r * (gh_n + bhn_c))
            h_new = (1.0 - z) * n + z * h
            m = m_t[:, None].astype(h_new.dtype)
            h_next = m * h_new + (1.0 - m) * h  # padded steps: carry through
            return h_next, None

        h0 = jnp.zeros((B, H), jnp.float32)
        gx_seq = jnp.swapaxes(gx, 0, 1)  # [T, B, 3H]
        mask_seq = jnp.swapaxes(mask, 0, 1)  # [T, B]
        hT, _ = jax.lax.scan(step, h0, (gx_seq, mask_seq),
                             unroll=self.unroll, reverse=self.reverse)
        return hT.astype(dt)


class BiGRUEncoder(nn.Module):
    """Bidirectional variant: concat of forward/backward final states."""

    hidden: int = 512
    dtype: Dtype = jnp.bfloat16
    unroll: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        fwd = GRUEncoder(self.hidden, self.dtype, self.unroll, name="fwd")(
            x, mask)
        bwd = GRUEncoder(self.hidden, self.dtype, self.unroll, reverse=True,
                         name="bwd")(x, mask)
        return jnp.concatenate([fwd, bwd], axis=-1)


def gru_reference(params: dict, x: jnp.ndarray, mask: jnp.ndarray,
                  hidden: int) -> jnp.ndarray:
    """Slow per-step float32 reference for numerics tests: identical math to
    :class:`GRUEncoder` but computed timestep-by-timestep in float32 with no
    hoisting, so tests catch any hoisting/masking bug."""
    wx, uh, b, bhn = (params["wx"], params["uh"], params["b"], params["bhn"])
    B, T, D = x.shape
    h = jnp.zeros((B, hidden), jnp.float32)
    for t in range(T):
        gx = x[:, t].astype(jnp.float32) @ wx + b
        gh = h @ uh
        gx_r, gx_z, gx_n = jnp.split(gx, 3, axis=-1)
        gh_r, gh_z, gh_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(gx_r + gh_r)
        z = jax.nn.sigmoid(gx_z + gh_z)
        n = jnp.tanh(gx_n + r * (gh_n + bhn))
        h_new = (1.0 - z) * n + z * h
        m = mask[:, t][:, None].astype(jnp.float32)
        h = m * h_new + (1.0 - m) * h
    return h

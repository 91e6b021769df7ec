"""Ring attention: sequence-parallel attention over the mesh "data" axis.

The temporal self-attention of the video UNet (and any long-sequence
attention) can shard its sequence across devices: each device holds a
local block of Q/K/V; K/V blocks rotate around the ring via
`lax.ppermute` over ICI while every device accumulates online-softmax
partial results (flash-attention math, f32 accumulators). Compute and
ICI transfer overlap across ring steps; nothing ever materializes the
full (S x S) score matrix or the full K/V on one device.

This is the designed-in replacement for the reference's only scaling
strategy — single-device temporal chunking (SURVEY.md §2e, §5
long-context row). Usage: inside shard_map over a Mesh axis, e.g.

    out = shard_map(
        functools.partial(ring_attention, axis_name="data"),
        mesh=mesh,
        in_specs=(P(None, None, "data", None),) * 3,
        out_specs=P(None, None, "data", None),
    )(q, k, v)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

_NEG_INF = -1e30


def ring_attention(q, k, v, axis_name: str, scale: float | None = None):
    """Per-device body: q/k/v (B, H, S_local, D); sequence sharded on
    `axis_name`. Returns (B, H, S_local, D) = softmax(QK^T)V over the
    FULL sequence."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    n = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)

    qf = q.astype(jnp.float32)
    B, H, S, D = q.shape

    def one_block(acc_m_l, kv):
        acc, m, l = acc_m_l
        k_blk, v_blk = kv
        s = jnp.einsum("bhqd,bhkd->bhqk", qf, k_blk.astype(jnp.float32)) \
            * scale
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_cur)
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jnp.einsum("bhqk,bhkd->bhqd", p, v_blk.astype(jnp.float32))
        acc_new = acc * alpha + pv
        return (acc_new, m_new, l_new)

    def ring_step(i, carry):
        k_cur, v_cur, acc, m, l = carry
        acc, m, l = one_block((acc, m, l), (k_cur, v_cur))
        # rotate K/V to the next device; skip the final (wasted) rotate
        perm = [(j, (j + 1) % n) for j in range(n)]
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return (k_nxt, v_nxt, acc, m, l)

    # derive carries from qf so shard_map marks them varying over the axis
    acc0 = qf * 0.0
    m0 = qf[..., :1] * 0.0 + _NEG_INF
    l0 = qf[..., :1] * 0.0
    _, _, acc, m, l = jax.lax.fori_loop(
        0, n, ring_step, (k, v, acc0, m0, l0))
    l = jnp.where(l == 0.0, 1.0, l)
    return (acc / l).astype(q.dtype)


def make_ring_attention(mesh, axis_name: str = "data"):
    """Jittable wrapper: full (B, H, S, D) arrays in/out, sequence
    sharded over `axis_name` by shard_map."""
    from jax import shard_map

    fn = shard_map(
        functools.partial(ring_attention, axis_name=axis_name),
        mesh=mesh,
        in_specs=(P(None, None, axis_name, None),
                  P(None, None, axis_name, None),
                  P(None, None, axis_name, None)),
        out_specs=P(None, None, axis_name, None),
    )
    return jax.jit(fn)


def ring_attention_for_mesh(mesh, seq_axis: str = "data",
                            head_axis: str = "model"):
    """Attention impl for use INSIDE a jitted model forward: (B,H,S,D)
    q/k/v in, same-shape out, with the sequence axis S sharded over
    `seq_axis` (ring/sequence parallelism) and heads over `head_axis`
    when divisible (tensor parallelism). This is the hook the UNet's
    temporal attention plugs into (models/diffueraser/temporal.py):
    frames stay resident on their data-shard; only K/V blocks rotate
    over ICI. Caller must guarantee S % mesh.shape[seq_axis] == 0.
    """
    from jax import shard_map

    def fn(q, k, v, scale=None):
        H = q.shape[1]
        h_ax = None
        if head_axis in mesh.axis_names:
            n_h = mesh.shape[head_axis]
            if n_h > 1 and H % n_h == 0:
                h_ax = head_axis
        spec = P(None, h_ax, seq_axis, None)
        body = functools.partial(ring_attention, axis_name=seq_axis,
                                 scale=scale)
        return shard_map(body, mesh=mesh, in_specs=(spec, spec, spec),
                         out_specs=spec)(q, k, v)

    return fn

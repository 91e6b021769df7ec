"""Attention for TPU: Pallas flash-attention kernel + XLA fallback.

The reference's attention (SAM2 memory attention, UNet spatial/temporal and
BrushNet attention) all runs through torch/CUDA SDPA. Here the hot path is
a Pallas online-softmax flash kernel (HBM-bandwidth-optimal: K/V streamed
block-wise through VMEM, f32 running max/sum, bf16 MXU matmuls), with a
plain-XLA fallback for CPU tests and shapes the kernel does not cover.

Layout: (B, H, S, D). Head dims that are not lane-aligned (SD1.5 uses
40/80/160) are zero-padded to a multiple of 128 inside the wrapper; padded
K rows are masked via the true kv length carried in SMEM.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU-capable jaxlibs; guard for portability
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

_NEG_INF = -1e30


def _xla_attention(q, k, v, scale, is_causal=False, key_mask=None):
    """Reference attention: f32 softmax accumulation, any shape.

    key_mask: optional (B, Sk) bool — False keys are excluded from the
    softmax (used for padded prompt slots in the SAM2 mask decoder)."""
    out_dtype = q.dtype
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if is_causal:
        Sq, Sk = s.shape[-2], s.shape[-1]
        mask = jnp.tril(jnp.ones((Sq, Sk), dtype=bool), Sk - Sq)
        s = jnp.where(mask, s, _NEG_INF)
    if key_mask is not None:
        s = jnp.where(key_mask[:, None, None, :], s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(out_dtype)


def _flash_kernel_inline(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, *,
                         n_sub, sk, scale_l2e, block_k):
    """Online-softmax block with ALL padding glue in VMEM.

    The wrapper passes q/k/v untouched (no host-side pad / flag-lane
    scatter / layout copy — profiled at ~20% of kernel time at 720p
    spatial-attention shapes). Per tile, in VMEM: q is scaled by
    scale*log2(e); ragged KV rows (the last block when block_k does not
    divide Sk) are zeroed via select — NOT multiply: out-of-bounds reads
    are undefined and may be NaN, and NaN*0 is NaN — and a flag lane is
    appended (q: 1, k: 0 real / -1e30 pad, v: 1) so KV masking and the
    softmax denominator both ride the MXU exactly like the padded-path
    kernel. Ragged q rows produce garbage only in their own (dropped)
    output rows."""
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)

    q = q_ref[0]                                       # (bq, D)
    qf = jnp.concatenate(
        [(q.astype(jnp.float32) * scale_l2e).astype(q.dtype),
         jnp.ones((q.shape[0], 1), q.dtype)], axis=-1)
    k = k_ref[0]
    v = v_ref[0]
    bk = k.shape[0]
    if sk % block_k:
        # statically-ragged KV edge: zero out-of-bounds rows (undefined
        # reads may be NaN — select, never multiply) and set their flag
        # to -inf. All mask algebra stays in f32: Mosaic cannot relayout
        # an (8,128)-tiled i1 mask onto (16,128)-tiled bf16 operands.
        col = jax.lax.broadcasted_iota(jnp.int32, (bk, 1), 0) + j * block_k
        valid = col < sk
        kf = jnp.concatenate(
            [jnp.where(valid, k.astype(jnp.float32), 0.0),
             jnp.where(valid, 0.0, _NEG_INF)], axis=-1).astype(k.dtype)
        vf = jnp.concatenate(
            [jnp.where(valid, v.astype(jnp.float32), 0.0),
             jnp.where(valid, 1.0, 0.0)], axis=-1).astype(v.dtype)
    else:
        kf = jnp.concatenate([k, jnp.zeros((bk, 1), k.dtype)], axis=-1)
        vf = jnp.concatenate([v, jnp.ones((bk, 1), v.dtype)], axis=-1)
    bs = bk // n_sub
    subs = [jax.lax.dot_general(
        qf, kf[i * bs:(i + 1) * bs], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) for i in range(n_sub)]

    for i, s in enumerate(subs):
        m_prev = m_ref[:, :1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(s - m_new)
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), vf[i * bs:(i + 1) * bs],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)   # (bq, D+1); last = l
        acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(j == nk - 1)
    def _finish():
        l = acc_ref[:, -1:]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_ref[:, :o_ref.shape[-1]] / l).astype(o_ref.dtype)


def _flash_kernel_iota(kvlen_ref, q_ref, k_ref, v_ref, o_ref,
                       acc_ref, m_ref, l_ref, *, block_k):
    """Fallback when no free head lane exists (D already lane-aligned):
    KV padding is masked with an iota/compare on the (bq, bk) tile."""
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    kv_len = kvlen_ref[0]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
    s = jnp.where(col < kv_len, s, _NEG_INF)

    m_prev = m_ref[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2(m_prev - m_new)
    p = jnp.exp2(s - m_new)

    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(j == nk - 1)
    def _finish():
        l = l_ref[:, :1]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_ref[:] / l).astype(o_ref.dtype)


def _round_up(x, m):
    return (x + m - 1) // m * m


_LOG2E = 1.4426950408889634


@functools.partial(jax.jit,
                   static_argnames=("scale", "block_q", "block_k",
                                    "interpret"))
def _flash_attention(q, k, v, scale, block_q=None, block_k=None,
                     interpret=False):
    """Pallas flash attention. q: (B,H,Sq,D), k/v: (B,H,Sk,D).

    Head dims with a spare lane inside the 128-wide tile (SD1.5's
    40/80/160 all qualify) run the INLINE kernel: q/k/v stream into the
    grid untouched (the (B*H, S, D) view is a bitcast) and every piece
    of glue — the scale*log2(e) fold, the KV flag lane that masks
    padding and carries the softmax denominator through the MXU, the
    ragged-edge zeroing — happens in VMEM. The previous padded path
    materialized three padded+flagged copies in HBM first; at 720p
    spatial-attention shapes that glue profiled at ~20% of the kernel
    itself. Lane-aligned D (the VAE's single 512-wide head) keeps the
    padded iota-compare kernel: appending a flag lane there would add a
    whole 128-lane tile to the MXU contraction.

    Default block sizes scale inversely with the padded head dim so the
    per-program VMEM footprint stays under the ~16MB scoped limit: 1024
    blocks for D<=127 (SD1.5 spatial attention — large blocks amortize
    grid overhead, measured 2x over 256), shrinking for wide heads."""
    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    # Dl = the internal lane width (incl. flag lane), for VMEM budgeting.
    Dl = _round_up(max(D + 1, 128), 128)
    use_flag = _round_up(D + 1, 128) == _round_up(max(D, 128), 128)
    if not use_flag:
        Dl = _round_up(max(D, 128), 128)
    if block_q is None:
        block_q = max(256, min(1024, (128 * 1024) // Dl))
    if block_k is None:
        # wider KV blocks amortize the per-block m/l/acc corrections
        # (measured ~5% at SD spatial-attention shapes); cap by VMEM
        block_k = min(2 * block_q, (256 * 1024) // Dl)
    bq = min(block_q, _round_up(Sq, 8))
    bk = min(block_k, _round_up(Sk, 128))

    compiler_params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"),
    )
    if use_flag:
        q3 = q.reshape(B * H, Sq, D)
        k3 = k.reshape(B * H, Sk, D)
        v3 = v.reshape(B * H, Sk, D)
        grid = (B * H, pl.cdiv(Sq, bq), pl.cdiv(Sk, bk))
        q_spec = pl.BlockSpec((1, bq, D), lambda b, i, j, *_: (b, i, 0))
        kv_spec = pl.BlockSpec((1, bk, D), lambda b, i, j, *_: (b, j, 0))
        out = pl.pallas_call(
            functools.partial(_flash_kernel_inline,
                              n_sub=2 if bk % 256 == 0 else 1,
                              sk=Sk, scale_l2e=float(scale) * _LOG2E,
                              block_k=bk),
            grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec],
            out_specs=q_spec,
            scratch_shapes=[
                pltpu.VMEM((bq, D + 1), jnp.float32),  # acc (+l lane)
                pltpu.VMEM((bq, 128), jnp.float32),    # m
            ],
            out_shape=jax.ShapeDtypeStruct((B * H, Sq, D), q.dtype),
            compiler_params=None if interpret else compiler_params,
            interpret=interpret,
        )(q3, k3, v3)
        return out.reshape(B, H, Sq, D)

    # lane-aligned D: padded path + iota-compare masking with an
    # explicit l accumulator (kvlen = Sk is a no-op compare when there
    # is no KV padding)
    Sqp = _round_up(Sq, bq)
    Skp = _round_up(Sk, bk)
    qs = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
    qp = jnp.pad(qs, ((0, 0), (0, 0), (0, Sqp - Sq), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, Skp - Sk), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, Skp - Sk), (0, 0)))
    qp = qp.reshape(B * H, Sqp, D)
    kp = kp.reshape(B * H, Skp, D)
    vp = vp.reshape(B * H, Skp, D)
    grid = (B * H, Sqp // bq, Skp // bk)
    q_spec = pl.BlockSpec((1, bq, D), lambda b, i, j, *_: (b, i, 0))
    kv_spec = pl.BlockSpec((1, bk, D), lambda b, i, j, *_: (b, j, 0))
    out = pl.pallas_call(
        functools.partial(_flash_kernel_iota, block_k=bk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec],
            out_specs=q_spec,
            scratch_shapes=[
                pltpu.VMEM((bq, D), jnp.float32),
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, 128), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, Sqp, D), q.dtype),
        compiler_params=compiler_params,
    )(jnp.array([Sk], dtype=jnp.int32), qp, kp, vp)
    return out.reshape(B, H, Sqp, D)[:, :, :Sq, :]


def _packed_kernel(q_ref, k_ref, v_ref, o_ref, *, s_q, s_k):
    """Fused packed small-sequence attention block: scores, block-diagonal
    mask, softmax (base-2; scale*log2(e) pre-folded into q), and PV all
    stay in VMEM — HBM sees only q/k/v/o. Refs: (bg, J*s_q, D) etc."""
    q = q_ref[:]
    s = jax.lax.dot_general(
        q, k_ref[:], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # (bg, J*s_q, J*s_k)
    rb = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) // s_q
    cb = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2) // s_k
    s = jnp.where(rb == cb, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[:], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)           # (bg, J*s_q, D)
    o_ref[:] = (o / l).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("scale", "block_g", "interpret"))
def _packed_small_attention_tpu(q, k, v, scale, block_g=16,
                                interpret=False):
    """Pallas version of _packed_small_attention (same packing math).
    interpret=True runs the kernel in the Pallas interpreter (CPU test
    coverage)."""
    B, H, S, D = q.shape
    Sk = k.shape[2]
    J = max(1, 128 // max(S, Sk))
    BH = B * H
    G0 = -(-BH // J)              # packed groups before grid padding
    # VMEM cap: 3 in + 1 out (J*S x ceil(D/128)*128-lane bf16 tiles,
    # double-buffered) + f32 scores/p (J*max(S,Sk) wide, 128-rounded);
    # keep the per-program footprint under ~10MB. D can exceed 128
    # (SD1.5 temporal heads are 160-wide), so budget the real lane count.
    d_lanes = _round_up(D, 128)
    s_lanes = _round_up(J * max(S, Sk), 128)
    row_bytes = _round_up(J * max(S, Sk), 8) * (
        d_lanes * 4 * 2 * 2 + s_lanes * 2 * 4 * 2)
    bg = max(1, min(block_g, G0, (10 << 20) // row_bytes))
    G = -(-G0 // bg) * bg
    pad = G * J - BH

    def pack(t, s_len):
        t = t.reshape(BH, s_len, D)
        if pad:
            t = jnp.pad(t, ((0, pad), (0, 0), (0, 0)))
        return t.reshape(G, J * s_len, D)

    qs = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
    qp, kp, vp = pack(qs, S), pack(k, Sk), pack(v, Sk)
    spec_q = pl.BlockSpec((bg, J * S, D), lambda i: (i, 0, 0))
    spec_k = pl.BlockSpec((bg, J * Sk, D), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        functools.partial(_packed_kernel, s_q=S, s_k=Sk),
        grid=(G // bg,),
        in_specs=[spec_q, spec_k, spec_k],
        out_specs=spec_q,
        out_shape=jax.ShapeDtypeStruct((G, J * S, D), q.dtype),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out.reshape(G * J, S, D)[:BH].reshape(B, H, S, D)


def _packed_tokenmajor_kernel(q_ref, k_ref, v_ref, o_ref, *,
                              s_q, heads, scale_l2e, bg, J):
    """Packed small-seq attention over TOKEN-MAJOR blocks.

    Refs are (bg*J*s_q, C) slabs of the flat (N*s_q, C) q/k/v — i.e. the
    raw layout of the projection matmuls, with NO head-split transpose
    and NO packing reshape ever materialized in HBM (profiled at 720p
    temporal-attention shapes, those relayouts cost ~4x the attention
    math itself). The row-packing happens as a VMEM reshape here, and
    heads are separated by LANE MASKING: zeroing every lane outside head
    h before a full-C contraction yields exactly head h's scores, so the
    (C = heads*d) axis never has to be physically split. The PV dot
    masks v the same way, making each accumulation touch only head h's
    output lanes."""
    C = q_ref.shape[-1]
    d = C // heads
    JS = J * s_q
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    qs = (q.astype(jnp.float32) * scale_l2e).astype(q.dtype)
    outs = []
    blockmask = None
    for h in range(heads):
        # static lane slices separate heads inside VMEM — no (B,H,S,D)
        # relayout ever reaches HBM
        qh = qs[:, :, h * d:(h + 1) * d]
        kh = k[:, :, h * d:(h + 1) * d]
        vh = v[:, :, h * d:(h + 1) * d]
        s = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)        # (bg, JS, JS)
        if blockmask is None:
            rb = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) // s_q
            cb = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2) // s_q
            blockmask = rb == cb
        s = jnp.where(blockmask, s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        pn = (p / l).astype(v.dtype)
        outs.append(jax.lax.dot_general(
            pn, vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))       # (bg, JS, d)
    o_ref[:] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _largest_divisor(n: int, cap: int) -> int:
    for b in range(min(n, cap), 0, -1):
        if n % b == 0:
            return b
    return 1


@functools.partial(jax.jit,
                   static_argnames=("heads", "scale", "interpret"))
def _packed_tokenmajor_tpu(q, k, v, heads, scale, interpret=False):
    """Token-major packed small-sequence self-attention.

    q/k/v: (N, S, C) with C = heads * head_dim — the projection outputs
    as-is. Returns (N, S, C). Same packing math as
    _packed_small_attention (J = 128 // S sequences share one MXU tile
    under a block-diagonal mask), but both the packing and the head
    split live INSIDE the kernel, so XLA never lays out or relayouts a
    (B, H, S, D) view. Requires J | N (the temporal-attention row counts
    B*H*W at every UNet level satisfy this); callers fall back to the
    (B,H,S,D) paths otherwise."""
    N, S, C = q.shape
    J = max(1, 128 // S)
    G = N // J
    # VMEM per program: 3 qkv in + 1 out (bg*J*S x C bf16, double-
    # buffered) + f32 scores/p (JS x 128-rounded) + f32 acc; cap ~10MB.
    c_lanes = _round_up(C, 128)
    js_pad = _round_up(J * S, 8)
    per_g = (js_pad * c_lanes * 2) * (4 * 2 + 4) \
        + js_pad * _round_up(J * S, 128) * 4 * 2
    bg = _largest_divisor(G, max(1, (10 << 20) // per_g))

    q2 = q.reshape(G, J * S, C)
    k2 = k.reshape(G, J * S, C)
    v2 = v.reshape(G, J * S, C)
    spec = pl.BlockSpec((bg, J * S, C), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        functools.partial(_packed_tokenmajor_kernel, s_q=S, heads=heads,
                          scale_l2e=float(scale) * _LOG2E, bg=bg, J=J),
        grid=(G // bg,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((G, J * S, C), q.dtype),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(q2, k2, v2)
    return out.reshape(N, S, C)


def attention_tokenmajor(q, k, v, heads: int, scale: float | None = None):
    """Self-attention over token-major (N, S, C) q/k/v, C = heads*d.

    Dispatch: the in-kernel-packed Pallas path when it applies (TPU,
    small S, J | N), else head-split + the generic `attention` dispatch.
    This is the temporal-attention hot path: consuming the projection
    outputs directly saves the head-split transpose and packing reshape
    round-trips through HBM (~2x the whole block's attention cost at
    720p shapes)."""
    N, S, C = q.shape
    d = C // heads
    if scale is None:
        scale = d ** -0.5
    J = max(1, 128 // S)
    if (_use_pallas() and 17 <= S <= 64 and C % heads == 0
            and N % J == 0 and N // J >= 8):
        return _packed_tokenmajor_tpu(q, k, v, heads, float(scale))

    def split(t):
        return t.reshape(N, S, heads, d).transpose(0, 2, 1, 3)

    out = attention(split(q), split(k), split(v), scale=float(scale))
    return out.transpose(0, 2, 1, 3).reshape(N, S, C)


@functools.partial(jax.jit, static_argnames=("scale",))
def _packed_small_attention(q, k, v, scale):
    """Attention for SMALL sequence lengths (temporal attention over a
    ~22-frame clip) with a huge batch*heads axis.

    A naive batched (S, S) matmul wastes the MXU: every (22, 40)@(40, 22)
    dot occupies a full 128x128x128 systolic pass. Here J = 128 // S
    batch-head pairs are packed into one (J*S, D) tile so a single MXU
    pass computes J attentions' scores at once; a block-diagonal additive
    mask keeps pairs independent, and because softmax drives the
    off-block entries to exactly 0, the packed PV matmul needs no
    unpacking either. Measured ~2.3x over the naive einsum at 720p
    temporal-attention shapes (11.4 -> ~5 ms), identical numerics.
    """
    B, H, S, D = q.shape
    Sk = k.shape[2]
    J = max(1, 128 // max(S, Sk))
    BH = B * H
    pad = (-BH) % J
    G = (BH + pad) // J

    def pack(t):
        t = t.reshape(BH, t.shape[2], D)
        if pad:
            t = jnp.pad(t, ((0, pad), (0, 0), (0, 0)))
        return t.reshape(G, -1, D)

    qp, kp, vp = pack(q), pack(k), pack(v)
    s = jnp.einsum("bqd,bkd->bqk", qp, kp,
                   preferred_element_type=jnp.float32) * scale
    rb = jax.lax.broadcasted_iota(jnp.int32, (J * S, J * Sk), 0) // S
    cb = jax.lax.broadcasted_iota(jnp.int32, (J * S, J * Sk), 1) // Sk
    s = jnp.where((rb == cb)[None], s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bqk,bkd->bqd", p.astype(v.dtype), vp,
                   preferred_element_type=jnp.float32)
    o = o.reshape(G * J, S, D)[:BH]
    return o.reshape(B, H, S, D).astype(q.dtype)


def _use_pallas() -> bool:
    if os.environ.get("VV_DISABLE_PALLAS", "0") == "1":
        return False
    return pltpu is not None and jax.default_backend() == "tpu"


def attention(q, k, v, scale: float | None = None, is_causal: bool = False,
              backend: str = "auto", key_mask=None):
    """Multi-head attention over (B, H, S, D) tensors.

    backend: "auto" (pallas on TPU for long sequences, xla otherwise),
    "pallas", or "xla". Short KV sequences (temporal attention over a
    22-frame clip, 77-token text cross-attention) stay on the XLA path:
    their score matrices are tiny and a Pallas grid would be pure
    per-program overhead; long spatial self-attention (thousands of
    tokens) runs the flash kernel, where XLA would materialize an
    OOM-sized score tensor.

    key_mask: optional (B, Sk) bool; False keys are masked out (XLA path
    only — masked callers are short prompt-token sequences).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    # (A packed single-block variant for the windowed S=256 shapes —
    # several (batch, head) pairs per instance, full softmax in VMEM —
    # was measured at 20.7 f/s vs flash's 21.3 on the SAM2 leg:
    # no better than the flash grid, so the dispatch stays simple.)
    if key_mask is None and (backend == "pallas" or (
            backend == "auto" and _use_pallas() and not is_causal
            # flash pays off (a) whenever KV is long — XLA would
            # materialize the (B,H,Sq,Sk) scores in HBM — and (b) for
            # long-QUERY cross-attention (UNet attn2: Sq up to 8160,
            # Sk=77): the scores are Sq-tall there too, and the inline
            # kernel's single ragged KV block keeps them in VMEM.
            # The 192 cutoff (was 384) catches Hiera's stage-3 windowed
            # attention (S=256, D=72, B*H=1024): its XLA-path softmax
            # materialized ~268 MB f32 score tensors per block — the
            # `sub` pass alone was 7.1 ms x 33 blocks of the encoder
            # (round-5 SAM2 dissection); shapes below S=192 keep the
            # packed/naive paths where the pallas grid would be pure
            # per-program overhead
            and (k.shape[2] >= 192
                 or (q.shape[2] >= 512 and k.shape[2] >= 64)))):
        return _flash_attention(q, k, v, float(scale))
    # Packed small-sequence path: only where measured to win — S in
    # [17, 64] (J in [2, 7]) with a large batch*heads axis. Below S=17
    # the naive einsum's score tensors are tiny and XLA is faster
    # (measured 0.28 vs 0.71 ms at Hiera's (1024,4,16,72)); above 64 the
    # packing degenerates to J=1.
    if (key_mask is None and not is_causal and backend == "auto"
            and 17 <= max(q.shape[2], k.shape[2]) <= 64
            and q.shape[0] * q.shape[1] >= 1024):
        if _use_pallas():
            return _packed_small_attention_tpu(q, k, v, float(scale))
        return _packed_small_attention(q, k, v, float(scale))
    return _xla_attention(q, k, v, float(scale), is_causal, key_mask)

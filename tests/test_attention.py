"""Attention op: XLA path vs manual reference; pallas path is covered on
TPU by bench/integration (kernel falls back cleanly on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from videovanish_tpu.ops.attention import attention, _xla_attention


def manual_attention(q, k, v, scale):
    s = np.einsum("bhqd,bhkd->bhqk", q, k) * scale
    s = s - s.max(axis=-1, keepdims=True)
    p = np.exp(s)
    p = p / p.sum(axis=-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", p, v)


def test_xla_attention_matches_manual(rng):
    B, H, Sq, Sk, D = 2, 3, 17, 29, 8
    q = rng.standard_normal((B, H, Sq, D)).astype(np.float32)
    k = rng.standard_normal((B, H, Sk, D)).astype(np.float32)
    v = rng.standard_normal((B, H, Sk, D)).astype(np.float32)
    scale = D ** -0.5
    ref = manual_attention(q, k, v, scale)
    out = np.asarray(attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_causal_masks_future(rng):
    B, H, S, D = 1, 2, 8, 4
    q = rng.standard_normal((B, H, S, D)).astype(np.float32)
    k = rng.standard_normal((B, H, S, D)).astype(np.float32)
    v = rng.standard_normal((B, H, S, D)).astype(np.float32)
    out = np.asarray(attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                               is_causal=True))
    # first query position only attends to first key
    ref0 = v[:, :, 0]
    np.testing.assert_allclose(out[:, :, 0], ref0, atol=1e-5)


def test_pallas_kernel_interpret_mode(rng):
    """Run the pallas flash kernel in interpret mode on CPU and compare."""
    import importlib
    A = importlib.import_module("videovanish_tpu.ops.attention")
    if A.pltpu is None:
        return
    B, H, Sq, Sk, D = 1, 2, 64, 80, 16
    q = rng.standard_normal((B, H, Sq, D)).astype(np.float32)
    k = rng.standard_normal((B, H, Sk, D)).astype(np.float32)
    v = rng.standard_normal((B, H, Sk, D)).astype(np.float32)
    scale = D ** -0.5
    ref = manual_attention(q, k, v, scale)
    try:
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            out = np.asarray(A._flash_attention(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale,
                block_q=32, block_k=128))
    except Exception:
        # interpret mode unavailable on this backend; xla path already tested
        return
    np.testing.assert_allclose(out, ref, atol=2e-3)


def test_packed_small_attention_matches_dense(rng):
    """The J-per-MXU-tile packed path (temporal attention's shape class)
    must equal dense attention exactly (block-diag mask -> exact zeros)."""
    from videovanish_tpu.ops.attention import _packed_small_attention
    for (B, H, S, Sk, D) in [(200, 8, 22, 22, 40), (129, 4, 7, 7, 16),
                             (1024, 1, 3, 3, 8)]:
        q = rng.standard_normal((B, H, S, D)).astype(np.float32)
        k = rng.standard_normal((B, H, Sk, D)).astype(np.float32)
        v = rng.standard_normal((B, H, Sk, D)).astype(np.float32)
        ref = manual_attention(q, k, v, D ** -0.5)
        out = np.asarray(_packed_small_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), D ** -0.5))
        np.testing.assert_allclose(out, ref, atol=2e-5)
        # the dispatcher routes this shape class to the packed path
        out2 = np.asarray(attention(jnp.asarray(q), jnp.asarray(k),
                                    jnp.asarray(v)))
        np.testing.assert_allclose(out2, ref, atol=2e-5)


def test_packed_small_attention_pallas_interpret(rng):
    """Pallas fused variant in interpreter mode (CPU coverage)."""
    from videovanish_tpu.ops.attention import _packed_small_attention_tpu
    B, H, S, D = 40, 2, 5, 12
    q = rng.standard_normal((B, H, S, D)).astype(np.float32)
    k = rng.standard_normal((B, H, S, D)).astype(np.float32)
    v = rng.standard_normal((B, H, S, D)).astype(np.float32)
    ref = manual_attention(q, k, v, D ** -0.5)
    out = np.asarray(_packed_small_attention_tpu(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), D ** -0.5,
        interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_packed_tokenmajor_interpret(rng):
    """In-kernel-packed token-major kernel == dense reference (CPU
    interpreter). Covers the temporal-attention hot path's math: lane-
    masked head separation + block-diagonal row packing."""
    from videovanish_tpu.ops.attention import _packed_tokenmajor_tpu
    N, S, heads, d = 40, 22, 4, 16
    C = heads * d
    q = rng.standard_normal((N, S, C)).astype(np.float32)
    k = rng.standard_normal((N, S, C)).astype(np.float32)
    v = rng.standard_normal((N, S, C)).astype(np.float32)

    def split(t):
        return t.reshape(N, S, heads, d).transpose(0, 2, 1, 3)

    ref = manual_attention(split(q), split(k), split(v), d ** -0.5)
    ref = ref.transpose(0, 2, 1, 3).reshape(N, S, C)
    out = np.asarray(_packed_tokenmajor_tpu(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), heads,
        d ** -0.5, interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_attention_tokenmajor_fallback_matches(rng):
    """Off-TPU (and off-shape) the token-major wrapper reduces to the
    head-split + generic dispatch — must equal the dense reference."""
    from videovanish_tpu.ops.attention import attention_tokenmajor
    N, S, heads, d = 6, 22, 2, 8
    C = heads * d
    q = rng.standard_normal((N, S, C)).astype(np.float32)
    k = rng.standard_normal((N, S, C)).astype(np.float32)
    v = rng.standard_normal((N, S, C)).astype(np.float32)

    def split(t):
        return t.reshape(N, S, heads, d).transpose(0, 2, 1, 3)

    ref = manual_attention(split(q), split(k), split(v), d ** -0.5)
    ref = ref.transpose(0, 2, 1, 3).reshape(N, S, C)
    out = np.asarray(attention_tokenmajor(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), heads))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_group_norm_matches_torch(rng):
    import torch
    from videovanish_tpu.ops.groupnorm import group_norm, group_norm_silu
    N, H, W, C = 2, 6, 5, 8
    G = 4
    x = rng.standard_normal((N, H, W, C)).astype(np.float32)
    scale = rng.standard_normal(C).astype(np.float32)
    bias = rng.standard_normal(C).astype(np.float32)

    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    gn = torch.nn.GroupNorm(G, C, eps=1e-6)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(scale))
        gn.bias.copy_(torch.from_numpy(bias))
        ref = gn(tx).permute(0, 2, 3, 1).numpy()
    ours = np.asarray(group_norm(jnp.asarray(x), jnp.asarray(scale),
                                 jnp.asarray(bias), G))
    np.testing.assert_allclose(ours, ref, atol=1e-5)

    ref_silu = ref * (1 / (1 + np.exp(-ref)))
    ours_silu = np.asarray(group_norm_silu(jnp.asarray(x), jnp.asarray(scale),
                                           jnp.asarray(bias), G))
    np.testing.assert_allclose(ours_silu, ref_silu, atol=1e-5)


def test_bilinear_sample_matches_flow_warp(rng):
    """bilinear_sample at grid+flow coords == flow_warp; and it supports
    an output grid different from the input's."""
    from videovanish_tpu.ops.flow import bilinear_sample, flow_warp
    B, H, W, C = 2, 7, 9, 3
    img = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    flow = jnp.asarray((rng.standard_normal((B, H, W, 2)) * 2)
                       .astype(np.float32))
    gy = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    gx = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    coords = jnp.stack([gx + flow[..., 0], gy + flow[..., 1]], -1)
    np.testing.assert_allclose(np.asarray(bilinear_sample(img, coords)),
                               np.asarray(flow_warp(img, flow)), atol=1e-6)
    # half-resolution output grid: integer coords return exact pixels
    cs = jnp.stack(jnp.meshgrid(jnp.arange(0., W, 2.), jnp.arange(0., H, 2.),
                                indexing="xy"), -1)[None].repeat(B, 0)
    out = np.asarray(bilinear_sample(img, cs))
    np.testing.assert_allclose(out, np.asarray(img)[:, ::2, ::2], atol=1e-6)


def test_local_corr_matches_naive(rng):
    from videovanish_tpu.ops.flow import local_corr
    B, H, W, D, r, stride = 2, 6, 8, 5, 2, 2
    f1 = rng.standard_normal((B, H, W, D)).astype(np.float32)
    f2 = rng.standard_normal((B, H, W, D)).astype(np.float32)
    out = np.asarray(local_corr(jnp.asarray(f1), jnp.asarray(f2), r, stride))
    n = 0
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            for (b, i, j) in [(0, 2, 3), (1, 0, 7), (1, 5, 0)]:
                yi, xi = i + dy * stride, j + dx * stride
                ref = 0.0
                if 0 <= yi < H and 0 <= xi < W:
                    ref = float(f1[b, i, j] @ f2[b, yi, xi]) / np.sqrt(D)
                np.testing.assert_allclose(out[b, i, j, n], ref, atol=1e-5)
            n += 1


def test_flow_warp_identity_and_shift(rng):
    from videovanish_tpu.ops.flow import flow_warp
    B, H, W, C = 1, 8, 9, 3
    img = rng.standard_normal((B, H, W, C)).astype(np.float32)
    zero = np.zeros((B, H, W, 2), np.float32)
    np.testing.assert_allclose(np.asarray(flow_warp(jnp.asarray(img), jnp.asarray(zero))),
                               img, atol=1e-6)
    # flow of +1 in x means output(x) = img(x+1)
    one_x = zero.copy(); one_x[..., 0] = 1.0
    out = np.asarray(flow_warp(jnp.asarray(img), jnp.asarray(one_x)))
    np.testing.assert_allclose(out[:, :, :-1], img[:, :, 1:], atol=1e-6)
    np.testing.assert_allclose(out[:, :, -1], 0.0, atol=1e-6)


def test_flash_inline_ragged_blocks(rng):
    """The inline kernel handles block sizes that do NOT divide Sq/Sk
    (no host-side padding exists anymore): ragged q rows are dropped,
    ragged KV rows are masked in VMEM."""
    import importlib
    A = importlib.import_module("videovanish_tpu.ops.attention")
    if A.pltpu is None:
        return
    B, H, Sq, Sk, D = 2, 3, 100, 150, 24
    q = rng.standard_normal((B, H, Sq, D)).astype(np.float32)
    k = rng.standard_normal((B, H, Sk, D)).astype(np.float32)
    v = rng.standard_normal((B, H, Sk, D)).astype(np.float32)
    scale = D ** -0.5
    ref = manual_attention(q, k, v, scale)
    try:
        out = np.asarray(A._flash_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale,
            block_q=32, block_k=128, interpret=True))
    except Exception:
        return  # interpret mode unavailable on this backend
    np.testing.assert_allclose(out, ref, atol=2e-3)


def test_flash_inline_cross_attention_shape(rng):
    """Long query / short KV (UNet attn2: Sq~thousands, Sk=77) — one
    ragged KV block, scores never reach HBM."""
    import importlib
    A = importlib.import_module("videovanish_tpu.ops.attention")
    if A.pltpu is None:
        return
    B, H, Sq, Sk, D = 1, 2, 600, 77, 40
    q = rng.standard_normal((B, H, Sq, D)).astype(np.float32)
    k = rng.standard_normal((B, H, Sk, D)).astype(np.float32)
    v = rng.standard_normal((B, H, Sk, D)).astype(np.float32)
    scale = D ** -0.5
    ref = manual_attention(q, k, v, scale)
    try:
        out = np.asarray(A._flash_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale,
            block_q=256, block_k=128, interpret=True))
    except Exception:
        return
    np.testing.assert_allclose(out, ref, atol=2e-3)

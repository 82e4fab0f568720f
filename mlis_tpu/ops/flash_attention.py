"""KV-tiled flash attention Pallas kernel (online softmax).

For the long-sequence attention the matchers need (LightGlue at 1-2k
keypoints, ViT at 518 px -> 1370 tokens) where the single-block kernel in
ops/attention.py would overflow VMEM: queries are processed in BQ-row
blocks; K/V stream through VMEM in BK-column tiles with the standard
online-softmax running max/sum rescaling, so the (S, T) score matrix never
materializes.

Supports suffix padding via per-row kv_len (keypoint masks from top-k
selection are prefix-valid, so a length is enough — no (S, T) bias array).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BQ = 256
DEFAULT_BK = 512
# single-block path: keep G * S * T * 4B (f32 score tiles) within scoped
# VMEM (16 MB on v5e) alongside q/k/v/out blocks
_SINGLE_BLOCK_BUDGET = 2 * 1024 * 1024  # max G * S_pad * T_pad


def _flash_kernel(kvlen_ref, q_ref, k_ref, v_ref, out_ref):
    """Grid: (BH, S // BQ). Blocks: q (1, BQ, Dh); k/v (1, T, Dh) full;
    kvlen is the whole (BH,) vector in SMEM, indexed by program id.

    Matmul operands stay in the INPUT dtype (bf16 from the matcher/ViT
    stacks -> native-rate MXU) with float32 accumulation; softmax state is
    float32 throughout."""
    q = q_ref[0]  # (BQ, Dh) input dtype
    T = k_ref.shape[1]
    BQ = q.shape[0]
    Dh = q.shape[1]
    scale = 1.0 / (Dh**0.5)
    kv_len = kvlen_ref[pl.program_id(0)]

    BK = min(DEFAULT_BK, T)
    n_kv = T // BK

    def body(j, carry):
        acc, m_prev, l_prev = carry
        k_tile = k_ref[0, pl.ds(j * BK, BK), :]  # (BK, Dh)
        v_tile = v_ref[0, pl.ds(j * BK, BK), :]
        s = jnp.dot(q, k_tile.T, preferred_element_type=jnp.float32) * scale

        col = j * BK + jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 1)
        s = jnp.where(col < kv_len, s, -jnp.inf)

        m_cur = jnp.max(s, axis=1, keepdims=True)  # (BQ, 1)
        m_new = jnp.maximum(m_prev, m_cur)
        # guard fully-masked rows: exp(-inf - -inf) -> use safe max
        m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        p = jnp.exp(s - m_safe)
        p = jnp.where(jnp.isfinite(s), p, 0.0)
        alpha = jnp.where(
            jnp.isfinite(m_prev), jnp.exp(m_prev - m_safe), 0.0
        )
        l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jnp.dot(
            p.astype(v_tile.dtype), v_tile, preferred_element_type=jnp.float32
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((BQ, Dh), jnp.float32)
    m0 = jnp.full((BQ, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((BQ, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, n_kv, body, (acc0, m0, l0))
    out = acc / jnp.maximum(l, 1e-20)
    out_ref[0] = out.astype(out_ref.dtype)


def _single_block_kernel(G, kvlen_ref, q_ref, k_ref, v_ref, out_ref):
    """Grid: (BH // G,). Each step runs G whole (S, T) attention problems
    with one-shot softmax — no online rescaling, no KV loop. At matcher
    shapes (S = T = 1024, Dh = 64) the per-step arithmetic is ~8x the
    KV-tiled kernel's, which amortizes per-step pipeline overhead and
    measures ~20% faster end-to-end."""
    base = pl.program_id(0) * G
    scale = 1.0 / (q_ref.shape[2] ** 0.5)
    for g in range(G):
        q = q_ref[g]  # (S, Dh)
        s = jnp.dot(q, k_ref[g].T, preferred_element_type=jnp.float32) * scale
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kvlen_ref[base + g], s, -jnp.inf)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - jnp.where(jnp.isfinite(m), m, 0.0))
        p = jnp.where(jnp.isfinite(s), p, 0.0)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jnp.dot(
            p.astype(v_ref.dtype), v_ref[g], preferred_element_type=jnp.float32
        )
        out_ref[g] = (o / jnp.maximum(l, 1e-20)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q",))
def flash_attention(
    q: jnp.ndarray,  # (BH, S, Dh)
    k: jnp.ndarray,  # (BH, T, Dh)
    v: jnp.ndarray,  # (BH, T, Dh)
    kv_len: Optional[jnp.ndarray] = None,  # (BH,) valid key count
    block_q: int = DEFAULT_BQ,
) -> jnp.ndarray:
    BH, S, Dh = q.shape
    T = k.shape[1]
    if kv_len is None:
        kv_len = jnp.full((BH,), T, jnp.int32)
    kv_len = kv_len.astype(jnp.int32)

    # single-block fast path: whole (S, T) problems per grid step, grouped
    # G-at-a-time, when the f32 score tiles fit scoped VMEM
    S8 = -(-S // 8) * 8
    T128 = -(-T // 128) * 128
    if S8 * T128 <= _SINGLE_BLOCK_BUDGET and jax.devices()[0].platform == "tpu":
        G = 1
        while (
            G * 2 <= BH
            and BH % (G * 2) == 0
            and (G * 2) * S8 * T128 <= _SINGLE_BLOCK_BUDGET
        ):
            G *= 2
        if S8 != S:
            q = jnp.pad(q, ((0, 0), (0, S8 - S), (0, 0)))
        if T128 != T:
            k = jnp.pad(k, ((0, 0), (0, T128 - T), (0, 0)))
            v = jnp.pad(v, ((0, 0), (0, T128 - T), (0, 0)))
        out = pl.pallas_call(
            functools.partial(_single_block_kernel, G),
            grid=(BH // G,),
            in_specs=[
                pl.BlockSpec((BH,), lambda b: (0,), memory_space=pltpu.SMEM),
                pl.BlockSpec((G, S8, Dh), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((G, T128, Dh), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((G, T128, Dh), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((G, S8, Dh), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((BH, S8, Dh), q.dtype),
        )(kv_len, q, k, v)
        return out[:, :S]

    BQ = min(block_q, S)
    # pad S to a multiple of BQ; padded queries are harmless (masked rows
    # produce zeros and are sliced off)
    S_pad = -(-S // BQ) * BQ
    if S_pad != S:
        q = jnp.pad(q, ((0, 0), (0, S_pad - S), (0, 0)))
    BK = min(DEFAULT_BK, T)
    T_pad = -(-T // BK) * BK
    if T_pad != T:
        k = jnp.pad(k, ((0, 0), (0, T_pad - T), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, T_pad - T), (0, 0)))

    grid = (BH, S_pad // BQ)
    out = pl.pallas_call(
        _flash_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BH,), lambda b, i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, BQ, Dh), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T_pad, Dh), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T_pad, Dh), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BQ, Dh), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, S_pad, Dh), q.dtype),
        interpret=jax.devices()[0].platform != "tpu",
    )(kv_len, q, k, v)
    return out[:, :S]


def flash_mha(
    q: jnp.ndarray,  # (B, S, H, Dh)
    k: jnp.ndarray,  # (B, T, H, Dh)
    v: jnp.ndarray,
    kv_valid: Optional[jnp.ndarray] = None,  # (B, T) prefix-valid mask
) -> jnp.ndarray:
    """Multi-head wrapper over the flash kernel with prefix-mask lengths."""
    B, S, H, Dh = q.shape
    T = k.shape[1]

    def flat(x, L):
        return x.transpose(0, 2, 1, 3).reshape(B * H, L, Dh)

    kv_len = None
    if kv_valid is not None:
        lens = jnp.sum(kv_valid.astype(jnp.int32), axis=1)  # (B,)
        kv_len = jnp.repeat(lens, H)
    out = flash_attention(flat(q, S), flat(k, T), flat(v, T), kv_len)
    return out.reshape(B, H, S, Dh).transpose(0, 2, 1, 3)

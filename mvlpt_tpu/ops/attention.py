"""Fused multi-head attention as a Pallas TPU kernel.

CLIP's sequences are short (text <= 77 tokens, vision ~197+n_ctx), so a
whole-sequence fused kernel — scores, fp32 softmax and the value matmul
in one VMEM-resident program per (batch, head) — is the right shape on
TPU: no (B, H, S, S) probability tensor ever touches HBM, in either the
forward or the (recomputing) backward pass. This replaces the torch
``nn.MultiheadAttention`` hot op of the reference
(/root/reference/clip/model.py:167-188) rather than translating it.

The custom VJP recomputes probabilities in the backward kernel
(flash-attention-style) so residuals are just (q, k, v).

Sequences are padded to lane multiples by the caller-facing wrapper;
padded key positions are masked to -inf so they carry zero probability.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is only importable on TPU-enabled jaxlibs
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _interpret() -> bool:
    """Compile on TPU; interpret elsewhere (CPU tests, multichip dryrun)."""
    try:
        return jax.devices()[0].platform not in ("tpu", "axon")
    except RuntimeError:
        return True


def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    s = s * scale + mask_ref[...]
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    s = s * scale + mask_ref[...]
    p = jax.nn.softmax(s, axis=-1)  # (S, S) fp32, recomputed
    dv = jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))  # softmax vjp
    ds = (ds * scale).astype(q.dtype)
    dq = jnp.dot(ds, k, preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _specs(s_pad, d_pad):
    row = pl.BlockSpec((1, s_pad, d_pad), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    mask = pl.BlockSpec((s_pad, s_pad), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)
    return row, mask


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _attend(q, k, v, mask, scale):
    return _attend_fwd(q, k, v, mask, scale)[0]


def _attend_fwd(q, k, v, mask, scale):
    bh, s_pad, d_pad = q.shape
    row, mspec = _specs(s_pad, d_pad)
    o = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=(bh,),
        in_specs=[row, row, row, mspec],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=_interpret(),
    )(q, k, v, mask)
    return o, (q, k, v, mask)


def _attend_bwd(scale, res, do):
    q, k, v, mask = res
    bh, s_pad, d_pad = q.shape
    row, mspec = _specs(s_pad, d_pad)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=(bh,),
        in_specs=[row, row, row, mspec, row],
        out_specs=(row, row, row),
        out_shape=(jax.ShapeDtypeStruct(q.shape, q.dtype),) * 3,
        interpret=_interpret(),
    )(q, k, v, mask, do)
    return dq, dk, dv, None


_attend.defvjp(_attend_fwd, _attend_bwd)


def pallas_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                     mask: jax.Array | None = None) -> jax.Array:
    """Drop-in ``attn_fn`` for core.layers.attention.

    q, k, v: (B, H, S, D); mask: additive fp32 (S, S) or None.
    Pads S to a lane multiple and D to 128 sublanes-friendly width, runs
    the fused kernel over a (B*H,) grid, unpads.
    """
    b, h, s, d = q.shape
    s_pad = _round_up(s, 128)
    d_pad = _round_up(d, 128)
    scale = d ** -0.5

    full_mask = jnp.zeros((s_pad, s_pad), jnp.float32)
    if mask is not None:
        full_mask = full_mask.at[:s, :s].set(mask.astype(jnp.float32))
    if s_pad != s:  # padded keys must never receive probability mass
        neg = jnp.float32(jnp.finfo(jnp.float32).min)
        full_mask = full_mask.at[:, s:].set(neg)

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, s_pad - s), (0, d_pad - d))
                       ).reshape(b * h, s_pad, d_pad)

    o = _attend(pad(q), pad(k), pad(v), full_mask, scale)
    return o.reshape(b, h, s_pad, d_pad)[:, :, :s, :d]


def available() -> bool:
    if not _HAS_PLTPU:
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except RuntimeError:
        return False


def select_attn_fn(use_pallas: str | bool = "auto",
                   min_seq: int = 0) -> Callable | None:
    """Resolve the TPU.USE_PALLAS config knob to an attn_fn or None
    (None = the XLA einsum path in core.layers.attention).

    Measured on v5e (CLIP shapes, head_dim 64, seq<=256): the fused
    whole-sequence kernel currently loses to XLA's fusion (~505 vs ~795
    img/s end-to-end at batch 32) because D=64 lane padding and the
    (B*H,) grid waste the MXU on these small shapes. 'auto' therefore
    resolves to the XLA path; 'on' forces the kernel (for testing /
    future head-packed tuning)."""
    if use_pallas in (True, "on", "1"):
        return pallas_attention
    return None

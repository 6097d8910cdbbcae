"""Fused multi-head attention as a Pallas TPU kernel.

CLIP's sequences are short (text <= 77 tokens, vision ~197+n_ctx), so a
whole-sequence fused kernel — scores, fp32 softmax and the value matmul
in one VMEM-resident program — is the right shape on TPU: no
(B, H, S, S) probability tensor ever touches HBM in either direction.
This replaces the torch ``nn.MultiheadAttention`` hot op of the
reference (/root/reference/clip/model.py:167-188) rather than
translating it.

Design notes (measured on v5e, ViT-B/16 shapes):
  * each grid program processes a block of G (batch*head) rows with
    batched ``dot_general`` — one program per row starves the MXU
    (505 img/s end-to-end vs 795 XLA); G=16 blocks beat the XLA path
    (image-tower forward 11.5 ms vs 12.5 ms at batch 32).
  * head_dim stays unpadded (64 lanes); sequence pads to 128 multiples
    with -inf masking of padded keys.
  * the custom VJP recomputes probabilities in the backward kernel
    (flash-attention style), so residuals are just (q, k, v) — the XLA
    path must store the probability tensor for the backward pass.
  * a stored-probs hybrid (Pallas forward writing compute-dtype probs,
    XLA einsum backward) was measured and removed: it did not beat the
    fused residual-block kernels (ops/block.py) that 'auto' selects,
    and no config knob reached it.
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

_MAX_BLOCK = 16        # (batch*head) rows per grid program
_VMEM_BUDGET = 10 << 20  # conservative per-program VMEM budget (bytes)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _block_rows(bh: int, s_pad: int, d: int, n_f32_mats: int,
                n_seq_bufs: int) -> int:
    """Largest divisor of bh <= _MAX_BLOCK whose VMEM footprint fits:
    n_f32_mats (S,S) fp32 intermediates + n_seq_bufs (S,D) bf16 buffers
    per row. The backward kernel holds twice the intermediates of the
    forward, so it gets a smaller block."""
    per_row = n_f32_mats * s_pad * s_pad * 4 + n_seq_bufs * s_pad * d * 2
    cap = max(1, _VMEM_BUDGET // per_row)
    for g in range(min(_MAX_BLOCK, cap, bh), 0, -1):
        if bh % g == 0:
            return g
    return 1


from mvlpt_tpu.ops._runtime import interpret as _interpret  # noqa: E402


def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale):
    q, k, v = q_ref[...], k_ref[...], v_ref[...]  # (G, S, D)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32)
    s = s * scale + mask_ref[...][None]
    p = jax.nn.softmax(s, axis=-1)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale):
    q, k, v, do = q_ref[...], k_ref[...], v_ref[...], do_ref[...]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32)
    s = s * scale + mask_ref[...][None]
    p = jax.nn.softmax(s, axis=-1)  # (G, S, S) fp32, recomputed
    dv = jax.lax.dot_general(
        p.astype(do.dtype), do, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(
        do, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))  # softmax vjp
    ds = (ds * scale).astype(q.dtype)
    dq = jax.lax.dot_general(
        ds, k, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(
        ds, q, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)
    dq_ref[...] = dq.astype(dq_ref.dtype)
    dk_ref[...] = dk.astype(dk_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)


def _specs(g, s_pad, d):
    row = pl.BlockSpec((g, s_pad, d), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    mask = pl.BlockSpec((s_pad, s_pad), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)
    return row, mask


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _attend(q, k, v, mask, scale):
    return _attend_fwd(q, k, v, mask, scale)[0]


def _attend_fwd(q, k, v, mask, scale):
    bh, s_pad, d = q.shape
    g = _block_rows(bh, s_pad, d, n_f32_mats=2, n_seq_bufs=4)
    row, mspec = _specs(g, s_pad, d)
    o = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=(bh // g,),
        in_specs=[row, row, row, mspec],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=_interpret(),
    )(q, k, v, mask)
    return o, (q, k, v, mask)


def _attend_bwd(scale, res, do):
    q, k, v, mask = res
    bh, s_pad, d = q.shape
    g = _block_rows(bh, s_pad, d, n_f32_mats=4, n_seq_bufs=7)
    row, mspec = _specs(g, s_pad, d)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=(bh // g,),
        in_specs=[row, row, row, mspec, row],
        out_specs=(row, row, row),
        out_shape=(jax.ShapeDtypeStruct(q.shape, q.dtype),) * 3,
        interpret=_interpret(),
    )(q, k, v, mask, do)
    return dq, dk, dv, None


_attend.defvjp(_attend_fwd, _attend_bwd)


def _padded_call(q, k, v, mask, attend):
    b, h, s, d = q.shape
    s_pad = _round_up(s, 128)
    scale = d ** -0.5

    full_mask = jnp.zeros((s_pad, s_pad), jnp.float32)
    if mask is not None:
        full_mask = full_mask.at[:s, :s].set(mask.astype(jnp.float32))
    if s_pad != s:  # padded keys must never receive probability mass
        neg = jnp.float32(jnp.finfo(jnp.float32).min)
        full_mask = full_mask.at[:, s:].set(neg)

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, s_pad - s), (0, 0))
                       ).reshape(b * h, s_pad, d)

    o = attend(pad(q), pad(k), pad(v), full_mask, scale)
    return o.reshape(b, h, s_pad, d)[:, :, :s, :]


def pallas_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                     mask: jax.Array | None = None) -> jax.Array:
    """Drop-in ``attn_fn`` for core.layers.attention (flash style: the
    backward kernel recomputes probabilities; residuals are just q/k/v).

    q, k, v: (B, H, S, D); mask: additive fp32 (S, S) or None.
    Pads S to a lane multiple, runs the fused kernel over a blocked
    (B*H/G,) grid, unpads.
    """
    return _padded_call(q, k, v, mask, _attend)


from mvlpt_tpu.ops._runtime import available  # noqa: E402,F401


def select_attn_fn(use_pallas: str | bool = "auto",
                   mesh=None, inference: bool = False) -> Callable | None:
    """Resolve the TPU.USE_PALLAS config knob to an attn_fn or None
    (None = the XLA einsum path in core.layers.attention).

    Measured on v5e (ViT-B/16, batch 32): the G-blocked fused kernel
    wins the FORWARD (11.5 vs 12.5 ms image tower) but its recomputing
    backward loses more than that (image fwd+bwd 28.3 vs 26.8 ms; the
    probability tensors fit HBM comfortably at CLIP scale, so XLA's
    stored-probs backward is cheaper than flash-style recompute).
    'block' selects the fused residual-block kernels (ops/block.py):
    whole LN→QKV→MHA→proj and LN→MLP half-blocks as single Pallas
    programs with hand-derived backward kernels — measured 27.6 →
    20.6 ms/step on the flagship UPT config (v5e), so 'auto' selects
    them on a single TPU device.

    ``mesh``: the trainer's device mesh (or None single-device). Under a
    multi-device mesh the kernels run wrapped in ``shard_map``
    (ops/block.py:fused_residual_block_sharded): data-parallel meshes
    map the batch-axis grid over "data" with replicated weights;
    tensor-parallel meshes (model axis > 1) run the Megatron-sharded
    variants (attn_block_tp / mlp_block_tp — H/tp heads resp. 4W/tp
    hidden units per device, fp32 partials psummed over "model"). Head
    counts that don't divide tp fall back to the XLA block inside the
    sharded wrapper. 'auto' keeps the XLA path on TP meshes for now —
    the TP kernels are parity-validated but have no measured throughput
    win (this environment has one chip; BASELINE.md); forcing 'block'
    opts in. 'on' forces the standalone fused-attention kernel (wins
    fwd only; kept for inference-heavy regimes).

    ``inference=True``: when the resolution lands on the fused-block
    kernels, return the inference-flagged marker — no-grad kernel
    variants that skip every backward-residual HBM write (ops/block.py
    attn_block_infer / mlp_block_infer). Only for no-grad paths (eval,
    zero-shot, feature extraction): the inference kernels have no
    VJP, so differentiating through them fails loudly."""

    def _tp_size(m) -> int:
        if m is None:
            return 1
        return dict(zip(m.axis_names, m.devices.shape)).get("model", 1)

    def _maybe_infer(marker):
        return marker.as_inference() if inference else marker

    if use_pallas == "block":
        from mvlpt_tpu.ops import block as block_ops

        if mesh is not None and mesh.devices.size > 1:
            return _maybe_infer(
                block_ops._FusedMarker(auto_selected=False, mesh=mesh))
        return _maybe_infer(block_ops.FUSED)
    if use_pallas in (True, "on", "1"):
        return pallas_attention
    if use_pallas == "auto":
        import jax

        from mvlpt_tpu.ops import block as block_ops

        if not block_ops.available():
            return None
        if mesh is not None and mesh.devices.size > 1:
            if _tp_size(mesh) > 1:
                # Measured-wins-only convention: dp sharding showed no
                # regression on hardware (BASELINE.md mesh datapoint);
                # the TP variants await a multi-chip measurement.
                return None
            return _maybe_infer(
                block_ops._FusedMarker(auto_selected=True, mesh=mesh))
        try:
            single = len(jax.devices()) == 1
        except RuntimeError:
            single = False
        if single:
            return _maybe_infer(block_ops.FUSED_AUTO)
    return None

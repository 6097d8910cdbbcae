"""Transformer building blocks as pure functions over param pytrees.

Numerics contract (established against /root/reference/clip/model.py):
  * LayerNorm computes in fp32 and casts back (clip/model.py:153-159) —
    on TPU this is the fp32 island inside bf16 compute.
  * QuickGELU ``x * sigmoid(1.702 x)`` (clip/model.py:162-164), NOT exact
    GELU; required for weight-compatible behavior.
  * Pre-LN residual attention blocks with a 4x MLP (clip/model.py:167-188).
  * Attention softmax runs in fp32; matmuls accumulate fp32 on the MXU
    via ``preferred_element_type`` and cast back to the compute dtype.

Layout: batch-major ``(B, S, W)`` everywhere (the reference's LND
seq-major layout is a torch-MHA artifact with no TPU benefit). Per-layer
parameters are stacked along a leading layer axis and the stack is driven
by ``lax.scan`` — one compiled block body regardless of depth, friendly
to remat and to VPT's per-layer prompt injection.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    """Dtype roles: params as stored, compute for matmul inputs."""

    param_dtype: jnp.dtype = jnp.bfloat16
    compute_dtype: jnp.dtype = jnp.bfloat16

    @staticmethod
    def from_strings(param: str, compute: str) -> "DTypePolicy":
        return DTypePolicy(jnp.dtype(param), jnp.dtype(compute))


FP32 = DTypePolicy(jnp.float32, jnp.float32)


def layer_norm(x: jax.Array, p: dict, eps: float = 1e-5) -> jax.Array:
    """fp32-island LayerNorm (matches clip/model.py:153-159)."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(dtype)


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


def _matmul(x: jax.Array, w: jax.Array, b: jax.Array | None = None) -> jax.Array:
    """x @ w (+ b) with fp32 MXU accumulation, output in x.dtype."""
    y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def _sdpa(q: jax.Array, k: jax.Array, v: jax.Array,
          mask: jax.Array | None) -> jax.Array:
    """softmax((q k^T) * scale + mask) v with a TPU-shaped backward.

    Forward: logits and softmax in fp32 (the numerics island), output in
    the compute dtype. Backward (custom VJP): the softmax probabilities
    are saved in the COMPUTE dtype (halves the dominant HBM residual
    traffic — fp32 (B,H,S,S) was the top DMA consumer in profiles), and
    every backward matmul runs with compute-dtype inputs + fp32 MXU
    accumulation. The default jax VJP would instead feed the fp32
    softmax cotangent straight into the dq/dk dots, dropping those
    matmuls off the bf16 MXU fast path (~4x slower). Gradients here flow
    only to prompt tokens (the backbone is frozen), so compute-dtype
    backward precision is ample; in fp32 mode the math is unchanged.
    """
    # mask is a formal argument of the custom_vjp (a closed-over traced
    # mask leaks out of lax.map/scan bodies — seen in CoCoOp's chunked
    # text tower); None passes through as an empty pytree.
    return _sdpa_core(q, k, v, mask)


def _sdpa_fwd(q, k, v, mask):
    dtype = v.dtype
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=jnp.float32)
    if mask is not None:
        logits = logits + mask.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
    o = jnp.einsum(
        "bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32)
    return o.astype(dtype), (q, k, v, probs)


def _sdpa_bwd(res, g):
    q, k, v, p = res
    dtype = v.dtype
    scale = q.shape[-1] ** -0.5
    g = g.astype(dtype)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, g,
                    preferred_element_type=jnp.float32).astype(dtype)
    dp = jnp.einsum("bhqd,bhkd->bhqk", g, v,
                    preferred_element_type=jnp.float32).astype(dtype)
    p32, dp32 = p.astype(jnp.float32), dp.astype(jnp.float32)
    ds = (p32 * (dp32 - jnp.sum(p32 * dp32, axis=-1, keepdims=True))
          ).astype(dtype)
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k,
                    preferred_element_type=jnp.float32) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q,
                    preferred_element_type=jnp.float32) * scale
    return dq.astype(dtype), dk.astype(dtype), dv


@jax.custom_vjp
def _sdpa_core(q, k, v, mask):
    return _sdpa_fwd(q, k, v, mask)[0]


_sdpa_core.defvjp(_sdpa_fwd, lambda res, g: (*_sdpa_bwd(res, g), None))


def attention(
    x: jax.Array,
    p: dict,
    n_heads: int,
    mask: jax.Array | None = None,
    attn_fn: Callable | None = None,
) -> jax.Array:
    """Multi-head self-attention. ``mask`` is additive fp32 (S, S) or None.

    ``attn_fn(q, k, v, mask)`` with (B, H, S, D) tensors may be supplied
    to swap in a fused Pallas kernel; default is the XLA path with the
    custom-VJP softmax-attention core (see _sdpa).
    """
    b, s, w = x.shape
    head_dim = w // n_heads
    qkv = _matmul(x, p["qkv_w"], p["qkv_b"])  # (B, S, 3W)
    qkv = qkv.reshape(b, s, 3, n_heads, head_dim)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))  # (B,H,S,D)

    if attn_fn is not None:
        o = attn_fn(q, k, v, mask)
    else:
        o = _sdpa(q, k, v, mask)

    o = o.transpose(0, 2, 1, 3).reshape(b, s, w)
    return _matmul(o, p["out_w"], p["out_b"])


def mlp(x: jax.Array, p: dict) -> jax.Array:
    h = quick_gelu(_matmul(x, p["fc_w"], p["fc_b"]))
    return _matmul(h, p["proj_w"], p["proj_b"])


def residual_block(
    x: jax.Array,
    p: dict,
    n_heads: int,
    mask: jax.Array | None = None,
    attn_fn: Callable | None = None,
) -> jax.Array:
    if attn_fn is not None and getattr(attn_fn, "fused_block", False):
        from mvlpt_tpu.ops import block as block_ops

        mesh = getattr(attn_fn, "mesh", None)
        inference = getattr(attn_fn, "inference", False)
        if mesh is not None:
            return block_ops.fused_residual_block_sharded(
                x, p, n_heads, mask, mesh, inference=inference)
        return block_ops.fused_residual_block(x, p, n_heads, mask,
                                              inference=inference)
    x = x + attention(layer_norm(x, p["ln_1"]), p["attn"], n_heads, mask, attn_fn)
    x = x + mlp(layer_norm(x, p["ln_2"]), p["mlp"])
    return x


def transformer(
    x: jax.Array,
    blocks: dict,
    n_heads: int,
    mask: jax.Array | None = None,
    *,
    inject: jax.Array | None = None,
    inject_n_ctx: int = 0,
    remat: bool = False,
    attn_fn: Callable | None = None,
    unroll: int | bool = True,
) -> jax.Array:
    """Run a stacked-param transformer via ``lax.scan``.

    ``blocks`` leaves have a leading layer axis L. If ``inject`` is given
    — shape (L, n_ctx, W) with row i applied before layer i (row 0 is a
    dummy; the reference injects deep VPT prompts only before layers
    >= 1, /root/reference/trainers/mvlpt.py:68-83) — token positions
    [1, 1+n_ctx) are replaced by the prompt row broadcast over batch.
    ``remat`` rematerialises each layer (the TPU analogue of the
    reference's checkpoint_sequential, mvlpt.py:119-121). ``unroll=True``
    fully unrolls the scan: measured 24% faster fwd+bwd on v5e for the
    12-layer ViT-B towers (cross-layer fusion), at the cost of a longer
    compile; pass 1 to minimize compile time.
    """
    def _inject_rows(h, prompt_row):
        return jax.lax.dynamic_update_slice(
            h,
            jnp.broadcast_to(
                prompt_row.astype(h.dtype)[None],
                (h.shape[0], inject_n_ctx, h.shape[2]),
            ),
            (0, 1, 0),
        )

    if isinstance(blocks, (list, tuple)):
        # Pre-sliced per-layer trees (ops.block.prepare_blocks): callers
        # that run this transformer inside an OUTER scan (the windowed
        # multi-step train program) pre-slice the stacked weights once
        # per dispatch — leaving them stacked makes every outer-scan
        # iteration re-slice (+ re-transpose, for the fused kernels) all
        # L layers' weights, ~0.56 ms/step of loop-invariant work XLA
        # does not hoist (measured, v5e xplane). Python loop = the
        # unrolled scan with the slices gone.
        block_fn = (jax.checkpoint(residual_block, prevent_cse=False,
                                   static_argnums=(2, 4))
                    if remat else residual_block)
        for i, layer_p in enumerate(blocks):
            if inject is not None and i >= 1:
                x = _inject_rows(x, inject[i])
            x = block_fn(x, layer_p, n_heads, mask, attn_fn)
        return x

    def body(carry, xs):
        h = carry
        if inject is not None:
            layer_p, prompt_row = xs
            h = _inject_rows(h, prompt_row)
        else:
            layer_p = xs
        h = residual_block(h, layer_p, n_heads, mask, attn_fn)
        return h, None

    if remat:
        body = jax.checkpoint(body, prevent_cse=False)

    if inject is not None:
        # Layer 0 runs without injection (mvlpt.py:76-77); layers >= 1
        # inject unconditionally, so it is peeled out of the scan rather
        # than predicated inside it.
        layer0 = jax.tree_util.tree_map(lambda p: p[0], blocks)
        rest = jax.tree_util.tree_map(lambda p: p[1:], blocks)
        block0 = (jax.checkpoint(residual_block, prevent_cse=False,
                                 static_argnums=(2, 4))
                  if remat else residual_block)
        x = block0(x, layer0, n_heads, mask, attn_fn)
        x, _ = jax.lax.scan(body, x, (rest, inject[1:]), unroll=unroll)
    else:
        x, _ = jax.lax.scan(body, x, blocks, unroll=unroll)
    return x


def causal_mask(size: int, dtype=jnp.float32) -> jax.Array:
    """Additive causal mask matching clip/model.py:324-330 (-inf upper tri)."""
    mask = jnp.full((size, size), jnp.finfo(jnp.float32).min, dtype=jnp.float32)
    mask = jnp.triu(mask, k=1)
    return mask.astype(dtype)


def dropout(x: jax.Array, rate: float, rng: jax.Array | None) -> jax.Array:
    if rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))

"""CLIP text transformer operating on pre-assembled prompt embeddings.

Matches /root/reference/trainers/mvlpt.py:95-130 (TextEncoder): add
positional embeddings sliced to the realized prompt length (the
CUT_CONTEXTLEN path, mvlpt.py:112 — on TPU the length is simply the
static sequence dimension), run the causal-masked transformer, fp32
LayerNorm, then gather the EOT-position feature per row and project.

The EOT position is the argmax of the token ids
(/root/reference/clip/model.py:350), passed in precomputed as
``eot_idx`` so the device never sees raw token ids in the hot path.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from mvlpt_tpu.core import layers


def encode_text_embeds(
    params: dict,
    prompt_embeds: jax.Array,
    eot_idx: jax.Array,
    *,
    n_heads: int,
    remat: bool = False,
    attn_fn: Callable | None = None,
    unroll: int | bool = True,
) -> jax.Array:
    """(N, S, W) prompt embeddings + (N,) EOT indices -> (N, embed_dim)."""
    compute_dtype = prompt_embeds.dtype
    s = prompt_embeds.shape[1]
    x = prompt_embeds + params["pos_embedding"].astype(compute_dtype)[None, :s]
    mask = layers.causal_mask(s)
    x = layers.transformer(
        x, params["blocks"], n_heads, mask=mask, remat=remat,
        attn_fn=attn_fn, unroll=unroll
    )
    x = layers.layer_norm(x, params["ln_final"])
    x = jnp.take_along_axis(x, eot_idx[:, None, None], axis=1)[:, 0]  # (N, W)
    return layers._matmul(x, params["text_projection"])


def encode_text_embeds_packed(
    params: dict,
    prompt_embeds: jax.Array,
    eot_idx: jax.Array,
    *,
    n_heads: int,
    remat: bool = False,
    attn_fn: Callable | None = None,
    unroll: int | bool = True,
    target_tokens: int = 128,
) -> jax.Array:
    """Class-packed text encoding: pack G class rows into one sequence
    with a block-diagonal causal mask.

    CLIP class prompts are short (S ~ 10-20 under CUT_CONTEXTLEN), so the
    (n_cls, S, W) layout starves the TPU's 128-lane tiles. Packing G =
    target_tokens // S classes per row turns the tensors into
    (n_cls/G, G*S, W) — measured ~25% faster fwd+bwd on v5e at 1000
    classes — with bit-identical math: attention is blocked per class,
    every other op is per-token. Falls back to the plain path when
    packing wouldn't help.
    """
    n_cls, s, w = prompt_embeds.shape
    g = max(1, target_tokens // s)
    if g <= 1 or n_cls <= g:
        return encode_text_embeds(
            params, prompt_embeds, eot_idx, n_heads=n_heads, remat=remat,
            attn_fn=attn_fn, unroll=unroll)
    # Fused-block kernels (ops/block.py) only pay off when the packed
    # grid is deep enough to amortize per-program weight residency:
    # measured on v5e a wash at 10 row-blocks (100 classes), a win at
    # 100 row-blocks (1000 classes). Only 'auto' selections may be
    # downgraded — an explicitly forced TPU.USE_PALLAS='block' sticks.
    if (getattr(attn_fn, "fused_block", False)
            and getattr(attn_fn, "auto_selected", False)
            and (n_cls // g) < 32):
        attn_fn = None

    n_pad = (-n_cls) % g
    if n_pad:
        prompt_embeds = jnp.concatenate(
            [prompt_embeds,
             jnp.zeros((n_pad, s, w), prompt_embeds.dtype)], axis=0)
    rows = (n_cls + n_pad) // g

    compute_dtype = prompt_embeds.dtype
    pos = params["pos_embedding"].astype(compute_dtype)[:s]
    x = prompt_embeds.reshape(rows, g * s, w) + jnp.tile(pos, (g, 1))[None]

    base = layers.causal_mask(s)  # (S, S) additive
    neg = jnp.finfo(jnp.float32).min
    mask = jnp.full((g * s, g * s), neg, jnp.float32)
    for i in range(g):  # g is small and static
        mask = jax.lax.dynamic_update_slice(mask, base, (i * s, i * s))

    x = layers.transformer(
        x, params["blocks"], n_heads, mask=mask, remat=remat,
        attn_fn=attn_fn, unroll=unroll)
    x = layers.layer_norm(x, params["ln_final"])
    x = x.reshape(rows * g, s, w)[:n_cls]
    x = jnp.take_along_axis(x, eot_idx[:, None, None], axis=1)[:, 0]
    return layers._matmul(x, params["text_projection"])


def embed_tokens(params: dict, token_ids: jax.Array, dtype=None) -> jax.Array:
    """Token-embedding lookup (N, S) -> (N, S, W)."""
    emb = params["token_embedding"]
    if dtype is not None:
        emb = emb.astype(dtype)
    return jnp.take(emb, token_ids, axis=0)


def encode_text(
    params: dict,
    token_ids: jax.Array,
    *,
    n_heads: int,
    remat: bool = False,
    attn_fn: Callable | None = None,
    unroll: int | bool = True,
) -> jax.Array:
    """Plain CLIP text encoding from raw token ids (zero-shot path)."""
    x = embed_tokens(params, token_ids, dtype=params["pos_embedding"].dtype)
    eot_idx = jnp.argmax(token_ids, axis=-1)
    return encode_text_embeds(
        params, x, eot_idx, n_heads=n_heads, remat=remat, attn_fn=attn_fn,
        unroll=unroll,
    )

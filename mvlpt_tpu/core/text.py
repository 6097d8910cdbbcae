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

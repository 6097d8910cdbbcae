"""CLIP vision transformer with VPT prompt-injection hooks.

Forward semantics follow /root/reference/clip/model.py:202-236
(patchify -> prepend CLS -> +pos -> ln_pre -> blocks -> ln_post on CLS
-> @ proj) with the VPT extensions of
/root/reference/trainers/mvlpt.py:45-93: shallow prompts inserted
between CLS and patch tokens after ln_pre (positions get no positional
embedding), deep prompts replacing positions [1, 1+n_ctx) before each
block >= 1.

TPU-first choices: patch embedding is an explicit unfold + matmul onto
the MXU (the reference's strided conv lowers to the same contraction but
the reshape form is layout-transparent); the block stack is a scanned
stacked-param transformer (see core/layers.py).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from mvlpt_tpu.core import layers


def patchify(images: jax.Array, patch_size: int) -> jax.Array:
    """(B, H, W, C) -> (B, N, patch*patch*C) with (ph, pw, c) flatten order."""
    b, h, w, c = images.shape
    gh, gw = h // patch_size, w // patch_size
    x = images.reshape(b, gh, patch_size, gw, patch_size, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, gh, gw, ph, pw, C)
    return x.reshape(b, gh * gw, patch_size * patch_size * c)


def embed_image(
    params: dict,
    images: jax.Array,
    patch_size: int,
    normalize: tuple | None = None,
) -> jax.Array:
    """Frozen ViT stem: (B, H, W, 3) -> (B, 1+N, width) tokens after
    ln_pre, BEFORE any VPT prompt insertion.

    Split out of :func:`encode_image` so callers that stage K batches
    per dispatch (windowed trainer / bench) can run the stem ONCE for
    the whole window as one large batched matmul instead of per step
    inside the scan — the stem involves no trainable parameter, so no
    gradient ever flows through it (the reference's conv1/ln_pre are
    frozen too, mvlpt.py:855-860).

    ``normalize=(mean, std)``: ``images`` are raw uint8 pixels and the
    CLIP preprocessing affine ``(x/255 - mean) / std`` is folded
    ALGEBRAICALLY into the patch-embed contraction — per channel it is
    ``a*x + b``, and ``(a⊙x) @ K + b_flat @ K  ==  x @ (a⊙K) + bias``
    with the scaled kernel and bias computed once per call from the
    frozen weights. Staging uint8 + folding halves H2D bytes and makes
    device-side normalization free (no extra pass over the pixels)."""
    kernel = params["patch_embed"]["kernel"]  # (P*P*C, W)
    compute_dtype = kernel.dtype
    if normalize is not None:
        mean, std = (jnp.asarray(v, jnp.float32) for v in normalize)
        a = 1.0 / (255.0 * std)       # (C,)
        shift = -mean / std           # (C,)
        c = images.shape[-1]
        k32 = kernel.astype(jnp.float32).reshape(
            patch_size * patch_size, c, -1)
        k_scaled = (k32 * a[None, :, None]).reshape(
            patch_size * patch_size * c, -1).astype(compute_dtype)
        bias = jnp.sum(k32 * shift[None, :, None], axis=(0, 1))  # (W,)
        x = patchify(images, patch_size).astype(compute_dtype)
        x = layers._matmul(x, k_scaled, bias)
    else:
        x = patchify(images.astype(compute_dtype), patch_size)
        x = layers._matmul(x, kernel)  # (B, N, W)

    b = x.shape[0]
    cls = jnp.broadcast_to(
        params["class_embedding"].astype(compute_dtype)[None, None, :],
        (b, 1, x.shape[-1]),
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embedding"].astype(compute_dtype)[None]
    return layers.layer_norm(x, params["ln_pre"])


def encode_image(
    params: dict,
    images: jax.Array,
    *,
    patch_size: int,
    n_heads: int,
    vpt_shallow: jax.Array | None = None,
    vpt_deep: jax.Array | None = None,
    remat: bool = False,
    attn_fn: Callable | None = None,
    unroll: int | bool = True,
    return_tokens: bool = False,
    pre_embedded: bool = False,
) -> jax.Array:
    """Encode NHWC images to (B, output_dim) features.

    ``vpt_shallow``: (1 or B, n_ctx, width) prompt tokens inserted after
    ln_pre. ``vpt_deep``: (L-1, n_ctx, width) per-layer replacement rows
    (already projected / dropped-out by the prompt learner).
    ``pre_embedded``: ``images`` is already the (B, 1+N, width) token
    output of :func:`embed_image` — skip the stem.
    """
    if pre_embedded:
        x = images
        b = x.shape[0]
        compute_dtype = x.dtype
    else:
        x = embed_image(params, images, patch_size)
        b = x.shape[0]
        compute_dtype = x.dtype

    if vpt_shallow is not None:
        ctx = jnp.broadcast_to(
            vpt_shallow.astype(compute_dtype),
            (b, vpt_shallow.shape[-2], x.shape[-1]),
        )
        x = jnp.concatenate([x[:, :1], ctx, x[:, 1:]], axis=1)

    inject = None
    inject_n_ctx = 0
    if vpt_deep is not None:
        # Row 0 is a dummy (no injection before layer 0, mvlpt.py:76-77).
        inject = jnp.concatenate([jnp.zeros_like(vpt_deep[:1]), vpt_deep], axis=0)
        inject_n_ctx = vpt_deep.shape[-2]

    x = layers.transformer(
        x,
        params["blocks"],
        n_heads,
        mask=None,
        inject=inject,
        inject_n_ctx=inject_n_ctx,
        remat=remat,
        attn_fn=attn_fn,
        unroll=unroll,
    )

    if return_tokens:
        return x
    x = layers.layer_norm(x[:, 0], params["ln_post"])
    if params.get("proj") is not None:
        x = layers._matmul(x, params["proj"])
    return x

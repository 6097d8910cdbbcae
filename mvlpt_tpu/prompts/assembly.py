"""Pure prompt-assembly functions: UPT coupling, VPT preparation, CoOp
prompt construction, CoCoOp conditioning.

Functional re-design of mvlpt.py:327-515 (construct_prompts,
forward_cocoop, forward_mvlpt_proj, forward_vpt, forward_coop).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mvlpt_tpu.core import layers
from mvlpt_tpu.prompts.learner import PromptConsts, PromptSpec


def _linear(x, p):
    return layers._matmul(x, p["kernel"], p["bias"])


def _coupler_transformer_tokenwise(x: jax.Array, blocks: dict) -> jax.Array:
    """The UPT coupler transformer, with the reference's exact semantics.

    mvlpt.py:406 feeds the (1, L, D) prompt sequence to a CLIP
    ``Transformer`` whose ``nn.MultiheadAttention`` is seq-major
    (batch_first=False), so the tensor is interpreted as (seq=1, batch=L,
    D): every token attends only to itself. A softmax over one logit is
    identically 1, so the attention sublayer degenerates to
    ``out_proj(v_proj(ln_1(x)))`` applied tokenwise — no cross-token
    mixing ever happens in the reference coupler. Replicated here
    bug-for-bug (verified by tests/test_reference_parity.py); the
    cross-token variant is available as PROJECT_METHOD='transformer_seq'.
    """
    def body(h, p):
        y = layers.layer_norm(h, p["ln_1"])
        d = h.shape[-1]
        v = layers._matmul(y, p["attn"]["qkv_w"][:, 2 * d:],
                           p["attn"]["qkv_b"][2 * d:])
        h = h + layers._matmul(v, p["attn"]["out_w"], p["attn"]["out_b"])
        h = h + layers.mlp(layers.layer_norm(h, p["ln_2"]), p["mlp"])
        return h, None

    x, _ = jax.lax.scan(body, x, blocks)
    return x


def upt_couple(prompt_params: dict, spec: PromptSpec):
    """UPT coupler (mvlpt.py:376-414): flatten CoOp ctx + all VPT layers
    into one sequence, pre-project to PROJECT_DIM, run the shared 1-layer
    1-head transformer in fp32 (the fp32 island at mvlpt.py:406), split
    and post-project back.

    Returns (coop_ctx, vpt_shallow, vpt_deep) in fp32.
    """
    coop_ctx = prompt_params.get("coop", {}).get("ctx")
    vpt = prompt_params.get("vpt", {})
    vpt_emb = vpt.get("embeddings")
    vpt_deep = vpt.get("embeddings_deep")

    if not spec.has_coupler:
        return coop_ctx, vpt_emb, vpt_deep

    proj = prompt_params["mvlpt_proj"]

    v = vpt_emb  # (1, n_vpt, vpt_dim)
    if spec.vpt_deep and vpt_deep is not None:
        v = jnp.concatenate([v, vpt_deep], axis=0)  # (L, n_vpt, vpt_dim)
    n_vpt_rows = v.shape[0]
    v = v.reshape(1, -1, v.shape[-1]).astype(jnp.float32)

    c = coop_ctx
    if c.ndim == 2:
        c = c[None]
    c = c.reshape(1, -1, c.shape[-1]).astype(jnp.float32)
    coop_len = c.shape[1]

    if "coop_pre" in proj:
        c = _linear(c, proj["coop_pre"])
    if "vpt_pre" in proj:
        v = _linear(v, proj["vpt_pre"])

    seq = jnp.concatenate([c, v], axis=1)  # (1, coop_len + L*n_vpt, d)

    if spec.project_method == "transformer":
        seq = _coupler_transformer_tokenwise(seq, proj["transformer"])
    elif spec.project_method == "transformer_seq":
        # TPU-native extension: true cross-token attention over the
        # coupled sequence (what mvlpt.py:406 *looks like* it does).
        seq = layers.transformer(seq, proj["transformer"], n_heads=1)
    elif spec.project_method == "mlp":
        # The reference's 'mlp' branch crashes at init (nn.GeLU does not
        # exist, mvlpt.py:257); implemented here as the intended GELU.
        seq = jax.nn.gelu(seq)
    seq = seq.astype(jnp.float32)

    c, v = seq[:, :coop_len], seq[:, coop_len:]
    if "coop_post" in proj:
        c = _linear(c, proj["coop_post"])
    if "vpt_post" in proj:
        v = _linear(v, proj["vpt_post"])

    c = c.reshape(-1, spec.coop_n_ctx, spec.text_width)
    c = c[0] if c.shape[0] == 1 else c  # squeeze like mvlpt.py:410
    v = v.reshape(n_vpt_rows, spec.vpt_n_ctx, spec.vpt_dim)
    v_deep = None if n_vpt_rows == 1 else v[1:]
    v_shallow = v[:1]
    return c, v_shallow, v_deep


def vpt_prepare(
    prompt_params: dict,
    spec: PromptSpec,
    vpt_shallow: jax.Array | None,
    vpt_deep: jax.Array | None,
    rng: jax.Array | None = None,
):
    """Apply the optional VPT projection + dropout to shallow and deep
    prompts (mvlpt.py:424, 77-79). Returns tensors ready for the vision
    tower (width = vision_width).

    Note: the reference draws an independent dropout mask per batch
    element (dropout after expand); here one mask per step is shared
    across the batch (dropout before broadcast), which keeps the prompt
    tensors batch-free on device. Distributionally equivalent in
    expectation; only observable when VPT.DROPOUT > 0 (default 0)."""
    if not spec.has_vpt:
        return None, None
    vpt = prompt_params["vpt"]
    if vpt_shallow is None:
        vpt_shallow = vpt["embeddings"]
    if vpt_deep is None and spec.vpt_deep:
        vpt_deep = vpt.get("embeddings_deep")

    proj = vpt.get("proj")
    if proj is not None:
        vpt_shallow = _linear(vpt_shallow.astype(jnp.float32), proj)
        if vpt_deep is not None:
            vpt_deep = _linear(vpt_deep.astype(jnp.float32), proj)
    if rng is not None and spec.vpt_dropout > 0:
        k1, k2 = jax.random.split(rng)
        vpt_shallow = layers.dropout(vpt_shallow, spec.vpt_dropout, k1)
        if vpt_deep is not None:
            vpt_deep = layers.dropout(vpt_deep, spec.vpt_dropout, k2)
    return vpt_shallow, vpt_deep


def coop_assemble(
    ctx: jax.Array | None,
    consts: PromptConsts,
    spec: PromptSpec,
) -> jax.Array:
    """Assemble (n_cls, S, Wt) prompt embeddings (mvlpt.py:439-515).

    'end' is a concat; 'middle'/'front' apply the precomputed per-class
    permutation over the end layout (see learner._position_permutation).
    """
    prefix, suffix = consts.token_prefix, consts.token_suffix
    if ctx is None:
        return jnp.concatenate([prefix, suffix], axis=1)
    if ctx.ndim == 2:
        ctx = jnp.broadcast_to(
            ctx[None], (spec.n_cls, ctx.shape[0], ctx.shape[1]))
    ctx = ctx.astype(prefix.dtype)
    prompts = jnp.concatenate([prefix, ctx, suffix], axis=1)
    if consts.perm is not None:
        prompts = jnp.take_along_axis(prompts, consts.perm[:, :, None], axis=1)
    return prompts


def cocoop_condition(
    prompt_params: dict,
    spec: PromptSpec,
    image_features: jax.Array,
) -> jax.Array:
    """CoCoOp instance-conditioned contexts (mvlpt.py:348-374): shift the
    shared ctx by a meta-net bias per image. Returns (B, n_ctx, Wt)."""
    cc = prompt_params["cocoop"]
    mn = cc["meta_net"]
    h = _linear(image_features.astype(jnp.float32), mn["linear1"])
    h = jax.nn.relu(h)
    bias = _linear(h, mn["linear2"])  # (B, Wt)
    return cc["ctx"][None] + bias[:, None, :]

"""Prompt learner: trainable prompt params + static assembly metadata.

Re-architects /root/reference/trainers/mvlpt.py:138-515
(MultitaskVLPromptLearner + its forward_* methods) as:

  * ``PromptSpec``    — static hyperparameters (shapes, modes) resolved
                        from config + classnames at build time.
  * ``prompt params`` — ONE trainable pytree holding the CoOp context,
                        VPT shallow/deep embeddings, the UPT coupler,
                        and the CoCoOp meta-net. This replaces torch's
                        requires_grad masking (mvlpt.py:855-860): grads
                        flow to this pytree only, the backbone is a
                        frozen argument.
  * ``PromptConsts``  — task-dependent frozen buffers: the embedded
                        prompt prefix/suffix (the reference's
                        token_prefix/token_suffix buffers,
                        mvlpt.py:292-316), EOT gather indices, and
                        precomputed class-token-position permutations.

The 'middle'/'front' class-token positions — per-class ragged concat
loops in the reference (mvlpt.py:459-510) — become a single static
gather: each class's prompt is a permutation of its 'end'-layout
sequence, parameterized by name length, precomputed in numpy.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from mvlpt_tpu.core.clip import CLIPConfig, _init_block_stack
from mvlpt_tpu.tokenizer import get_tokenizer, tokenize


@dataclasses.dataclass(frozen=True)
class PromptSpec:
    n_cls: int
    coop_n_ctx: int = 0
    vpt_n_ctx: int = 0
    cocoop_n_ctx: int = 0
    coop_csc: bool = False
    vpt_deep: bool = True
    vpt_proj_dim: int = -1          # VPT.PROJECT: -1 = identity
    vpt_dropout: float = 0.0
    class_token_position: str = "end"
    project_method: str = "transformer"  # identity / mlp / transformer
    project_dim: int = 128
    context_length: int = 77        # realized max length (CUT_CONTEXTLEN)
    vision_layers: int = 12
    vision_width: int = 768
    text_width: int = 512
    embed_dim: int = 512
    vision_patch_size: int = 16

    @property
    def has_coop(self) -> bool:
        return self.coop_n_ctx > 0

    @property
    def has_vpt(self) -> bool:
        return self.vpt_n_ctx > 0

    @property
    def has_cocoop(self) -> bool:
        return self.cocoop_n_ctx > 0

    @property
    def text_is_static(self) -> bool:
        """True when the text tower output depends on no trained
        parameter (pure VPT: no CoOp ctx, no CoCoOp image conditioning,
        no UPT coupler) — callers may compute text features ONCE per
        prompt state, including across a whole training run
        (mvlpt.py:540-582 recomputes the text tower every step; for
        MVPT that is loop-invariant work)."""
        return not (self.has_coop or self.has_cocoop or self.has_coupler)

    @property
    def has_coupler(self) -> bool:
        return (
            self.has_coop and self.has_vpt and self.project_method != "identity"
        )

    @property
    def vpt_dim(self) -> int:
        return self.vpt_proj_dim if self.vpt_proj_dim > -1 else self.vision_width


class _FrozenArray:
    """Hashable wrapper so host-only arrays can ride pytree metadata."""

    __slots__ = ("array",)

    def __init__(self, array):
        self.array = None if array is None else np.asarray(array)

    def __eq__(self, other):
        if not isinstance(other, _FrozenArray):
            return NotImplemented
        if self.array is None or other.array is None:
            return self.array is other.array
        return (self.array.shape == other.array.shape
                and self.array.tobytes() == other.array.tobytes())

    def __hash__(self):
        if self.array is None:
            return 0
        return hash((self.array.shape, self.array.tobytes()))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PromptConsts:
    """Frozen task-dependent buffers (recomputed per task on load,
    mirroring the drop-token_prefix/suffix-on-load semantics of
    mvlpt.py:1117-1121)."""

    token_prefix: jax.Array      # (n_cls, 1, Wt) SOT embedding
    token_suffix: jax.Array      # (n_cls, S-1-n_ctx, Wt) name+EOT+pad embedding
    eot_idx: jax.Array           # (n_cls,) argmax of token ids
    perm: jax.Array | None       # (n_cls, S) gather for middle/front, None=end
    tokenized: np.ndarray = dataclasses.field(default=None, repr=False)

    def tree_flatten(self):
        leaves = (self.token_prefix, self.token_suffix, self.eot_idx, self.perm)
        aux = self.tokenized if isinstance(self.tokenized, _FrozenArray) \
            else _FrozenArray(self.tokenized)
        return leaves, aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, tokenized=aux.array if isinstance(aux, _FrozenArray) else aux)


def spec_from_cfg(cfg, n_cls: int, clip_cfg: CLIPConfig, classnames=None) -> PromptSpec:
    """Resolve a PromptSpec from the TRAINER.MVLPT config subtree."""
    t = cfg.TRAINER.MVLPT
    coop_n_ctx = t.COOP.N_CTX
    if t.COOP.CTX_INIT:
        coop_n_ctx = len(t.COOP.CTX_INIT.replace("_", " ").split(" "))
    cocoop_n_ctx = t.COCOOP.N_CTX
    if t.COCOOP.CTX_INIT:
        cocoop_n_ctx = len(t.COCOOP.CTX_INIT.replace("_", " ").split(" "))
    context_length = clip_cfg.context_length
    if cfg.TRAINER.CUT_CONTEXTLEN and classnames is not None:
        context_length = compute_cut_context_length(
            classnames, max(coop_n_ctx, cocoop_n_ctx), clip_cfg.context_length,
            ctx_init=t.COCOOP.CTX_INIT if cocoop_n_ctx else t.COOP.CTX_INIT,
        )
    return PromptSpec(
        n_cls=n_cls,
        coop_n_ctx=coop_n_ctx,
        vpt_n_ctx=t.VPT.N_CTX,
        cocoop_n_ctx=cocoop_n_ctx,
        coop_csc=t.COOP.CSC,
        vpt_deep=t.VPT.DEEP,
        vpt_proj_dim=t.VPT.PROJECT,
        vpt_dropout=t.VPT.DROPOUT,
        class_token_position=t.COOP.CLASS_TOKEN_POSITION,
        project_method=t.PROJECT_METHOD,
        project_dim=t.PROJECT_DIM,
        context_length=context_length,
        vision_layers=clip_cfg.vision_layers,
        vision_width=clip_cfg.vision_width,
        text_width=clip_cfg.transformer_width,
        embed_dim=clip_cfg.embed_dim,
        vision_patch_size=clip_cfg.vision_patch_size,
    )


def _prompt_prefix(spec: PromptSpec, ctx_init: str = "") -> str:
    n_ctx = spec.cocoop_n_ctx if spec.has_cocoop else spec.coop_n_ctx
    if ctx_init:
        return ctx_init.replace("_", " ")
    if n_ctx > 0:
        return " ".join(["X"] * n_ctx)
    # pure-VPT mode still formats prompts with a hand template
    # (mvlpt.py:201: 'a photo of a ')
    return "a photo of a"


def format_prompts(classnames, spec: PromptSpec, ctx_init: str = "") -> list[str]:
    prefix = _prompt_prefix(spec, ctx_init)
    return [f"{prefix} {name.replace('_', ' ')}." for name in classnames]


def compute_cut_context_length(classnames, n_ctx: int, max_cap: int = 77,
                               ctx_init: str = "") -> int:
    """CUT_CONTEXTLEN: the realized max prompt token length, capped at the
    model context length (mvlpt.py:297-303). Static at trace time on TPU.

    With CTX_INIT, the measured prompts use the actual init words (which
    may each tokenize to several BPE tokens), matching the reference's
    measurement of the real prompt strings."""
    tok = get_tokenizer()
    spec_tmp = PromptSpec(n_cls=len(classnames), coop_n_ctx=n_ctx)
    prompts = format_prompts(classnames, spec_tmp, ctx_init)
    longest = max(len(tok.encode(p)) + 2 for p in prompts)  # +SOT +EOT
    return min(max_cap, longest)


def _torch_linear_init(key, in_dim, out_dim):
    """torch nn.Linear default: U(-1/sqrt(in), 1/sqrt(in)) for W and b."""
    bound = 1.0 / math.sqrt(in_dim)
    kw, kb = jax.random.split(key)
    return {
        "kernel": jax.random.uniform(kw, (in_dim, out_dim), jnp.float32, -bound, bound),
        "bias": jax.random.uniform(kb, (out_dim,), jnp.float32, -bound, bound),
    }


def init_prompt_params(
    key: jax.Array,
    spec: PromptSpec,
    clip_params: dict | None = None,
    coop_ctx_init: str = "",
    cocoop_ctx_init: str = "",
) -> dict:
    """Initialize the trainable prompt pytree (fp32 masters).

    Init distributions follow mvlpt.py:138-289: VPT xavier-uniform with
    fan = 3*patch^2 + vpt_dim; CoOp/CoCoOp N(0, 0.02) or embeddings of
    the init words; UPT coupler = CLIP-style 1-layer transformer plus
    torch-default pre/post projections; CoCoOp meta-net 2-layer MLP.
    """
    params: dict = {}
    keys = jax.random.split(key, 12)

    if spec.has_vpt:
        val = math.sqrt(6.0 / (3 * spec.vision_patch_size ** 2 + spec.vpt_dim))
        vpt = {
            "embeddings": jax.random.uniform(
                keys[0], (1, spec.vpt_n_ctx, spec.vpt_dim), jnp.float32, -val, val)
        }
        if spec.vpt_deep:
            vpt["embeddings_deep"] = jax.random.uniform(
                keys[1], (spec.vision_layers - 1, spec.vpt_n_ctx, spec.vpt_dim),
                jnp.float32, -val, val)
        if spec.vpt_proj_dim > -1:
            # kaiming_normal fan_out (mvlpt.py:174-176)
            std = math.sqrt(2.0 / spec.vision_width)
            vpt["proj"] = {
                "kernel": jax.random.normal(
                    keys[2], (spec.vpt_dim, spec.vision_width)) * std,
                "bias": jnp.zeros((spec.vision_width,)),
            }
        params["vpt"] = vpt

    if spec.has_coop:
        if coop_ctx_init:
            assert clip_params is not None
            ids = tokenize(coop_ctx_init.replace("_", " "))
            emb = np.asarray(clip_params["text"]["token_embedding"], np.float32)
            ctx = jnp.asarray(emb[ids[0, 1 : 1 + spec.coop_n_ctx]])
        elif spec.coop_csc:
            ctx = jax.random.normal(
                keys[3], (spec.n_cls, spec.coop_n_ctx, spec.text_width)) * 0.02
        else:
            ctx = jax.random.normal(keys[3], (spec.coop_n_ctx, spec.text_width)) * 0.02
        params["coop"] = {"ctx": ctx}

    if spec.has_coupler:
        d = spec.project_dim
        proj = {}
        if spec.text_width != d:
            proj["coop_pre"] = _torch_linear_init(keys[4], spec.text_width, d)
            proj["coop_post"] = _torch_linear_init(keys[5], d, spec.text_width)
        if spec.vpt_dim != d:
            proj["vpt_pre"] = _torch_linear_init(keys[6], spec.vpt_dim, d)
            proj["vpt_post"] = _torch_linear_init(keys[7], d, spec.vpt_dim)
        if spec.project_method in ("transformer", "transformer_seq"):
            proj["transformer"] = _init_block_stack(keys[8], 1, d)
        params["mvlpt_proj"] = proj

    if spec.has_cocoop:
        if cocoop_ctx_init:
            assert clip_params is not None
            ids = tokenize(cocoop_ctx_init.replace("_", " "))
            emb = np.asarray(clip_params["text"]["token_embedding"], np.float32)
            ctx = jnp.asarray(emb[ids[0, 1 : 1 + spec.cocoop_n_ctx]])
        else:
            ctx = jax.random.normal(
                keys[9], (spec.cocoop_n_ctx, spec.text_width)) * 0.02
        params["cocoop"] = {
            "ctx": ctx,
            "meta_net": {
                "linear1": _torch_linear_init(
                    keys[10], spec.embed_dim, spec.embed_dim // 16),
                "linear2": _torch_linear_init(
                    keys[11], spec.embed_dim // 16, spec.text_width),
            },
        }
    return params


def _position_permutation(spec: PromptSpec, name_lens: np.ndarray) -> np.ndarray | None:
    """Permutation over the 'end'-layout sequence [SOT, ctx, suffix] that
    realizes the middle/front class-token positions (mvlpt.py:459-510).

    The EOT position is invariant under these permutations (only tokens
    before it are reordered), so the id-argmax gather stays valid.
    """
    pos = spec.class_token_position
    if pos == "end" or not spec.has_coop:
        return None
    n_cls, s, n_ctx = spec.n_cls, spec.context_length, spec.coop_n_ctx
    half = n_ctx // 2
    perm = np.zeros((n_cls, s), dtype=np.int32)
    for i, nl in enumerate(name_lens):
        nl = int(nl)
        name = list(range(1 + n_ctx, 1 + n_ctx + nl))
        rest = list(range(1 + n_ctx + nl, s))
        if pos == "middle":
            order = (
                [0] + list(range(1, 1 + half)) + name
                + list(range(1 + half, 1 + n_ctx)) + rest
            )
        elif pos == "front":
            order = [0] + name + list(range(1, 1 + n_ctx)) + rest
        else:
            raise ValueError(f"bad class_token_position {pos!r}")
        perm[i] = order
    return perm


def build_prompt_consts(
    classnames,
    spec: PromptSpec,
    clip_params: dict,
    compute_dtype=jnp.bfloat16,
    ctx_init: str = "",
) -> PromptConsts:
    """Tokenize + embed all class prompts with the frozen token embedding
    (mvlpt.py:292-316), and precompute EOT indices / position perms."""
    tok = get_tokenizer()
    classnames = [c.replace("_", " ") for c in classnames]
    name_lens = np.array([len(tok.encode(c)) for c in classnames], np.int32)
    prompts = format_prompts(classnames, spec, ctx_init)
    tokenized = tokenize(prompts, context_length=spec.context_length)

    emb_table = clip_params["text"]["token_embedding"]
    embedded = jnp.take(
        emb_table.astype(compute_dtype), jnp.asarray(tokenized), axis=0
    )  # (n_cls, S, Wt)

    n_ctx = spec.cocoop_n_ctx if spec.has_cocoop else spec.coop_n_ctx
    return PromptConsts(
        token_prefix=embedded[:, :1],
        token_suffix=embedded[:, 1 + n_ctx :],
        eot_idx=jnp.asarray(tokenized.argmax(axis=-1), jnp.int32),
        perm=(None if (p := _position_permutation(spec, name_lens)) is None
              else jnp.asarray(p)),
        tokenized=tokenized,
    )

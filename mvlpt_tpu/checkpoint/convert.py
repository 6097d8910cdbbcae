"""PyTorch CLIP checkpoint -> JAX pytree conversion.

Two source formats:
  * OpenAI CLIP state_dicts (the ``_MODELS`` CDN checkpoints that the
    reference downloads, /root/reference/clip/clip.py:29-38). Config
    hyperparameters are inferred purely from tensor shapes with the same
    rules as /root/reference/clip/model.py:395-432 (ViT detection via
    ``visual.proj``, layer counting via key prefixes).
  * HuggingFace ``transformers`` CLIPModel state_dicts (used by the
    numerics-parity tests, and a convenient offline weight source).

All kernels are transposed to right-multiplication layout; the patch
conv weight becomes a (P*P*3, W) matmul kernel with (ph, pw, c) row
order matching core.vit.patchify.
"""

from __future__ import annotations

import hashlib
import os
import re
import urllib.request
import warnings

import jax.numpy as jnp
import numpy as np

from mvlpt_tpu.core.clip import CLIPConfig

# OpenAI CLIP release CDN (public URLs, sha256-prefixed like the
# reference's _MODELS table at clip/clip.py:29-38).
OPENAI_MODELS = {
    "RN50": "https://openaipublic.azureedge.net/clip/models/afeb0e10f9e5a86da6080e35cf09123aca3b358a0c3e3b6c78a7b63bc04b6762/RN50.pt",
    "RN101": "https://openaipublic.azureedge.net/clip/models/8fa8567bab74a42d41c5915025a8e4538c3bdbe8804a470a72f30b0d94fab599/RN101.pt",
    "RN50x4": "https://openaipublic.azureedge.net/clip/models/7e526bd135e493cef0776de27d5f42653e6b4c8bf9e0f653bb11773263205fdd/RN50x4.pt",
    "RN50x16": "https://openaipublic.azureedge.net/clip/models/52378b407f34354e150460fe41077663dd5b39c54cd0bfd2b27167a4a06ec9aa/RN50x16.pt",
    "RN50x64": "https://openaipublic.azureedge.net/clip/models/be1cfb55d75a9666199fb2206c106743da0f6468c9d327f3e0d0a543a9919d9c/RN50x64.pt",
    "ViT-B/32": "https://openaipublic.azureedge.net/clip/models/40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af/ViT-B-32.pt",
    "ViT-B/16": "https://openaipublic.azureedge.net/clip/models/5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f/ViT-B-16.pt",
    "ViT-L/14": "https://openaipublic.azureedge.net/clip/models/b8cca3fd41ae0c99ba7e8951adf17d267cdb84cd88be6f7c2e0eca1737a03836/ViT-L-14.pt",
    "ViT-L/14@336px": "https://openaipublic.azureedge.net/clip/models/3035c92b350959924f9f00213499208652fc7ea050643e8b385c2dac08641f02/ViT-L-14-336px.pt",
}


def _np(t) -> np.ndarray:
    """torch tensor / array-like -> numpy (fp16/bf16 upcast to fp32).

    bf16 tensors go through .float() first — numpy has no bfloat16, so
    torch's .numpy() would raise 'unsupported ScalarType BFloat16'.
    """
    if hasattr(t, "detach"):
        t = t.detach().cpu()
        if str(t.dtype) == "torch.bfloat16":
            t = t.float()
        t = t.numpy()
    t = np.asarray(t)
    if t.dtype == np.float16:
        t = t.astype(np.float32)
    return t


def config_from_state_dict(sd: dict) -> CLIPConfig:
    """Shape-driven config inference (clip/model.py:398-418 semantics)."""
    if "visual.proj" not in sd:
        raise ValueError(
            "Only ViT CLIP backbones are supported by the prompt-tuning "
            "towers (the reference asserts the same, mvlpt.py:47); RN* "
            "checkpoints are served by the linear-probe feature path."
        )
    conv1 = _np(sd["visual.conv1.weight"])
    vision_width = conv1.shape[0]
    vision_patch_size = conv1.shape[-1]
    vision_layers = len({
        k.split(".")[3] for k in sd
        if k.startswith("visual.transformer.resblocks.") and k.endswith(".ln_1.weight")
    })
    grid = int(round((_np(sd["visual.positional_embedding"]).shape[0] - 1) ** 0.5))
    return CLIPConfig(
        embed_dim=_np(sd["text_projection"]).shape[1],
        image_resolution=vision_patch_size * grid,
        vision_layers=vision_layers,
        vision_width=vision_width,
        vision_patch_size=vision_patch_size,
        context_length=_np(sd["positional_embedding"]).shape[0],
        vocab_size=_np(sd["token_embedding.weight"]).shape[0],
        transformer_width=_np(sd["ln_final.weight"]).shape[0],
        transformer_heads=_np(sd["ln_final.weight"]).shape[0] // 64,
        transformer_layers=len({
            k.split(".")[2] for k in sd
            if k.startswith("transformer.resblocks.") and k.endswith(".ln_1.weight")
        }),
    )


def _stack_openai_blocks(sd: dict, prefix: str, n_layers: int) -> dict:
    def g(i, name):
        return _np(sd[f"{prefix}.resblocks.{i}.{name}"])

    return {
        "ln_1": {
            "scale": np.stack([g(i, "ln_1.weight") for i in range(n_layers)]),
            "bias": np.stack([g(i, "ln_1.bias") for i in range(n_layers)]),
        },
        "attn": {
            "qkv_w": np.stack([g(i, "attn.in_proj_weight").T for i in range(n_layers)]),
            "qkv_b": np.stack([g(i, "attn.in_proj_bias") for i in range(n_layers)]),
            "out_w": np.stack([g(i, "attn.out_proj.weight").T for i in range(n_layers)]),
            "out_b": np.stack([g(i, "attn.out_proj.bias") for i in range(n_layers)]),
        },
        "ln_2": {
            "scale": np.stack([g(i, "ln_2.weight") for i in range(n_layers)]),
            "bias": np.stack([g(i, "ln_2.bias") for i in range(n_layers)]),
        },
        "mlp": {
            "fc_w": np.stack([g(i, "mlp.c_fc.weight").T for i in range(n_layers)]),
            "fc_b": np.stack([g(i, "mlp.c_fc.bias") for i in range(n_layers)]),
            "proj_w": np.stack([g(i, "mlp.c_proj.weight").T for i in range(n_layers)]),
            "proj_b": np.stack([g(i, "mlp.c_proj.bias") for i in range(n_layers)]),
        },
    }


def convert_openai_state_dict(sd: dict, dtype=jnp.float32):
    """OpenAI-format state_dict -> (params pytree, CLIPConfig)."""
    cfg = config_from_state_dict(sd)
    conv1 = _np(sd["visual.conv1.weight"])  # (W, 3, P, P)
    patch_kernel = conv1.transpose(2, 3, 1, 0).reshape(-1, conv1.shape[0])
    params = {
        "visual": {
            "patch_embed": {"kernel": patch_kernel},
            "class_embedding": _np(sd["visual.class_embedding"]),
            "pos_embedding": _np(sd["visual.positional_embedding"]),
            "ln_pre": {"scale": _np(sd["visual.ln_pre.weight"]),
                       "bias": _np(sd["visual.ln_pre.bias"])},
            "blocks": _stack_openai_blocks(sd, "visual.transformer", cfg.vision_layers),
            "ln_post": {"scale": _np(sd["visual.ln_post.weight"]),
                        "bias": _np(sd["visual.ln_post.bias"])},
            "proj": _np(sd["visual.proj"]),
        },
        "text": {
            "token_embedding": _np(sd["token_embedding.weight"]),
            "pos_embedding": _np(sd["positional_embedding"]),
            "blocks": _stack_openai_blocks(sd, "transformer", cfg.transformer_layers),
            "ln_final": {"scale": _np(sd["ln_final.weight"]),
                         "bias": _np(sd["ln_final.bias"])},
            "text_projection": _np(sd["text_projection"]),
        },
        "logit_scale": _np(sd["logit_scale"]),
    }
    import jax
    params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), params)
    params["logit_scale"] = jnp.asarray(_np(sd["logit_scale"]), jnp.float32)
    return params, cfg


def _stack_hf_blocks(sd: dict, prefix: str, n_layers: int) -> dict:
    def g(i, name):
        return _np(sd[f"{prefix}.layers.{i}.{name}"])

    def qkv_w(i):
        return np.concatenate(
            [g(i, f"self_attn.{p}_proj.weight").T for p in ("q", "k", "v")], axis=1)

    def qkv_b(i):
        return np.concatenate(
            [g(i, f"self_attn.{p}_proj.bias") for p in ("q", "k", "v")])

    return {
        "ln_1": {"scale": np.stack([g(i, "layer_norm1.weight") for i in range(n_layers)]),
                 "bias": np.stack([g(i, "layer_norm1.bias") for i in range(n_layers)])},
        "attn": {
            "qkv_w": np.stack([qkv_w(i) for i in range(n_layers)]),
            "qkv_b": np.stack([qkv_b(i) for i in range(n_layers)]),
            "out_w": np.stack([g(i, "self_attn.out_proj.weight").T for i in range(n_layers)]),
            "out_b": np.stack([g(i, "self_attn.out_proj.bias") for i in range(n_layers)]),
        },
        "ln_2": {"scale": np.stack([g(i, "layer_norm2.weight") for i in range(n_layers)]),
                 "bias": np.stack([g(i, "layer_norm2.bias") for i in range(n_layers)])},
        "mlp": {
            "fc_w": np.stack([g(i, "mlp.fc1.weight").T for i in range(n_layers)]),
            "fc_b": np.stack([g(i, "mlp.fc1.bias") for i in range(n_layers)]),
            "proj_w": np.stack([g(i, "mlp.fc2.weight").T for i in range(n_layers)]),
            "proj_b": np.stack([g(i, "mlp.fc2.bias") for i in range(n_layers)]),
        },
    }


def convert_hf_clip(model_or_sd, dtype=jnp.float32):
    """HuggingFace CLIPModel (or its state_dict) -> (params, CLIPConfig)."""
    import jax

    if hasattr(model_or_sd, "state_dict"):
        hf_cfg = model_or_sd.config
        sd = model_or_sd.state_dict()
        v, t = hf_cfg.vision_config, hf_cfg.text_config
        cfg = CLIPConfig(
            embed_dim=hf_cfg.projection_dim,
            image_resolution=v.image_size,
            vision_layers=v.num_hidden_layers,
            vision_width=v.hidden_size,
            vision_patch_size=v.patch_size,
            context_length=t.max_position_embeddings,
            vocab_size=t.vocab_size,
            transformer_width=t.hidden_size,
            transformer_heads=t.num_attention_heads,
            transformer_layers=t.num_hidden_layers,
            vision_heads_override=v.num_attention_heads,
        )
    else:
        raise TypeError("pass a transformers CLIPModel instance")

    conv = _np(sd["vision_model.embeddings.patch_embedding.weight"])
    patch_kernel = conv.transpose(2, 3, 1, 0).reshape(-1, conv.shape[0])
    params = {
        "visual": {
            "patch_embed": {"kernel": patch_kernel},
            "class_embedding": _np(sd["vision_model.embeddings.class_embedding"]),
            "pos_embedding": _np(sd["vision_model.embeddings.position_embedding.weight"]),
            "ln_pre": {"scale": _np(sd["vision_model.pre_layrnorm.weight"]),
                       "bias": _np(sd["vision_model.pre_layrnorm.bias"])},
            "blocks": _stack_hf_blocks(sd, "vision_model.encoder", cfg.vision_layers),
            "ln_post": {"scale": _np(sd["vision_model.post_layernorm.weight"]),
                        "bias": _np(sd["vision_model.post_layernorm.bias"])},
            "proj": _np(sd["visual_projection.weight"]).T,
        },
        "text": {
            "token_embedding": _np(sd["text_model.embeddings.token_embedding.weight"]),
            "pos_embedding": _np(sd["text_model.embeddings.position_embedding.weight"]),
            "blocks": _stack_hf_blocks(sd, "text_model.encoder", cfg.transformer_layers),
            "ln_final": {"scale": _np(sd["text_model.final_layer_norm.weight"]),
                         "bias": _np(sd["text_model.final_layer_norm.bias"])},
            "text_projection": _np(sd["text_projection.weight"]).T,
        },
        "logit_scale": _np(sd["logit_scale"]),
    }
    params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), params)
    params["logit_scale"] = jnp.asarray(_np(sd["logit_scale"]), jnp.float32)
    return params, cfg


def _conv_kernel(t) -> np.ndarray:
    """torch conv weight (O, I, KH, KW) -> HWIO."""
    return _np(t).transpose(2, 3, 1, 0)


def _bn_params(sd, prefix) -> dict:
    return {
        "scale": _np(sd[f"{prefix}.weight"]),
        "bias": _np(sd[f"{prefix}.bias"]),
        "mean": _np(sd[f"{prefix}.running_mean"]),
        "var": _np(sd[f"{prefix}.running_var"]),
    }


def rn_config_from_state_dict(sd) -> "RNConfig":
    from mvlpt_tpu.core.resnet import RNConfig

    counts = tuple(
        len({k.split(".")[2] for k in sd if k.startswith(f"visual.layer{b}.")})
        for b in (1, 2, 3, 4))
    width = _np(sd["visual.layer1.0.conv1.weight"]).shape[0]
    out_dim = _np(sd["visual.attnpool.c_proj.weight"]).shape[0]
    grid = int(round((_np(sd["visual.attnpool.positional_embedding"]).shape[0] - 1)
                     ** 0.5))
    return RNConfig(layers=counts, output_dim=out_dim, width=width,
                    input_resolution=grid * 32, heads=width * 32 // 64)


def convert_openai_rn_state_dict(sd: dict, dtype=jnp.float32):
    """OpenAI RN* checkpoint -> (params, RNConfig, text CLIPConfig).

    ``params['visual']`` follows core/resnet.py's schema; the text tower
    converts identically to the ViT case (shared text architecture)."""
    import jax

    from mvlpt_tpu.core.resnet import RNConfig  # noqa: F401

    rn_cfg = rn_config_from_state_dict(sd)

    def proj(prefix):
        return {"kernel": _np(sd[f"visual.attnpool.{prefix}.weight"]).T,
                "bias": _np(sd[f"visual.attnpool.{prefix}.bias"])}

    def bottleneck(prefix):
        p = {
            "conv1": {"kernel": _conv_kernel(sd[f"{prefix}.conv1.weight"])},
            "bn1": _bn_params(sd, f"{prefix}.bn1"),
            "conv2": {"kernel": _conv_kernel(sd[f"{prefix}.conv2.weight"])},
            "bn2": _bn_params(sd, f"{prefix}.bn2"),
            "conv3": {"kernel": _conv_kernel(sd[f"{prefix}.conv3.weight"])},
            "bn3": _bn_params(sd, f"{prefix}.bn3"),
        }
        if f"{prefix}.downsample.0.weight" in sd:
            p["downsample"] = {
                "conv": {"kernel": _conv_kernel(sd[f"{prefix}.downsample.0.weight"])},
                "bn": _bn_params(sd, f"{prefix}.downsample.1"),
            }
        return p

    visual = {
        "stem": {
            "conv1": {"kernel": _conv_kernel(sd["visual.conv1.weight"])},
            "bn1": _bn_params(sd, "visual.bn1"),
            "conv2": {"kernel": _conv_kernel(sd["visual.conv2.weight"])},
            "bn2": _bn_params(sd, "visual.bn2"),
            "conv3": {"kernel": _conv_kernel(sd["visual.conv3.weight"])},
            "bn3": _bn_params(sd, "visual.bn3"),
        },
        "attnpool": {
            "pos_embedding": _np(sd["visual.attnpool.positional_embedding"]),
            "q_proj": proj("q_proj"), "k_proj": proj("k_proj"),
            "v_proj": proj("v_proj"), "c_proj": proj("c_proj"),
        },
    }
    for b, n in zip((1, 2, 3, 4), rn_cfg.layers):
        visual[f"layer{b}"] = [bottleneck(f"visual.layer{b}.{i}") for i in range(n)]

    text_cfg = CLIPConfig(
        embed_dim=_np(sd["text_projection"]).shape[1],
        context_length=_np(sd["positional_embedding"]).shape[0],
        vocab_size=_np(sd["token_embedding.weight"]).shape[0],
        transformer_width=_np(sd["ln_final.weight"]).shape[0],
        transformer_heads=_np(sd["ln_final.weight"]).shape[0] // 64,
        transformer_layers=len({
            k.split(".")[2] for k in sd
            if k.startswith("transformer.resblocks.") and k.endswith(".ln_1.weight")
        }),
    )
    params = {
        "visual": visual,
        "text": {
            "token_embedding": _np(sd["token_embedding.weight"]),
            "pos_embedding": _np(sd["positional_embedding"]),
            "blocks": _stack_openai_blocks(sd, "transformer",
                                           text_cfg.transformer_layers),
            "ln_final": {"scale": _np(sd["ln_final.weight"]),
                         "bias": _np(sd["ln_final.bias"])},
            "text_projection": _np(sd["text_projection"]),
        },
        "logit_scale": _np(sd["logit_scale"]),
    }
    params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), params)
    params["logit_scale"] = jnp.asarray(_np(sd["logit_scale"]), jnp.float32)
    return params, rn_cfg, text_cfg


def _download(url: str, root: str | None = None) -> str:
    """SHA256-verified download (same cache layout as clip/clip.py:41-70)."""
    root = root or os.path.expanduser("~/.cache/clip")
    os.makedirs(root, exist_ok=True)
    expected = url.split("/")[-2]
    target = os.path.join(root, os.path.basename(url))
    if os.path.isfile(target):
        if hashlib.sha256(open(target, "rb").read()).hexdigest() == expected:
            return target
        warnings.warn(f"{target} exists with wrong sha256; re-downloading")
    urllib.request.urlretrieve(url, target)
    if hashlib.sha256(open(target, "rb").read()).hexdigest() != expected:
        raise RuntimeError(f"sha256 mismatch downloading {url}")
    return target


def load_clip(name_or_path: str, dtype=jnp.float32):
    """Load CLIP weights from an OpenAI .pt file (path or model name).

    Handles both torchscript archives and plain state-dict pickles, like
    /root/reference/clip/clip.py:129-140. Requires torch on the host.
    """
    import torch

    path = name_or_path
    if name_or_path in OPENAI_MODELS:
        path = _download(OPENAI_MODELS[name_or_path])
    try:
        model = torch.jit.load(path, map_location="cpu").eval()
        sd = model.state_dict()
    except RuntimeError:
        sd = torch.load(path, map_location="cpu")
        if "state_dict" in sd:
            sd = sd["state_dict"]
    if "visual.proj" not in sd:  # RN* checkpoint
        params, rn_cfg, _text_cfg = convert_openai_rn_state_dict(sd, dtype=dtype)
        return params, rn_cfg
    return convert_openai_state_dict(sd, dtype=dtype)

"""Torch state-dict converters for the non-CLIP model zoo.

Accepts the checkpoint layouts the reference's ``get_model`` branches
name (trainers/vision_benchmark/evaluation/feature.py:245-321):

* timm ViT / DeiT (``vit_*``, ``deit_*``): ``patch_embed.proj``,
  ``cls_token``(+``dist_token``), ``pos_embed``, ``blocks.N.{norm1,
  attn.qkv,attn.proj,norm2,mlp.fc1,mlp.fc2}``, ``norm``.
* MAE ViT checkpoints: same block keys, stored under a ``model`` dict;
  fine-tuned variants replace ``norm`` with ``fc_norm`` + global
  average pooling (pool='avg' is inferred from that).
* MoCo-v3 ViT checkpoints: timm keys under
  ``state_dict / module.base_encoder.`` prefixes; the projection head
  (``head.*``) is dropped like every classifier here.
* torchvision ResNet: ``conv1/bn1``, ``layer{1..4}.{j}.conv*/bn*/
  downsample``, classifier ``fc`` dropped (the reference's EvalModel
  keeps children()[:-1], feature.py:50-59).

All converters are strict: unexpected leftover keys raise, so a
checkpoint from a different architecture fails loudly instead of
silently producing garbage features.  Conversion is shape-driven in the
same spirit as the CLIP ``build_model`` port (checkpoint/convert.py):
hyperparameters are inferred from tensor shapes, not from the name.
"""

from __future__ import annotations

import re

import jax.numpy as jnp
import numpy as np

from mvlpt_tpu.core.zoo import StdViTConfig, TVResNetConfig

# width -> canonical head count for timm/MAE/MoCo-v3 ViTs (heads are
# not recoverable from tensor shapes; this is the published table)
_VIT_HEADS = {192: 3, 384: 6, 768: 12, 1024: 16, 1280: 16}


def _np(t) -> np.ndarray:
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _unwrap_cnn_state_dict(sd: dict) -> dict:
    """Peel 'state_dict' / DataParallel 'module.' wrappers (shared by
    the EfficientNet and torchvision-ResNet converters)."""
    sd = dict(sd)
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = dict(sd["state_dict"])
    if any(k.startswith("module.") for k in sd):
        sd = {k[len("module."):]: v for k, v in sd.items()
              if k.startswith("module.")}
    return sd


def _conv_bn_readers(sd: dict, dtype):
    """Consuming readers for torch conv kernels (OIHW -> HWIO) and BN
    stat dicts — the one definition both CNN converters share, so the
    layout/key scheme can't drift between backbones."""
    def conv(key):
        return jnp.asarray(_np(sd.pop(key)).transpose(2, 3, 1, 0), dtype)

    def bn(prefix):
        out = {"scale": jnp.asarray(_np(sd.pop(f"{prefix}.weight")), dtype),
               "bias": jnp.asarray(_np(sd.pop(f"{prefix}.bias")), dtype),
               "mean": jnp.asarray(_np(sd.pop(f"{prefix}.running_mean")),
                                   dtype),
               "var": jnp.asarray(_np(sd.pop(f"{prefix}.running_var")),
                                  dtype)}
        sd.pop(f"{prefix}.num_batches_tracked", None)
        return out

    return conv, bn


def _unwrap_vit_state_dict(sd: dict) -> dict:
    """Peel MAE ('model') / MoCo-v3 ('state_dict' + 'module.base_encoder.')
    wrappers down to bare timm keys."""
    for wrapper in ("model", "state_dict"):
        if wrapper in sd and isinstance(sd[wrapper], dict):
            sd = sd[wrapper]
    prefixes = ("module.base_encoder.", "base_encoder.", "module.")
    for prefix in prefixes:
        if any(k.startswith(prefix) for k in sd):
            sd = {k[len(prefix):]: v for k, v in sd.items()
                  if k.startswith(prefix)}
    return sd


def std_vit_config_from_state_dict(sd: dict) -> StdViTConfig:
    """Shape-driven config inference (the zoo analogue of the CLIP
    ``build_model`` rules, clip/model.py:395-418)."""
    sd = _unwrap_vit_state_dict(sd)
    pw = _np(sd["patch_embed.proj.weight"])  # (W, C, P, P)
    width, _, patch, _ = pw.shape
    n_layers = 1 + max(int(m.group(1)) for k in sd
                       if (m := re.match(r"blocks\.(\d+)\.", k)))
    pos = _np(sd["pos_embed"])
    n_prefix = 2 if "dist_token" in sd else 1
    n_patches = pos.shape[1] - n_prefix
    res = int(round(n_patches ** 0.5)) * patch
    mlp_ratio = _np(sd["blocks.0.mlp.fc1.weight"]).shape[0] // width
    pool = "avg" if ("fc_norm.weight" in sd and "norm.weight" not in sd) \
        else "cls"
    # heads: published table, falling back to the width//64 rule every
    # one of these families uses (head_dim 64)
    return StdViTConfig(
        patch_size=patch, width=width, layers=n_layers,
        heads=_VIT_HEADS.get(width, max(1, width // 64)),
        input_resolution=res,
        mlp_ratio=mlp_ratio, n_prefix=n_prefix, pool=pool)


def convert_std_vit(sd: dict, dtype=jnp.float32):
    """timm/MAE/MoCo-v3 ViT state dict -> (params, StdViTConfig) for
    core/zoo.py:std_vit_features."""
    sd = dict(_unwrap_vit_state_dict(sd))
    cfg = std_vit_config_from_state_dict(sd)
    w = cfg.width

    def take(key):
        return _np(sd.pop(key))

    def lin(prefix):
        return (jnp.asarray(take(f"{prefix}.weight").T, dtype),
                jnp.asarray(take(f"{prefix}.bias"), dtype))

    def ln(prefix):
        return {"scale": jnp.asarray(take(f"{prefix}.weight"), dtype),
                "bias": jnp.asarray(take(f"{prefix}.bias"), dtype)}

    pw = take("patch_embed.proj.weight")  # (W, C, P, P)
    kernel = jnp.asarray(
        pw.transpose(2, 3, 1, 0).reshape(-1, w), dtype)  # (P*P*C, W)
    prefix_tokens = [take("cls_token").reshape(1, w)]
    if "dist_token" in sd:
        prefix_tokens.append(take("dist_token").reshape(1, w))
    params = {
        "patch_embed": {"kernel": kernel,
                        "bias": jnp.asarray(take("patch_embed.proj.bias"),
                                            dtype)},
        "prefix_tokens": jnp.asarray(np.concatenate(prefix_tokens), dtype),
        "pos_embed": jnp.asarray(take("pos_embed")[0], dtype),
        "norm": ln("fc_norm" if cfg.pool == "avg" else "norm"),
        "blocks": [],
    }
    for i in range(cfg.layers):
        qkv_w, qkv_b = lin(f"blocks.{i}.attn.qkv")
        out_w, out_b = lin(f"blocks.{i}.attn.proj")
        fc_w, fc_b = lin(f"blocks.{i}.mlp.fc1")
        pr_w, pr_b = lin(f"blocks.{i}.mlp.fc2")
        params["blocks"].append({
            "ln_1": ln(f"blocks.{i}.norm1"),
            "attn": {"qkv_w": qkv_w, "qkv_b": qkv_b,
                     "out_w": out_w, "out_b": out_b},
            "ln_2": ln(f"blocks.{i}.norm2"),
            "mlp": {"fc_w": fc_w, "fc_b": fc_b,
                    "proj_w": pr_w, "proj_b": pr_b},
        })
    leftover = [k for k in sd
                if not (k.startswith("head") or k.startswith("pre_logits")
                        or k == "norm.weight" or k == "norm.bias"
                        or k.startswith("fc_norm") or k.startswith("mask_token")
                        or k.startswith("decoder") or k == "dist_token")]
    if leftover:
        raise ValueError(f"unconsumed ViT checkpoint keys: {leftover[:8]}")
    return params, cfg


def convert_effnet(sd: dict, dtype=jnp.float32):
    """timm EfficientNet state dict -> (params, EffNetConfig) for
    core/efficientnet.py:effnet_features.  Shape-driven: block counts,
    kernel sizes, expansion and channel widths all come from the
    tensors; only the per-stage stride pattern (1,2,2,2,1,2,1) is an
    architecture constant (identical across B0-B7)."""
    from mvlpt_tpu.core.efficientnet import EffNetConfig

    sd = _unwrap_cnn_state_dict(sd)
    conv, bn = _conv_bn_readers(sd, dtype)

    def se(prefix):
        rw = _np(sd.pop(f"{prefix}.conv_reduce.weight"))[:, :, 0, 0]
        ew = _np(sd.pop(f"{prefix}.conv_expand.weight"))[:, :, 0, 0]
        return {"reduce_w": jnp.asarray(rw.T, dtype),
                "reduce_b": jnp.asarray(
                    _np(sd.pop(f"{prefix}.conv_reduce.bias")), dtype),
                "expand_w": jnp.asarray(ew.T, dtype),
                "expand_b": jnp.asarray(
                    _np(sd.pop(f"{prefix}.conv_expand.bias")), dtype)}

    n_stages = 1 + max(int(m.group(1)) for k in sd
                       if (m := re.match(r"blocks\.(\d+)\.", k)))
    strides = (1, 2, 2, 2, 1, 2, 1)
    if n_stages != len(strides):
        raise ValueError(
            f"expected the 7-stage EfficientNet layout, got {n_stages}")

    params = {"conv_stem": conv("conv_stem.weight"), "bn1": bn("bn1"),
              "stages": []}
    stem_ch = params["conv_stem"].shape[-1]
    cfg_stages = []
    c_in = stem_ch
    for s_idx in range(n_stages):
        n = 1 + max(int(m.group(1)) for k in sd
                    if (m := re.match(rf"blocks\.{s_idx}\.(\d+)\.", k)))
        stage = []
        for j in range(n):
            base = f"blocks.{s_idx}.{j}"
            if f"{base}.conv_pwl.weight" in sd:  # InvertedResidual
                p = {"conv_pw": conv(f"{base}.conv_pw.weight"),
                     "bn1": bn(f"{base}.bn1"),
                     "conv_dw": conv(f"{base}.conv_dw.weight"),
                     "bn2": bn(f"{base}.bn2"),
                     "se": se(f"{base}.se"),
                     "conv_pwl": conv(f"{base}.conv_pwl.weight"),
                     "bn3": bn(f"{base}.bn3")}
                kernel = p["conv_dw"].shape[0]
                expand = p["conv_pw"].shape[-1] // c_in
                c_out = p["conv_pwl"].shape[-1]
            else:  # DepthwiseSeparableConv (stage 0)
                p = {"conv_dw": conv(f"{base}.conv_dw.weight"),
                     "bn1": bn(f"{base}.bn1"),
                     "se": se(f"{base}.se"),
                     "conv_pw": conv(f"{base}.conv_pw.weight"),
                     "bn2": bn(f"{base}.bn2")}
                kernel = p["conv_dw"].shape[0]
                expand = 1
                c_out = p["conv_pw"].shape[-1]
            stage.append(p)
            if j == 0:
                stage_spec = [n, kernel, strides[s_idx], expand, None]
            c_in = c_out
        stage_spec[4] = c_in
        cfg_stages.append(tuple(stage_spec))
        params["stages"].append(stage)
    params["conv_head"] = conv("conv_head.weight")
    params["bn2"] = bn("bn2")
    head_ch = params["conv_head"].shape[-1]

    leftover = [k for k in sd if not k.startswith("classifier.")]
    if leftover:
        raise ValueError(
            f"unconsumed EfficientNet checkpoint keys: {leftover[:8]}")
    # input resolution is not recoverable from shapes; 224 is only a
    # default for preprocessing hints (the forward is resolution-agnostic)
    return params, EffNetConfig(
        stages=tuple(cfg_stages), stem_ch=stem_ch, head_ch=head_ch)


def tv_resnet_config_from_state_dict(sd: dict) -> TVResNetConfig:
    sd = {k: v for k, v in sd.items()}
    bottleneck = "layer1.0.conv3.weight" in sd
    counts = []
    for stage in range(1, 5):
        n = 1 + max(int(m.group(1)) for k in sd
                    if (m := re.match(rf"layer{stage}\.(\d+)\.", k)))
        counts.append(n)
    width = _np(sd["conv1.weight"]).shape[0]
    return TVResNetConfig(tuple(counts), bottleneck=bottleneck, width=width)


def convert_tv_resnet(sd: dict, dtype=jnp.float32):
    """torchvision ResNet state dict -> (params, TVResNetConfig) for
    core/zoo.py:tv_resnet_features."""
    sd = _unwrap_cnn_state_dict(sd)
    cfg = tv_resnet_config_from_state_dict(sd)
    conv, bn = _conv_bn_readers(sd, dtype)

    params = {"conv1": conv("conv1.weight"), "bn1": bn("bn1"), "stages": []}
    n_convs = 3 if cfg.bottleneck else 2
    for stage_idx, n in enumerate(cfg.layers):
        stage = []
        for j in range(n):
            base = f"layer{stage_idx + 1}.{j}"
            p = {}
            for c in range(1, n_convs + 1):
                p[f"conv{c}"] = conv(f"{base}.conv{c}.weight")
                p[f"bn{c}"] = bn(f"{base}.bn{c}")
            if f"{base}.downsample.0.weight" in sd:
                p["downsample"] = {
                    "conv": conv(f"{base}.downsample.0.weight"),
                    "bn": bn(f"{base}.downsample.1"),
                }
            stage.append(p)
        params["stages"].append(stage)
    leftover = [k for k in sd if not k.startswith("fc.")]
    if leftover:
        raise ValueError(f"unconsumed ResNet checkpoint keys: {leftover[:8]}")
    return params, cfg

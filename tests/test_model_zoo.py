"""Parity tests for the non-CLIP model zoo (core/zoo.py +
checkpoint/zoo_convert.py + models/zoo.py).

torchvision and timm are not installed in this environment, so the
tests build torch reference modules IN the canonical layouts those
libraries publish (identical module/parameter naming — that naming is
the checkpoint contract the converters target) and assert the JAX
forward matches the torch forward on the converted weights.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mvlpt_tpu.checkpoint.zoo_convert import (  # noqa: E402
    convert_std_vit, convert_tv_resnet, std_vit_config_from_state_dict)
from mvlpt_tpu.core.zoo import (  # noqa: E402
    StdViTConfig, TVResNetConfig, init_std_vit_params, std_vit_features,
    tv_resnet_features)
from mvlpt_tpu.models.zoo import get_model  # noqa: E402


# ---------------------------------------------------------------------------
# torch reference modules in the canonical timm / torchvision layouts
# ---------------------------------------------------------------------------


pytestmark = pytest.mark.slow  # heavy: deselected by default, run with -m ""

class TimmAttention(nn.Module):  # timm vision_transformer.Attention layout
    def __init__(self, dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(
            B, N, 3, self.num_heads, C // self.num_heads).permute(
            2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)


class TimmMlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class TimmBlock(nn.Module):
    def __init__(self, dim, num_heads, mlp_ratio=4):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = TimmAttention(dim, num_heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = TimmMlp(dim, dim * mlp_ratio)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        x = x + self.mlp(self.norm2(x))
        return x


class TimmPatchEmbed(nn.Module):
    def __init__(self, patch, dim):
        super().__init__()
        self.proj = nn.Conv2d(3, dim, kernel_size=patch, stride=patch)

    def forward(self, x):
        return self.proj(x).flatten(2).transpose(1, 2)


class TimmViT(nn.Module):
    """timm VisionTransformer (0.4/0.5 era) forward_features layout."""

    def __init__(self, patch=8, dim=64, depth=3, num_heads=4, img=32):
        super().__init__()
        n = (img // patch) ** 2
        self.patch_embed = TimmPatchEmbed(patch, dim)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = nn.Parameter(torch.zeros(1, n + 1, dim))
        self.blocks = nn.Sequential(
            *[TimmBlock(dim, num_heads) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.head = nn.Linear(dim, 10)  # dropped by the converter
        nn.init.trunc_normal_(self.pos_embed, std=0.02)
        nn.init.trunc_normal_(self.cls_token, std=0.02)

    def forward_features(self, x):
        x = self.patch_embed(x)
        cls = self.cls_token.expand(x.shape[0], -1, -1)
        x = torch.cat((cls, x), dim=1) + self.pos_embed
        x = self.blocks(x)
        x = self.norm(x)
        return x[:, 0]


class TVBasicBlock(nn.Module):  # torchvision resnet.BasicBlock layout
    def __init__(self, cin, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = None
        if stride != 1 or cin != planes:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, planes, 1, stride, bias=False),
                nn.BatchNorm2d(planes))

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        idn = x if self.downsample is None else self.downsample(x)
        return F.relu(out + idn)


class TVBottleneck(nn.Module):  # torchvision resnet.Bottleneck (v1.5)
    def __init__(self, cin, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = None
        if stride != 1 or cin != planes * 4:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, planes * 4, 1, stride, bias=False),
                nn.BatchNorm2d(planes * 4))

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        idn = x if self.downsample is None else self.downsample(x)
        return F.relu(out + idn)


class TVResNet(nn.Module):
    """torchvision.models.resnet.ResNet naming (conv1/bn1/layer1..4/fc)."""

    def __init__(self, block, counts, width=16):
        super().__init__()
        self.width = width
        expansion = 4 if block is TVBottleneck else 1
        self.conv1 = nn.Conv2d(3, width, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        cin = width
        for i, n in enumerate(counts):
            planes = width * (2 ** i)
            blocks = []
            for j in range(n):
                stride = 2 if (i > 0 and j == 0) else 1
                blocks.append(block(cin, planes, stride))
                cin = planes * expansion
            setattr(self, f"layer{i + 1}", nn.Sequential(*blocks))
        self.fc = nn.Linear(cin, 10)  # dropped by EvalModel / converter
        self.out_dim = cin

    def forward_features(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.max_pool2d(x, 3, 2, 1)
        for i in range(4):
            x = getattr(self, f"layer{i + 1}")(x)
        return x.mean(dim=(2, 3))


def _randomize_bn_stats(model, rng):
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.from_numpy(
                rng.randn(m.num_features).astype(np.float32) * 0.1))
            m.running_var.copy_(torch.from_numpy(
                0.5 + rng.rand(m.num_features).astype(np.float32)))


# ---------------------------------------------------------------------------
# parity
# ---------------------------------------------------------------------------

def test_std_vit_torch_parity():
    torch.manual_seed(0)
    model = TimmViT(patch=8, dim=64, depth=3, num_heads=4, img=32).eval()
    x = torch.randn(4, 3, 32, 32)
    with torch.no_grad():
        ref = model.forward_features(x).numpy()

    params, cfg = convert_std_vit(model.state_dict())
    assert (cfg.patch_size, cfg.width, cfg.layers) == (8, 64, 3)
    # head count for toy width isn't in the published table; the config
    # from shapes uses the table, so override for the toy model
    cfg = StdViTConfig(patch_size=8, width=64, layers=3, heads=4,
                       input_resolution=32)
    out = std_vit_features(params, jnp.asarray(
        x.numpy().transpose(0, 2, 3, 1)), cfg)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)


def test_std_vit_config_from_shapes():
    torch.manual_seed(1)
    model = TimmViT(patch=8, dim=768, depth=2, num_heads=12, img=32)
    cfg = std_vit_config_from_state_dict(model.state_dict())
    assert cfg.heads == 12 and cfg.width == 768 and cfg.layers == 2
    assert cfg.input_resolution == 32 and cfg.pool == "cls"


def test_mae_and_mocov3_wrappers():
    torch.manual_seed(2)
    model = TimmViT(patch=8, dim=64, depth=2, num_heads=4, img=32).eval()
    sd = model.state_dict()

    # MAE: under 'model'; fine-tune layout renames norm -> fc_norm
    mae_sd = {"model": {k: v for k, v in sd.items()}}
    params, cfg = convert_std_vit(mae_sd)
    assert cfg.pool == "cls"
    mae_ft = {"model": {
        (k.replace("norm.", "fc_norm.") if k in ("norm.weight", "norm.bias")
         else k): v for k, v in sd.items()}}
    params_ft, cfg_ft = convert_std_vit(mae_ft)
    assert cfg_ft.pool == "avg"

    # MoCo-v3: under 'state_dict' with module.base_encoder. prefixes
    moco_sd = {"state_dict": {
        f"module.base_encoder.{k}": v for k, v in sd.items()}}
    params_m, cfg_m = convert_std_vit(moco_sd)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3), jnp.float32)
    toy = StdViTConfig(patch_size=8, width=64, layers=2, heads=4,
                       input_resolution=32)
    np.testing.assert_allclose(
        np.asarray(std_vit_features(params, x, toy)),
        np.asarray(std_vit_features(params_m, x, toy)), atol=1e-6)


@pytest.mark.parametrize("block,counts", [
    (TVBasicBlock, (1, 1, 1, 1)),     # resnet18-shaped
    (TVBottleneck, (1, 1, 1, 1)),     # resnet50-shaped
])
def test_tv_resnet_torch_parity(block, counts):
    torch.manual_seed(3)
    rng = np.random.RandomState(3)
    model = TVResNet(block, counts, width=16).eval()
    with torch.no_grad():
        _randomize_bn_stats(model, rng)
        x = torch.randn(2, 3, 64, 64)
        ref = model.forward_features(x).numpy()

    params, cfg = convert_tv_resnet(model.state_dict())
    assert cfg.bottleneck == (block is TVBottleneck)
    assert cfg.layers == counts and cfg.width == 16
    out = tv_resnet_features(params, jnp.asarray(
        x.numpy().transpose(0, 2, 3, 1)), cfg)
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5, rtol=1e-4)


def test_converters_reject_foreign_keys():
    torch.manual_seed(4)
    vit = TimmViT(patch=8, dim=64, depth=2, num_heads=4, img=32)
    sd = dict(vit.state_dict())
    sd["surprise.weight"] = torch.zeros(3)
    with pytest.raises(ValueError, match="unconsumed"):
        convert_std_vit(sd)

    rn = TVResNet(TVBasicBlock, (1, 1, 1, 1), width=16)
    rsd = dict(rn.state_dict())
    rsd["layer5.0.conv1.weight"] = torch.zeros(1, 1, 1, 1)
    with pytest.raises((ValueError, KeyError)):
        convert_tv_resnet(rsd)


# ---------------------------------------------------------------------------
# efficientnet (timm layout)
# ---------------------------------------------------------------------------

class TimmSqueezeExcite(nn.Module):
    def __init__(self, chs, rd):
        super().__init__()
        self.conv_reduce = nn.Conv2d(chs, rd, 1, bias=True)
        self.act1 = nn.SiLU()
        self.conv_expand = nn.Conv2d(rd, chs, 1, bias=True)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = self.conv_expand(self.act1(self.conv_reduce(s)))
        return x * s.sigmoid()


class TimmDsConv(nn.Module):  # timm DepthwiseSeparableConv naming
    def __init__(self, cin, cout, k, stride, se_rd):
        super().__init__()
        self.conv_dw = nn.Conv2d(cin, cin, k, stride, k // 2, groups=cin,
                                 bias=False)
        self.bn1 = nn.BatchNorm2d(cin)
        self.act1 = nn.SiLU()
        self.se = TimmSqueezeExcite(cin, se_rd)
        self.conv_pw = nn.Conv2d(cin, cout, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.has_residual = cin == cout and stride == 1

    def forward(self, x):
        out = self.act1(self.bn1(self.conv_dw(x)))
        out = self.se(out)
        out = self.bn2(self.conv_pw(out))
        return out + x if self.has_residual else out


class TimmIrBlock(nn.Module):  # timm InvertedResidual naming
    def __init__(self, cin, cout, k, stride, expand, se_rd):
        super().__init__()
        mid = cin * expand
        self.conv_pw = nn.Conv2d(cin, mid, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(mid)
        self.act1 = nn.SiLU()
        self.conv_dw = nn.Conv2d(mid, mid, k, stride, k // 2, groups=mid,
                                 bias=False)
        self.bn2 = nn.BatchNorm2d(mid)
        self.act2 = nn.SiLU()
        self.se = TimmSqueezeExcite(mid, se_rd)
        self.conv_pwl = nn.Conv2d(mid, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.has_residual = cin == cout and stride == 1

    def forward(self, x):
        out = self.act1(self.bn1(self.conv_pw(x)))
        out = self.act2(self.bn2(self.conv_dw(out)))
        out = self.se(out)
        out = self.bn3(self.conv_pwl(out))
        return out + x if self.has_residual else out


class TimmEffNetB0(nn.Module):
    """timm efficientnet_b0 module/key layout (native-torch variant)."""

    STAGES = ((1, 3, 1, 1, 16), (2, 3, 2, 6, 24), (2, 5, 2, 6, 40),
              (3, 3, 2, 6, 80), (3, 5, 1, 6, 112), (4, 5, 2, 6, 192),
              (1, 3, 1, 6, 320))

    def __init__(self):
        super().__init__()
        self.conv_stem = nn.Conv2d(3, 32, 3, 2, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(32)
        self.act1 = nn.SiLU()
        stages = []
        cin = 32
        for (n, k, s, t, cout) in self.STAGES:
            blocks = []
            for j in range(n):
                stride = s if j == 0 else 1
                rd = max(1, cin // 4)  # se_ratio 0.25 of block input
                if t == 1:
                    blocks.append(TimmDsConv(cin, cout, k, stride, rd))
                else:
                    blocks.append(TimmIrBlock(cin, cout, k, stride, t, rd))
                cin = cout
            stages.append(nn.Sequential(*blocks))
        self.blocks = nn.Sequential(*stages)
        self.conv_head = nn.Conv2d(cin, 1280, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(1280)
        self.act2 = nn.SiLU()
        self.classifier = nn.Linear(1280, 10)  # dropped by EvalModel

    def forward_features(self, x):
        x = self.act1(self.bn1(self.conv_stem(x)))
        x = self.blocks(x)
        x = self.act2(self.bn2(self.conv_head(x)))
        return x.mean((2, 3))


def test_effnet_torch_parity():
    torch.manual_seed(6)
    rng = np.random.RandomState(6)
    model = TimmEffNetB0().eval()
    with torch.no_grad():
        _randomize_bn_stats(model, rng)
        x = torch.randn(2, 3, 64, 64)
        ref = model.forward_features(x).numpy()

    from mvlpt_tpu.checkpoint.zoo_convert import convert_effnet
    from mvlpt_tpu.core.efficientnet import (
        EFFNET_CONFIGS, effnet_features)

    params, cfg = convert_effnet(model.state_dict())
    # shape-driven inference reproduces the published B0 table
    assert cfg.stages == EFFNET_CONFIGS["efficientnet_b0"].stages
    out = effnet_features(params, jnp.asarray(
        x.numpy().transpose(0, 2, 3, 1)), cfg)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-5, rtol=1e-4)


def test_get_model_efficientnet_random_init():
    from mvlpt_tpu.models.zoo import get_model

    z = get_model("efficientnet_b0")
    assert z.feature_dim == 1280
    feats = z.features(jnp.zeros((1, 64, 64, 3), jnp.float32))
    assert feats.shape == (1, 1280)
    assert np.isfinite(np.asarray(feats)).all()


# ---------------------------------------------------------------------------
# dispatcher
# ---------------------------------------------------------------------------

def test_get_model_dispatch_random_init():
    m = get_model("resnet18")
    assert m.feature_dim == 512
    feats = m.features(jnp.zeros((2, 224, 224, 3), jnp.float32))
    assert feats.shape == (2, 512)

    v = get_model("deit_tiny_patch16_224")
    assert v.feature_dim == 192
    feats = v.features(jnp.zeros((2, 224, 224, 3), jnp.float32))
    assert feats.shape == (2, 192)
    assert m.pixel_mean == (0.485, 0.456, 0.406)  # Imagenet, not CLIP


def test_get_model_checkpoint_roundtrip(tmp_path):
    torch.manual_seed(5)
    model = TimmViT(patch=16, dim=192, depth=2, num_heads=3, img=224).eval()
    path = tmp_path / "vit.pth"
    torch.save(model.state_dict(), str(path))
    z = get_model("vit_tiny_patch16_224", checkpoint=str(path))
    x = np.random.RandomState(0).randn(2, 224, 224, 3).astype(np.float32)
    feats = z.features(jnp.asarray(x))
    with torch.no_grad():
        ref = model.forward_features(
            torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(np.asarray(feats), ref, atol=2e-5, rtol=1e-4)


def test_get_model_reference_dead_branches_raise():
    with pytest.raises(ValueError, match="Timm feature-extraction"):
        get_model("mixnet_s")
    with pytest.raises(ValueError, match="asymmetric"):
        get_model("tf_efficientnet_b0")
    with pytest.raises(ValueError, match="never imported"):
        get_model("declip_vitb32")
    with pytest.raises(ValueError, match="never imported"):
        get_model("slip_vitb16")


def test_get_model_mocov3_accepted():
    # mocov3_ prefixes route to the standard ViT with random init when
    # the base variant is known
    z = get_model("mocov3_vit_small_patch16_224")
    assert z.feature_dim == 384

"""ModifiedResNet tower: building-block parity vs torch ops and a full
RN50-shaped forward."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from mvlpt_tpu.core import resnet as rn


def test_conv_bn_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 8, 4).astype(np.float32)
    w = rng.randn(16, 4, 3, 3).astype(np.float32)  # torch OIHW
    bn = {k: rng.rand(16).astype(np.float32) + 0.5
          for k in ("scale", "bias", "mean", "var")}

    got = rn._bn(rn._conv(jnp.asarray(x), jnp.asarray(w.transpose(2, 3, 1, 0))),
                 {k: jnp.asarray(v) for k, v in bn.items()})
    with torch.no_grad():
        t = torch.nn.functional.conv2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(w),
            padding=1)
        t = torch.nn.functional.batch_norm(
            t, torch.from_numpy(bn["mean"]), torch.from_numpy(bn["var"]),
            torch.from_numpy(bn["scale"]), torch.from_numpy(bn["bias"]),
            training=False)
    np.testing.assert_allclose(
        np.asarray(got), t.numpy().transpose(0, 2, 3, 1), rtol=2e-4, atol=2e-4)


def test_attention_pool_matches_torch_mha():
    rng = np.random.RandomState(1)
    b, s, c, out_dim, heads = 2, 9, 32, 16, 4
    x = rng.randn(b, s, c).astype(np.float32)
    pos = rng.randn(s + 1, c).astype(np.float32) * 0.1
    mats = {name: (rng.randn(c, c if name != "c_proj" else out_dim)
                   .astype(np.float32) * 0.1,
                   rng.randn(c if name != "c_proj" else out_dim)
                   .astype(np.float32) * 0.1)
            for name in ("q_proj", "k_proj", "v_proj", "c_proj")}
    params = {"pos_embedding": jnp.asarray(pos)}
    for name, (w, bias) in mats.items():
        params[name] = {"kernel": jnp.asarray(w), "bias": jnp.asarray(bias)}

    got = np.asarray(rn.attention_pool(jnp.asarray(x), params, heads))

    with torch.no_grad():
        t = torch.from_numpy(x).permute(1, 0, 2)  # (S, B, C)
        t = torch.cat([t.mean(dim=0, keepdim=True), t], dim=0)
        t = t + torch.from_numpy(pos)[:, None, :]
        out, _ = torch.nn.functional.multi_head_attention_forward(
            query=t[:1], key=t, value=t,
            embed_dim_to_check=c, num_heads=heads,
            q_proj_weight=torch.from_numpy(mats["q_proj"][0].T),
            k_proj_weight=torch.from_numpy(mats["k_proj"][0].T),
            v_proj_weight=torch.from_numpy(mats["v_proj"][0].T),
            in_proj_weight=None,
            in_proj_bias=torch.cat([
                torch.from_numpy(mats[n][1]) for n in
                ("q_proj", "k_proj", "v_proj")]),
            bias_k=None, bias_v=None, add_zero_attn=False, dropout_p=0.0,
            out_proj_weight=torch.from_numpy(mats["c_proj"][0].T),
            out_proj_bias=torch.from_numpy(mats["c_proj"][1]),
            use_separate_proj_weight=True, training=False, need_weights=False)
    np.testing.assert_allclose(got, out[0].numpy(), rtol=2e-4, atol=2e-4)


def test_rn50_shaped_forward():
    from mvlpt_tpu.core.resnet import RNConfig

    cfg = RNConfig(layers=(1, 1, 1, 1), output_dim=16, width=8,
                   input_resolution=64, heads=4)
    rng = np.random.RandomState(2)

    def conv(i, o, k):
        return {"kernel": jnp.asarray(
            rng.randn(k, k, i, o).astype(np.float32) * 0.05)}

    def bn(c):
        return {k: jnp.asarray((rng.rand(c) + 0.5).astype(np.float32))
                for k in ("scale", "bias", "mean", "var")}

    def block(inp, planes, downsample):
        p = {"conv1": conv(inp, planes, 1), "bn1": bn(planes),
             "conv2": conv(planes, planes, 3), "bn2": bn(planes),
             "conv3": conv(planes, planes * 4, 1), "bn3": bn(planes * 4)}
        if downsample:
            p["downsample"] = {"conv": conv(inp, planes * 4, 1),
                               "bn": bn(planes * 4)}
        return p

    w = cfg.width
    params = {
        "stem": {"conv1": conv(3, w // 2, 3), "bn1": bn(w // 2),
                 "conv2": conv(w // 2, w // 2, 3), "bn2": bn(w // 2),
                 "conv3": conv(w // 2, w, 3), "bn3": bn(w)},
        "layer1": [block(w, w, True)],
        "layer2": [block(4 * w, 2 * w, True)],
        "layer3": [block(8 * w, 4 * w, True)],
        "layer4": [block(16 * w, 8 * w, True)],
        "attnpool": {
            "pos_embedding": jnp.asarray(
                rng.randn(5, 32 * w).astype(np.float32) * 0.02),
            **{n: {"kernel": jnp.asarray(rng.randn(
                    32 * w, cfg.output_dim if n == "c_proj" else 32 * w)
                    .astype(np.float32) * 0.02),
                   "bias": jnp.zeros(
                    cfg.output_dim if n == "c_proj" else 32 * w)}
               for n in ("q_proj", "k_proj", "v_proj", "c_proj")},
        },
    }
    imgs = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    feats = rn.encode_image_rn(params, imgs, cfg)
    assert feats.shape == (2, 16)
    assert np.isfinite(np.asarray(feats)).all()

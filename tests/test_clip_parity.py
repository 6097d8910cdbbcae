"""Numerics parity of the JAX CLIP towers vs torch (transformers CLIPModel).

transformers' CLIPModel is weight-compatible with OpenAI CLIP (same
pre-LN blocks, QuickGELU, EOT-argmax text pooling), so agreement here in
fp32 validates the whole compute path — patch embedding, attention,
LayerNorm islands, causal masking, projections — against an independent
torch implementation without any network access (SURVEY.md §4 item 2).
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from mvlpt_tpu.checkpoint.convert import convert_hf_clip
from mvlpt_tpu.core import clip as clip_core


@pytest.fixture(scope="module")
def hf_and_jax():
    cfg = transformers.CLIPConfig(
        projection_dim=32,
        text_config=dict(
            hidden_size=64, intermediate_size=256, num_hidden_layers=3,
            num_attention_heads=4, max_position_embeddings=77,
            vocab_size=49408, hidden_act="quick_gelu",
        ),
        vision_config=dict(
            hidden_size=48, intermediate_size=192, num_hidden_layers=3,
            num_attention_heads=4, image_size=32, patch_size=8,
            hidden_act="quick_gelu",
        ),
    )
    torch.manual_seed(0)
    model = transformers.CLIPModel(cfg).eval()
    params, jcfg = convert_hf_clip(model)
    return model, params, jcfg


def test_image_tower_parity(hf_and_jax):
    model, params, jcfg = hf_and_jax
    rng = np.random.RandomState(1)
    imgs = rng.randn(4, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        want = model.get_image_features(
            pixel_values=torch.from_numpy(imgs.transpose(0, 3, 1, 2))
        ).numpy()
    got = np.asarray(clip_core.encode_image(params, jnp.asarray(imgs), jcfg))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_text_tower_parity(hf_and_jax):
    model, params, jcfg = hf_and_jax
    rng = np.random.RandomState(2)
    ids = rng.randint(1, 49405, size=(5, 12)).astype(np.int64)
    ids[:, 0] = 49406
    ids[np.arange(5), rng.randint(4, 12, size=5)] = 49407  # EOT = max id
    with torch.no_grad():
        want = model.get_text_features(input_ids=torch.from_numpy(ids)).numpy()
    got = np.asarray(clip_core.encode_text(params, jnp.asarray(ids), jcfg))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_logit_parity(hf_and_jax):
    model, params, jcfg = hf_and_jax
    rng = np.random.RandomState(3)
    imgs = rng.randn(2, 32, 32, 3).astype(np.float32)
    ids = rng.randint(1, 49405, size=(3, 10)).astype(np.int64)
    ids[:, 0] = 49406
    ids[:, -1] = 49407
    with torch.no_grad():
        out = model(
            input_ids=torch.from_numpy(ids),
            pixel_values=torch.from_numpy(imgs.transpose(0, 3, 1, 2)),
        )
        want = out.logits_per_image.numpy()
    img_f = clip_core.encode_image(params, jnp.asarray(imgs), jcfg)
    txt_f = clip_core.encode_text(params, jnp.asarray(ids), jcfg)
    got = np.asarray(clip_core.clip_logits(img_f, txt_f, params["logit_scale"]))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_remat_matches_plain(hf_and_jax):
    _, params, jcfg = hf_and_jax
    rng = np.random.RandomState(4)
    ids = rng.randint(1, 49405, size=(3, 10)).astype(np.int64)
    ids[:, 0] = 49406
    ids[:, -1] = 49407
    a = clip_core.encode_text(params, jnp.asarray(ids), jcfg)
    b = clip_core.encode_text(params, jnp.asarray(ids), jcfg, remat=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)

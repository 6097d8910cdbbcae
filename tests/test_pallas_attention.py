"""Pallas fused attention vs the XLA reference path (interpret mode on
CPU; the same kernel compiles on TPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mvlpt_tpu.core import layers


@pytest.fixture()
def qkv():
    rng = np.random.RandomState(0)
    b, h, s, d = 2, 3, 37, 16
    return tuple(jnp.asarray(rng.randn(b, h, s, d), jnp.float32)
                 for _ in range(3))


def _interp_attention():
    """The kernel auto-selects interpret mode on CPU (ops.attention)."""
    from mvlpt_tpu.ops.attention import pallas_attention

    return pallas_attention


def _xla_ref(q, k, v, mask):
    d = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * d ** -0.5, k)
    if mask is not None:
        logits = logits + mask
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def test_forward_matches_xla(qkv):
    q, k, v = qkv
    fn = _interp_attention()
    got = np.asarray(fn(q, k, v, None))
    want = np.asarray(_xla_ref(q, k, v, None))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_forward_with_causal_mask(qkv):
    q, k, v = qkv
    mask = layers.causal_mask(q.shape[2])
    fn = _interp_attention()
    got = np.asarray(fn(q, k, v, mask))
    want = np.asarray(_xla_ref(q, k, v, mask))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_gradients_match_xla(qkv):
    q, k, v = qkv
    mask = layers.causal_mask(q.shape[2])
    fn = _interp_attention()

    def loss_pallas(q, k, v):
        return jnp.sum(fn(q, k, v, mask) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(_xla_ref(q, k, v, mask) ** 2)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-5)

"""Fused Pallas attention parity vs the einsum path (interpreter on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fitclip_tpu.ops.attention import (_einsum_attention_packed, fused_attention,
                                       fused_attention_packed)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("seq,heads,dim", [(16, 1, 8), (24, 2, 16), (10, 3, 8)])
def test_fused_matches_einsum(causal, seq, heads, dim):
    rng = np.random.default_rng(0)
    width = heads * dim
    q = jnp.asarray(rng.normal(size=(6, seq, width)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(6, seq, width)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(6, seq, width)).astype(np.float32))
    scale = dim ** -0.5
    expected = _einsum_attention_packed(q, k, v, heads, scale, causal)
    actual = fused_attention_packed(q, k, v, heads, scale, causal)
    np.testing.assert_allclose(np.asarray(actual), np.asarray(expected),
                               atol=1e-5, rtol=1e-5)


def test_fused_packed_gradients_match_einsum():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(2, 8, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 8, 16)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 8, 16)).astype(np.float32))
    scale = 8 ** -0.5

    def loss_fused(q, k, v):
        return fused_attention_packed(q, k, v, 2, scale, False).sum()

    def loss_einsum(q, k, v):
        return _einsum_attention_packed(q, k, v, 2, scale, False).sum()

    grads_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    grads_einsum = jax.grad(loss_einsum, argnums=(0, 1, 2))(q, k, v)
    for gf, ge in zip(grads_fused, grads_einsum):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(ge), atol=1e-5)


def test_blhd_layout_wrapper():
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(2, 10, 4, 8)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 10, 4, 8)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 10, 4, 8)).astype(np.float32))
    out = fused_attention(q, k, v)
    assert out.shape == (2, 10, 4, 8)

    # Parity vs per-head einsum on the same layout.
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (8 ** -0.5)
    weights = jax.nn.softmax(logits, -1)
    expected = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)


def test_model_with_fused_attention_matches_einsum_model():
    from fitclip_tpu.models.clip import CLIPConfig, CLIPModel

    config = CLIPConfig.tiny_test()
    model = CLIPModel(config)
    fused_model = CLIPModel(config, fused_attention=True)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                        jnp.zeros((1, 16), jnp.int32))["params"]
    rng = np.random.default_rng(3)
    images = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    ids = jnp.asarray(rng.integers(1, 60, size=(2, 16)).astype(np.int32))

    img_a, txt_a = model.apply({"params": params}, images, ids)
    img_b, txt_b = fused_model.apply({"params": params}, images, ids)
    np.testing.assert_allclose(np.asarray(img_a), np.asarray(img_b), atol=1e-4)
    np.testing.assert_allclose(np.asarray(txt_a), np.asarray(txt_b), atol=1e-4)


def test_fused_packed_gradients_match_einsum_causal():
    """The backward kernel's causal path (text tower gradients)."""
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.normal(size=(2, 9, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 9, 16)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 9, 16)).astype(np.float32))
    scale = 8 ** -0.5

    def loss_fused(q, k, v):
        return (fused_attention_packed(q, k, v, 2, scale, True) ** 2).sum()

    def loss_einsum(q, k, v):
        return (_einsum_attention_packed(q, k, v, 2, scale, True) ** 2).sum()

    grads_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    grads_einsum = jax.grad(loss_einsum, argnums=(0, 1, 2))(q, k, v)
    for gf, ge in zip(grads_fused, grads_einsum):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(ge), atol=1e-5)


def test_backward_kernel_vmem_fallback():
    """Sequences whose packed grads exceed the VMEM budget must route the
    backward through the einsum VJP (ViT-L/14@336-class shapes) — checked by
    construction on the budget helper."""
    from fitclip_tpu.ops.attention import _bwd_vmem_bytes

    assert _bwd_vmem_bytes(577, 16, 64) > 90 * 2 ** 20   # ViT-L/14@336
    assert _bwd_vmem_bytes(257, 16, 64) <= 90 * 2 ** 20  # ViT-L/14
    assert _bwd_vmem_bytes(197, 12, 64) <= 90 * 2 ** 20  # ViT-B/16

"""Whole-layer int8 megakernel (ops/block.py + models/clip/fast_eval.py):
must match the flax QuantDense separate-op path on the same quantized params
(interpreter lowering; the real-TPU check is bench.py's int8-vs-bf16 gate).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fitclip_tpu.models.clip import CLIPConfig, CLIPModel
from fitclip_tpu.ops.quant import apply_act_scales, quantize_clip_params


@pytest.fixture(scope="module")
def quantized_setup():
    config = CLIPConfig.tiny_test()
    model = CLIPModel(config)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                        jnp.zeros((1, 16), jnp.int32))["params"]
    qparams = quantize_clip_params(params)
    rng = np.random.default_rng(9)
    images = jnp.asarray(rng.normal(size=(8, 32, 32, 3)).astype(np.float32))
    ids = jnp.asarray(rng.integers(1, 60, size=(8, 16)).astype(np.int32))
    dyn = CLIPModel(config, quantized="dynamic")
    _, s_img = dyn.apply({"params": qparams}, images,
                         method=CLIPModel.encode_image, mutable=["intermediates"])
    _, s_txt = dyn.apply({"params": qparams}, ids,
                         method=CLIPModel.encode_text, mutable=["intermediates"])
    inter = dict(s_img["intermediates"])
    inter.update(dict(s_txt["intermediates"]))
    qparams = apply_act_scales(qparams, inter)
    return config, model, params, qparams


def _cosine(a, b):
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    return (a * b).sum(-1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))


def test_megakernel_matches_separate_op_path(quantized_setup):
    from fitclip_tpu.models.clip.fast_eval import (encode_frames_int8,
                                                   encode_text_int8)

    config, model, params, qparams = quantized_setup
    qmodel = CLIPModel(config, quantized=True)
    rng = np.random.default_rng(3)
    images = jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32))
    ids = jnp.asarray(rng.integers(1, 60, size=(4, 16)).astype(np.int32))

    img_ref, txt_ref = qmodel.apply({"params": qparams}, images, ids)
    img_fast = encode_frames_int8(qparams, images, config, dtype=jnp.float32)
    txt_fast = encode_text_int8(qparams, ids, config, dtype=jnp.float32)

    np.testing.assert_allclose(np.asarray(img_fast, np.float32),
                               np.asarray(img_ref, np.float32),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(txt_fast, np.float32),
                               np.asarray(txt_ref, np.float32),
                               atol=2e-3, rtol=2e-3)

    # And the float-model cosine gate holds through the megakernel too.
    img_f, txt_f = model.apply({"params": params}, images, ids)
    assert _cosine(img_f, img_fast).min() >= 0.999
    assert _cosine(txt_f, txt_fast).min() >= 0.999


def test_float_megakernel_matches_flax(quantized_setup):
    """The bf16/float whole-layer kernel (fused_bf16_layer) on the PLAIN float
    param tree must match the flax float model."""
    from fitclip_tpu.models.clip.fast_eval import (encode_frames_fast,
                                                   encode_text_fast)

    config, model, params, _ = quantized_setup
    rng = np.random.default_rng(7)
    images = jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32))
    ids = jnp.asarray(rng.integers(1, 60, size=(4, 16)).astype(np.int32))

    img_ref, txt_ref = model.apply({"params": params}, images, ids)
    img_fast = encode_frames_fast(params, images, config, dtype=jnp.float32)
    txt_fast = encode_text_fast(params, ids, config, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(img_fast, np.float32),
                               np.asarray(img_ref, np.float32),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(txt_fast, np.float32),
                               np.asarray(txt_ref, np.float32),
                               atol=2e-4, rtol=2e-4)


def test_float_fused_block_encoder_refused_for_training():
    """fused_block encoders have no gradient path; the train runner says so."""
    from fitclip_tpu.cli.train_runner import run_train
    from fitclip_tpu.models.clip.encoder import ClipVideoTextEncoder

    encoder = ClipVideoTextEncoder(CLIPConfig.tiny_test(), fused_block=True)

    class Loaded:
        pass

    loaded = Loaded()
    loaded.encoder = encoder
    loaded.params = {}
    with pytest.raises(ValueError, match="fused_block"):
        run_train(loaded, data_module=None, model_cfg={}, trainer_cfg={},
                  optimizer_cfg={})


def test_megakernel_block_rows_divisor(quantized_setup):
    """block_rows that does not divide the batch falls back to a divisor."""
    from fitclip_tpu.models.clip.fast_eval import encode_frames_int8

    config, _, _, qparams = quantized_setup
    rng = np.random.default_rng(4)
    images = jnp.asarray(rng.normal(size=(3, 32, 32, 3)).astype(np.float32))
    out1 = encode_frames_int8(qparams, images, config, dtype=jnp.float32,
                              block_rows=2)
    out3 = encode_frames_int8(qparams, images, config, dtype=jnp.float32,
                              block_rows=3)
    np.testing.assert_allclose(np.asarray(out1, np.float32),
                               np.asarray(out3, np.float32), atol=2e-5)


def test_lane_padded_sequence_matches_unpadded(quantized_setup):
    """Round-4 ViT-L/336 lever (VERDICT r3 #5): pad_seq appends masked dead
    rows so odd L avoids Mosaic's (L, L) tile-padding worst case. The padded
    forward must reproduce the unpadded embeddings — dead rows are excluded
    as attention keys and row 0 (CLS) never reads them."""
    from fitclip_tpu.models.clip.fast_eval import encode_frames_int8

    config, model, params, qparams = quantized_setup
    rng = np.random.default_rng(11)
    images = jnp.asarray(rng.normal(size=(3, 32, 32, 3)).astype(np.float32))

    base = encode_frames_int8(qparams, images, config, dtype=jnp.float32)
    padded = encode_frames_int8(qparams, images, config, dtype=jnp.float32,
                                pad_seq=96)
    np.testing.assert_allclose(np.asarray(padded, np.float32),
                               np.asarray(base, np.float32),
                               atol=2e-5, rtol=2e-5)

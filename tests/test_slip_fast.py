"""SLIP whole-layer megakernel path (models/slip_fast.py): must match the
flax SlipModel on the same params — float kernel vs the plain model, int8
kernel vs the QuantDense separate-op path (interpreter lowering on CPU; the
real-TPU check is scripts/bench_families.py's int8-vs-bf16 cosine gate)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fitclip_tpu.models.slip import SlipConfig, SlipModel, SlipVideoTextEncoder
from fitclip_tpu.ops.quant import apply_act_scales, quantize_clip_params


@pytest.fixture(scope="module")
def slip_setup():
    config = SlipConfig.tiny_test()
    model = SlipModel(config)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, config.image_size, config.image_size, 3)),
                        jnp.zeros((1, config.text.context_length), jnp.int32))["params"]
    qparams = quantize_clip_params(params)
    rng = np.random.default_rng(9)
    images = jnp.asarray(rng.normal(
        size=(8, config.image_size, config.image_size, 3)).astype(np.float32))
    ids = jnp.asarray(rng.integers(
        1, 60, size=(8, config.text.context_length)).astype(np.int32))
    dyn = SlipModel(config, quantized="dynamic")
    _, s_img = dyn.apply({"params": qparams}, images,
                         method=SlipModel.encode_image, mutable=["intermediates"])
    _, s_txt = dyn.apply({"params": qparams}, ids,
                         method=SlipModel.encode_text, mutable=["intermediates"])
    inter = dict(s_img["intermediates"])
    inter.update(dict(s_txt["intermediates"]))
    qparams = apply_act_scales(qparams, inter)
    return config, model, params, qparams, images, ids


def _cosine(a, b):
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    return (a * b).sum(-1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))


def test_float_megakernel_matches_flax(slip_setup):
    from fitclip_tpu.models.slip_fast import encode_frames_fast, encode_text_fast

    config, model, params, _, images, ids = slip_setup
    img_ref = model.apply({"params": params}, images, method=SlipModel.encode_image)
    txt_ref = model.apply({"params": params}, ids, method=SlipModel.encode_text)
    img_fast = encode_frames_fast(params, images, config, dtype=jnp.float32)
    txt_fast = encode_text_fast(params, ids, config, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(img_fast), np.asarray(img_ref),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(txt_fast), np.asarray(txt_ref),
                               atol=2e-5, rtol=2e-5)


def test_int8_megakernel_matches_separate_op_path(slip_setup):
    from fitclip_tpu.models.slip_fast import encode_frames_fast, encode_text_fast

    config, _, _, qparams, images, ids = slip_setup
    qmodel = SlipModel(config, quantized=True)
    img_ref = qmodel.apply({"params": qparams}, images, method=SlipModel.encode_image)
    txt_ref = qmodel.apply({"params": qparams}, ids, method=SlipModel.encode_text)
    img_fast = encode_frames_fast(qparams, images, config, dtype=jnp.float32)
    txt_fast = encode_text_fast(qparams, ids, config, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(img_fast, np.float32),
                               np.asarray(img_ref, np.float32),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(txt_fast, np.float32),
                               np.asarray(txt_ref, np.float32),
                               atol=2e-3, rtol=2e-3)


def test_int8_cosine_gate_vs_float(slip_setup):
    from fitclip_tpu.models.slip_fast import encode_frames_fast, encode_text_fast

    config, model, params, qparams, images, ids = slip_setup
    img_ref = model.apply({"params": params}, images, method=SlipModel.encode_image)
    txt_ref = model.apply({"params": params}, ids, method=SlipModel.encode_text)
    img_q = encode_frames_fast(qparams, images, config, dtype=jnp.float32)
    txt_q = encode_text_fast(qparams, ids, config, dtype=jnp.float32)
    assert _cosine(img_q, img_ref).min() > 0.99
    assert _cosine(txt_q, txt_ref).min() > 0.99


def test_quantized_encoder_fast_dispatch(slip_setup):
    """Encoder-level: quantized + fused_block SlipVideoTextEncoder must match
    the separate-op QuantDense encoder on the same calibrated tree, and the
    calibration protocol (collect_act_amax/calibrate) must round-trip."""
    config, _, _, qparams, images, ids = slip_setup
    fast_enc = SlipVideoTextEncoder(config, num_frames=2, dtype=jnp.float32,
                                    quantized=True, fused_block=True)
    slow_enc = SlipVideoTextEncoder(config, num_frames=2, dtype=jnp.float32,
                                    quantized=True, fused_block=False)
    video = jnp.reshape(images, (4, 2) + images.shape[1:])
    v_fast = fast_enc.encode_video(qparams, video)
    v_slow = slow_enc.encode_video(qparams, video)
    t_fast = fast_enc.encode_text(qparams, ids)
    t_slow = slow_enc.encode_text(qparams, ids)
    np.testing.assert_allclose(np.asarray(v_fast, np.float32),
                               np.asarray(v_slow, np.float32),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(t_fast, np.float32),
                               np.asarray(t_slow, np.float32),
                               atol=2e-3, rtol=2e-3)

    # calibrate() on a fresh quantized init writes real (non-one) scales.
    fresh = fast_enc.init_params(jax.random.PRNGKey(1))
    calibrated = fast_enc.calibrate(fresh, video, ids)
    leaves_before = jax.tree_util.tree_leaves(
        [n["act_scale"] for _, n in _act_nodes(fresh)])
    leaves_after = jax.tree_util.tree_leaves(
        [n["act_scale"] for _, n in _act_nodes(calibrated)])
    assert any(not np.allclose(a, b)
               for a, b in zip(leaves_before, leaves_after))


def _act_nodes(params, prefix=""):
    for key, value in params.items():
        if isinstance(value, dict):
            if "act_scale" in value:
                yield prefix + key, value
            else:
                yield from _act_nodes(value, prefix + key + "/")


def test_cli_evaluate_slip_int8(tmp_path, capsys, monkeypatch):
    """encoder.dtype=int8 on the SLIP family through the real CLI: loads,
    multi-batch-calibrates, runs the megakernel eval path, and produces sane
    retrieval metrics."""
    import json as json_module

    from fitclip_tpu.cli.main import DEFAULT_CONFIG_DIR, run
    from fitclip_tpu.config_engine import compose
    from fitclip_tpu.models.clip.tokenizer import write_tiny_test_vocab

    from tests.test_datasets import _write_video

    root = tmp_path / "msrvtt"
    videos = root / "videos" / "all"
    for i in range(4):
        _write_video(str(videos / f"video{i}.avi"))
    (root / "structured-symlinks").mkdir(parents=True)
    (root / "structured-symlinks" / "val_list_jsfusion.txt").write_text(
        "\n".join(f"video{i}" for i in range(4)))
    (root / "structured-symlinks" / "train_list_jsfusion.txt").write_text("video0\n")
    (root / "annotation").mkdir()
    (root / "annotation" / "MSR_VTT.json").write_text(json_module.dumps({
        "annotations": [{"image_id": f"video{i}", "caption": f"a cat video {i}"}
                        for i in range(4)]}))
    merges, _ = write_tiny_test_vocab(str(tmp_path), ["a", "cat", "video"] * 3)
    monkeypatch.setenv("MSRVTT_PATH", str(root))
    monkeypatch.setenv("FITCLIP_BPE_PATH", merges)

    cfg = compose(DEFAULT_CONFIG_DIR, "trainer",
                  ["command=evaluate", "encoder=slip", "++encoder.model=SLIP_VITB16",
                   "data=msrvtt", "++encoder.dtype=int8",
                   "data.eval_batch_size=2", "+data.num_threads=2",
                   "++quant.calibration_batches=2"])
    run(cfg)
    printed = capsys.readouterr().out
    metrics = json_module.loads(printed[printed.index("{"):])
    assert set(metrics) == {"r1", "r5", "r10", "mr"}
    assert 1 <= metrics["mr"] <= 4

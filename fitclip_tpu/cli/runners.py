"""Command runners: the device-loop side of each CLI command.

Each runner owns one jitted step + a host loop over a data loader, with
batches padded to mesh divisibility and sharded on the leading axis over
"data". Metrics come back as plain dicts, suffixed per dataset for grouped
eval (text_video_retrieval.py:30-37 naming: r1_{dataset} etc.).
"""

import logging
from typing import Any, Dict, List, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fitclip_tpu.evaluation.classification import (ClassificationEvaluator,
                                                   encode_label_bank,
                                                   tokenize_label_bank)
from fitclip_tpu.evaluation.retrieval import RetrievalEvaluator
from fitclip_tpu.models.clip.load import LoadedEncoder
from fitclip_tpu.parallel import create_mesh, replicated, sharded_along
from fitclip_tpu.parallel.mesh import pad_batch_to_divisible

LOGGER = logging.getLogger(__name__)

DEVICE_KEY_PREFIXES = ("video", "text", "label")


def split_device_batch(batch: Mapping[str, Any]):
    """Separate array keys bound for the device from host-side metadata."""
    device = {k: v for k, v in batch.items()
              if k.split("_")[0] in ("video", "text", "label") and
              isinstance(v, np.ndarray)}
    host = {k: v for k, v in batch.items() if k not in device}
    return device, host


def shard_eval_batch(device_batch, mesh):
    num = mesh.devices.size
    padded, valid = pad_batch_to_divisible(device_batch, num)
    sharding = sharded_along(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), padded), valid


def _loaders_with_names(data_module, split: str = "val") -> List:
    loaders = (data_module.test_dataloader() if split == "test"
               else data_module.val_dataloader())
    if isinstance(loaders, list):
        names = getattr(data_module, "names", [str(i) for i in range(len(loaders))])
        return list(zip(names, loaders))
    return [(None, loaders)]


def _shard_mapped(step, encoder, mesh, num_batch_args: int):
    """Partition an encode step over the data mesh axis explicitly when the
    encoder runs Pallas megakernels (fused_block): GSPMD cannot partition a
    pallas_call, so under plain jit it all-gathers the batch and runs the
    FULL kernel on every device (verified in HLO). shard_map runs the kernel
    on each device's shard instead. Params replicate; batch args shard on
    the leading axis (runners pad batches to mesh divisibility)."""
    if not getattr(encoder, "fused_block", False) or mesh.devices.size == 1:
        return step
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:
        from jax.experimental.shard_map import shard_map
    kwargs = dict(mesh=mesh,
                  in_specs=(P(),) + (P("data"),) * num_batch_args,
                  out_specs=P("data"))
    try:
        # check_vma=False: pallas_call out_shapes carry no varying-mesh-axes
        # annotation, which the default check rejects.
        return shard_map(step, check_vma=False, **kwargs)
    except TypeError:
        # jax ~0.6-0.7 exposes jax.shard_map but still spells it check_rep.
        return shard_map(step, check_rep=False, **kwargs)


def _maybe_calibrate(encoder, params, video, text=None):
    """int8 encoders get their activation scales calibrated on the first REAL
    eval batch (post-training quantization on the true data distribution)."""
    if getattr(encoder, "quantized", False) and hasattr(encoder, "calibrate"):
        LOGGER.info("Calibrating int8 activation scales on the first batch")
        return encoder.calibrate(params, video, text)
    return params


def run_retrieval_eval(loaded: LoadedEncoder, data_module,
                       mesh=None, split: str = "val") -> Dict[str, float]:
    """Zero-shot text->video retrieval (command=evaluate/validate/test;
    command=test routes to the test split, reference __main__.py:64-69)."""
    mesh = mesh or create_mesh()
    encoder = loaded.encoder
    params = jax.device_put(loaded.params, replicated(mesh))

    def _eval_step(params, video, text):
        v = encoder.encode_video(params, video).astype(jnp.float32)
        t = encoder.encode_text(params, text).astype(jnp.float32)
        return v, t

    eval_step = jax.jit(_shard_mapped(_eval_step, encoder, mesh, 2))

    results: Dict[str, float] = {}
    calibrated = not getattr(encoder, "quantized", False)
    for name, loader in _loaders_with_names(data_module, split):
        evaluator = RetrievalEvaluator()
        for batch in loader:
            device_batch, _ = split_device_batch(batch)
            sharded, valid = shard_eval_batch(device_batch, mesh)
            # Dual-preprocessed (teacher-student) batches: evaluate the
            # student view (reference validates on the student tower,
            # teacher_student.py:142-173).
            video = sharded.get("video", sharded.get("video_student"))
            text = sharded.get("text", sharded.get("text_student"))
            if not calibrated:
                params = jax.device_put(_maybe_calibrate(encoder, params, video, text),
                                        replicated(mesh))
                calibrated = True
            v, t = eval_step(params, video, text)
            evaluator.update(v, t, valid=valid)
        metrics = evaluator.compute()
        suffix = f"_{name}" if name else ""
        results.update({f"{key}{suffix}": value for key, value in metrics.items()})
    return results


def run_classification_eval(loaded: LoadedEncoder, data_module, mesh=None,
                            per_class: bool = False,
                            split: str = "val") -> Dict[str, float]:
    """Zero-shot classification (video_text_classification.py semantics)."""
    mesh = mesh or create_mesh()
    encoder = loaded.encoder
    params = jax.device_put(loaded.params, replicated(mesh))

    categories = data_module.categories
    labels = [name for name, _ in sorted(categories.items(), key=lambda kv: kv[1])]
    templates = data_module.templates
    tokenized = tokenize_label_bank(encoder, labels, templates)

    loader = (data_module.test_dataloader() if split == "test"
              else data_module.val_dataloader())
    batches = iter(loader)
    first = next(batches, None)
    if first is not None and getattr(encoder, "quantized", False):
        first_video, _ = split_device_batch(first)
        params = jax.device_put(
            _maybe_calibrate(encoder, params, jnp.asarray(first_video["video"]),
                             jnp.asarray(tokenized[:32])), replicated(mesh))

    label_bank = encode_label_bank(encoder, params, tokenized, num_labels=len(labels))

    encode_video = jax.jit(_shard_mapped(
        lambda params, video: encoder.encode_video(params, video).astype(jnp.float32),
        encoder, mesh, 1))

    evaluator = ClassificationEvaluator(label_bank=label_bank, per_class=per_class)
    import itertools

    for batch in itertools.chain([first] if first is not None else [], batches):
        device_batch, _ = split_device_batch(batch)
        sharded, valid = shard_eval_batch(device_batch, mesh)
        v = encode_video(params, sharded["video"])
        evaluator.update(v, np.asarray(sharded["label"]), valid=valid)
    return evaluator.compute()


def run_predict(loaded: LoadedEncoder, data_module, mesh=None,
                output_path: str = "predictions.pt") -> Dict[str, Any]:
    """command=predict: dump embeddings + video ids (reference saves
    predictions.pt via torch.save, __main__.py:80-91). Classification data
    modules get the argmax-prediction variant
    (video_text_classification.py:135-140)."""
    from fitclip_tpu.data.data_module import VideoClassificationDataModule

    if isinstance(data_module, VideoClassificationDataModule):
        return _run_predict_classification(loaded, data_module, mesh, output_path)
    mesh = mesh or create_mesh()
    encoder = loaded.encoder
    params = jax.device_put(loaded.params, replicated(mesh))

    eval_step = jax.jit(_shard_mapped(
        lambda params, video, text: (
            encoder.encode_video(params, video).astype(jnp.float32),
            encoder.encode_text(params, text).astype(jnp.float32)),
        encoder, mesh, 2))

    encoded_videos, encoded_texts, video_ids = [], [], []
    loaders = data_module.predict_dataloader()
    if not isinstance(loaders, list):
        loaders = [loaders]
    for loader in loaders:
        for batch in loader:
            device_batch, host = split_device_batch(batch)
            sharded, valid = shard_eval_batch(device_batch, mesh)
            v, t = eval_step(params, sharded["video"], sharded["text"])
            encoded_videos.append(np.asarray(v)[:valid])
            encoded_texts.append(np.asarray(t)[:valid])
            video_ids.extend(host.get("video_id", []))

    predictions = {
        "encoded_videos": np.concatenate(encoded_videos),
        "encoded_texts": np.concatenate(encoded_texts),
        "video_ids": video_ids,
    }
    return _save_predictions(predictions, output_path)


def _run_predict_classification(loaded, data_module, mesh, output_path):
    mesh = mesh or create_mesh()
    encoder = loaded.encoder
    params = jax.device_put(loaded.params, replicated(mesh))
    categories = data_module.categories
    labels = [name for name, _ in sorted(categories.items(), key=lambda kv: kv[1])]
    tokenized = tokenize_label_bank(encoder, labels, data_module.templates)
    label_bank = encode_label_bank(encoder, params, tokenized, num_labels=len(labels))

    def _predict_step(params, video):
        emb = encoder.encode_video(params, video).astype(jnp.float32)
        scores = jnp.matmul(emb, label_bank.astype(jnp.float32).T)
        return jnp.argmax(scores, axis=-1)

    predict_step = jax.jit(_shard_mapped(_predict_step, encoder, mesh, 1))

    predictions_list, labels_list, video_ids = [], [], []
    loaders = data_module.predict_dataloader()
    if not isinstance(loaders, list):
        loaders = [loaders]
    for loader in loaders:
        for batch in loader:
            device_batch, host = split_device_batch(batch)
            sharded, valid = shard_eval_batch(device_batch, mesh)
            predicted = np.asarray(predict_step(params, sharded["video"]))[:valid]
            predictions_list.append(predicted)
            labels_list.append(np.asarray(batch["label"])[:valid])
            video_ids.extend(host.get("video_id", []))

    predictions = {
        "predictions": np.concatenate(predictions_list),
        "labels": np.concatenate(labels_list),
        "video_ids": video_ids,
    }
    return _save_predictions(predictions, output_path)


def _save_predictions(predictions, output_path):
    if output_path:
        try:
            import torch

            torch.save({k: torch.from_numpy(v) if isinstance(v, np.ndarray) else v
                        for k, v in predictions.items()}, output_path)
        except ImportError:
            np.savez(output_path.replace(".pt", ".npz"), **{
                k: v for k, v in predictions.items() if isinstance(v, np.ndarray)})
        LOGGER.info("Saved predictions to %s", output_path)
    return predictions

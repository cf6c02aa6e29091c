"""CLIP's ModifiedResNet vision tower (RN50/RN101/RN50x4/x16/x64) in Flax.

Same math as OpenAI CLIP's ResNet: 3-conv anti-aliased stem (stride-2 conv +
BN + ReLU x3, then avgpool-2), Bottleneck blocks whose strided convs are
replaced by conv + avgpool (and avgpool + 1x1 in the shortcut), and a final
QKV attention pool over spatial positions with a mean-token query.

Channels-last NHWC (TPU-native conv layout). BatchNorm runs in inference mode
(folded frozen statistics) for evaluation, and in train mode (live batch
statistics, torch semantics) when the tower is built with ``train=True``:
the forward normalizes with the biased batch variance and backprops through
the batch statistics exactly like ``torch.nn.BatchNorm2d.train()``, while the
EMA-updated running stats are sown into a mutable ``bn_stats`` collection for
the train step to merge back into the parameter tree (running stats stay in
``params`` so the same converted checkpoints load either way; the optimizer
freezes them by regex — see cli/train_runner.py).
"""

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

PRECISION = jax.lax.Precision.HIGHEST


class BatchNorm(nn.Module):
    """CLIP-ResNet BatchNorm. ``use_batch_stats=False`` is the inference form
    (affine fold of frozen running stats). ``use_batch_stats=True`` matches
    torch train-mode BN: normalize with (biased) batch statistics computed in
    fp32 over (B, H, W), and sow the momentum-EMA running stats (unbiased
    variance, torch convention) into the "bn_stats" collection."""
    features: int
    eps: float = 1e-5
    use_batch_stats: bool = False
    momentum: float = 0.1

    @nn.compact
    def __call__(self, x):
        scale = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("running_mean", nn.initializers.zeros, (self.features,))
        var = self.param("running_var", nn.initializers.ones, (self.features,))
        if not self.use_batch_stats:
            # Affine fold computed in fp32 (params are fp32); the result is
            # cast back to the stream dtype so a bf16 tower stays bf16 —
            # XLA keeps the fp32 intermediate inside the fusion, only the
            # HBM write narrows.
            inv = jax.lax.rsqrt(var + self.eps) * scale
            return (x * inv + (bias - mean * inv)).astype(x.dtype)

        reduce_axes = tuple(range(x.ndim - 1))
        x32 = x.astype(jnp.float32)
        batch_mean = x32.mean(axis=reduce_axes)
        batch_var = jnp.square(x32 - batch_mean).mean(axis=reduce_axes)
        count = x32.size // x32.shape[-1]
        unbiased = batch_var * (count / max(count - 1, 1))
        self.sow("bn_stats", "mean",
                 jax.lax.stop_gradient((1 - self.momentum) * mean
                                       + self.momentum * batch_mean))
        self.sow("bn_stats", "var",
                 jax.lax.stop_gradient((1 - self.momentum) * var
                                       + self.momentum * unbiased))
        inv = jax.lax.rsqrt(batch_var + self.eps) * scale
        return (x32 * inv + (bias - batch_mean * inv)).astype(x.dtype)


# Backwards-compatible alias (inference configuration).
BatchNormInference = BatchNorm


def _conv(features, kernel, stride=1, name=None, padding=0, dtype=None):
    # dtype is the COMPUTE dtype (params stay fp32): bf16 runs the conv
    # native-rate on the MXU where fp32 HIGHEST is multi-pass emulated on
    # v5e. PRECISION is a no-op for bf16 operands.
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=[(padding, padding)] * 2, use_bias=False,
                   precision=PRECISION, dtype=dtype, name=name)


def _avg_pool(x, window):
    return nn.avg_pool(x, (window, window), strides=(window, window))


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        def bn(features, name):
            return BatchNorm(features, use_batch_stats=self.train, name=name)

        def conv(features, kernel, name, padding=0):
            return _conv(features, kernel, name=name, padding=padding,
                         dtype=self.dtype)

        identity = x
        out = nn.relu(bn(self.planes, "bn1")(
            conv(self.planes, 1, "conv1")(x)))
        out = nn.relu(bn(self.planes, "bn2")(
            conv(self.planes, 3, "conv2", padding=1)(out)))
        if self.stride > 1:
            out = _avg_pool(out, self.stride)
        out = bn(self.planes * 4, "bn3")(
            conv(self.planes * 4, 1, "conv3")(out))
        if self.stride > 1 or x.shape[-1] != self.planes * 4:
            if self.stride > 1:
                identity = _avg_pool(identity, self.stride)
            identity = bn(self.planes * 4, "downsample_bn")(
                conv(self.planes * 4, 1, "downsample_conv")(identity))
        return nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    embed_dim: int
    num_heads: int
    output_dim: int
    spacial_dim: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        """(B, H, W, C) -> (B, output_dim)."""
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        tokens = jnp.concatenate([tokens.mean(axis=1, keepdims=True), tokens], axis=1)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(c ** -0.5),
                         (self.spacial_dim ** 2 + 1, c))
        tokens = tokens + pos[: tokens.shape[1]].astype(tokens.dtype)

        q = nn.Dense(self.embed_dim, precision=PRECISION, dtype=self.dtype,
                     name="q_proj")(tokens[:, :1])
        k = nn.Dense(self.embed_dim, precision=PRECISION, dtype=self.dtype,
                     name="k_proj")(tokens)
        v = nn.Dense(self.embed_dim, precision=PRECISION, dtype=self.dtype,
                     name="v_proj")(tokens)
        head_dim = self.embed_dim // self.num_heads

        def heads(t):
            return t.reshape(*t.shape[:-1], self.num_heads, head_dim)

        q, k, v = heads(q), heads(k), heads(v)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, precision=PRECISION,
                            preferred_element_type=jnp.float32) / (head_dim ** 0.5)
        weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v, precision=PRECISION)
        out = out.reshape(b, 1, self.embed_dim)[:, 0]
        return nn.Dense(self.output_dim, precision=PRECISION, dtype=self.dtype,
                        name="c_proj")(out)


@dataclasses.dataclass(frozen=True)
class ModifiedResNetConfig:
    layers: Tuple[int, int, int, int] = (3, 4, 6, 3)
    width: int = 64
    output_dim: int = 1024
    input_resolution: int = 224
    heads: int = 32  # vision_width * 32 // 64


class ModifiedResNet(nn.Module):
    config: ModifiedResNetConfig
    train: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, 3) normalized -> (B, output_dim)."""
        cfg = self.config
        w = cfg.width
        x = images if self.dtype is None else images.astype(self.dtype)

        def bn(features, name):
            return BatchNorm(features, use_batch_stats=self.train, name=name)

        x = nn.relu(bn(w // 2, "bn1")(
            _conv(w // 2, 3, stride=2, padding=1, name="conv1",
                  dtype=self.dtype)(x)))
        x = nn.relu(bn(w // 2, "bn2")(
            _conv(w // 2, 3, padding=1, name="conv2", dtype=self.dtype)(x)))
        x = nn.relu(bn(w, "bn3")(
            _conv(w, 3, padding=1, name="conv3", dtype=self.dtype)(x)))
        x = _avg_pool(x, 2)

        for stage, (count, planes, stride) in enumerate(zip(
                cfg.layers, (w, w * 2, w * 4, w * 8), (1, 2, 2, 2)), start=1):
            for block in range(count):
                x = Bottleneck(planes, stride if block == 0 else 1,
                               train=self.train, dtype=self.dtype,
                               name=f"layer{stage}_{block}")(x)

        spacial = cfg.input_resolution // 32
        return AttentionPool2d(embed_dim=x.shape[-1], num_heads=cfg.heads,
                               output_dim=cfg.output_dim, spacial_dim=spacial,
                               dtype=self.dtype, name="attnpool")(x)


def resnet_params_from_torch(sd, prefix: str = "visual.") -> dict:
    """OpenAI-schema ModifiedResNet weights -> this module's tree."""
    import numpy as np

    out: dict = {}

    def conv(name):
        return {"kernel": np.asarray(sd[f"{prefix}{name}.weight"]).transpose(2, 3, 1, 0)}

    def bn(name):
        return {"weight": np.asarray(sd[f"{prefix}{name}.weight"]),
                "bias": np.asarray(sd[f"{prefix}{name}.bias"]),
                "running_mean": np.asarray(sd[f"{prefix}{name}.running_mean"]),
                "running_var": np.asarray(sd[f"{prefix}{name}.running_var"])}

    for i in (1, 2, 3):
        out[f"conv{i}"] = conv(f"conv{i}")
        out[f"bn{i}"] = bn(f"bn{i}")

    stage = 1
    while f"{prefix}layer{stage}.0.conv1.weight" in sd:
        block = 0
        while f"{prefix}layer{stage}.{block}.conv1.weight" in sd:
            p = f"layer{stage}.{block}"
            node = {f"conv{j}": conv(f"{p}.conv{j}") for j in (1, 2, 3)}
            node.update({f"bn{j}": bn(f"{p}.bn{j}") for j in (1, 2, 3)})
            if f"{prefix}{p}.downsample.0.weight" in sd:
                node["downsample_conv"] = conv(f"{p}.downsample.0")
                node["downsample_bn"] = bn(f"{p}.downsample.1")
            out[f"layer{stage}_{block}"] = node
            block += 1
        stage += 1

    def linear(name):
        return {"kernel": np.asarray(sd[f"{prefix}attnpool.{name}.weight"]).T,
                "bias": np.asarray(sd[f"{prefix}attnpool.{name}.bias"])}

    out["attnpool"] = {
        "positional_embedding": np.asarray(sd[f"{prefix}attnpool.positional_embedding"]),
        "q_proj": linear("q_proj"),
        "k_proj": linear("k_proj"),
        "v_proj": linear("v_proj"),
        "c_proj": linear("c_proj"),
    }
    return out

"""SLIP encoder family (facebookresearch/SLIP's CLIP/SLIP variants) in Flax.

Reference: the vendored slip.py (aligner/encoder/slip.py:399-544,566-637) and
its wrapper (slip_video_text_encoder.py). Architecture = timm-style ViT vision
tower (patch conv with bias, cls token, pos embed including cls, LN eps 1e-6,
exact GELU, final norm, CLS pooling) + a CLIP-style causal text transformer
(QuickGELU, LN eps 1e-5) + separate image/text projection matrices. The SSL
(SimCLR) heads of SLIP checkpoints are dropped: they don't participate in
encode_image/encode_text.

Tokenizer: SLIP's SimpleTokenizer is the same byte-BPE as CLIP's — reuse
ClipTokenizer. Preprocessing: imagenet normalization, bilinear resize, 224
center crop, eval only (the reference raises on train transforms).
"""

import dataclasses
from typing import Iterator, Mapping, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fitclip_tpu.data.frame_sampler import UniformFrameSampler
from fitclip_tpu.models.api import PreprocessSpec, VideoTextEncoder
from fitclip_tpu.models.clip.encoder import l2_normalize
from fitclip_tpu.models.clip.model import (LayerNormFp32, PRECISION, TextConfig,
                                           Transformer)

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class SlipConfig:
    embed_dim: int = 512
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    image_size: int = 224
    patch_size: int = 16
    text: TextConfig = TextConfig()

    @staticmethod
    def vit_s16() -> "SlipConfig":
        return SlipConfig(vision_width=384, vision_heads=12)

    @staticmethod
    def vit_b16() -> "SlipConfig":
        return SlipConfig()

    @staticmethod
    def vit_l16() -> "SlipConfig":
        return SlipConfig(vision_width=1024, vision_layers=24, vision_heads=16)

    @staticmethod
    def tiny_test(vocab_size: int = 64) -> "SlipConfig":
        return SlipConfig(embed_dim=32, vision_width=48, vision_layers=2,
                          vision_heads=4, image_size=32, patch_size=16,
                          text=TextConfig(context_length=16, vocab_size=vocab_size,
                                          width=32, layers=2, heads=4))


class TimmViT(nn.Module):
    """timm vision_transformer semantics: returns the normed CLS token."""
    width: int
    layers: int
    heads: int
    patch_size: int
    image_size: int
    dtype: object = jnp.float32
    fused_attention: bool = False
    quantized: bool = False

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        b = images.shape[0]
        g, p = self.image_size // self.patch_size, self.patch_size
        x = images.astype(self.dtype)
        x = x.reshape(b, g, p, g, p, 3).transpose(0, 1, 3, 2, 4, 5).reshape(b, g * g, p * p * 3)
        x = nn.Dense(self.width, dtype=self.dtype, param_dtype=jnp.float32,
                     precision=PRECISION, name="patch_embed")(x)
        cls_token = self.param("cls_token", nn.initializers.zeros, (self.width,), jnp.float32)
        x = jnp.concatenate([jnp.broadcast_to(cls_token.astype(self.dtype),
                                              (b, 1, self.width)), x], axis=1)
        pos_embed = self.param("pos_embed", nn.initializers.normal(0.02),
                               (g * g + 1, self.width), jnp.float32)
        x = x + pos_embed.astype(self.dtype)
        x = Transformer(self.width, self.layers, self.heads, causal=False,
                        quick_gelu=False, dtype=self.dtype,
                        fused_attention=self.fused_attention, ln_eps=1e-6,
                        quantized=self.quantized, name="blocks")(x)
        x = LayerNormFp32(self.dtype, 1e-6, name="norm")(x)
        return x[:, 0]


class SlipModel(nn.Module):
    config: SlipConfig
    dtype: object = jnp.float32
    fused_attention: bool = False
    quantized: bool = False

    def setup(self):
        cfg = self.config
        self.visual = TimmViT(cfg.vision_width, cfg.vision_layers, cfg.vision_heads,
                              cfg.patch_size, cfg.image_size, self.dtype,
                              self.fused_attention, self.quantized)
        self.transformer = Transformer(cfg.text.width, cfg.text.layers,
                                       cfg.text.heads, causal=True,
                                       quick_gelu=True, dtype=self.dtype,
                                       fused_attention=self.fused_attention,
                                       quantized=self.quantized)
        self.ln_final = LayerNormFp32(self.dtype, 1e-5)
        self.token_embedding = self.param("token_embedding",
                                          nn.initializers.normal(0.02),
                                          (cfg.text.vocab_size, cfg.text.width),
                                          jnp.float32)
        self.positional_embedding = self.param("positional_embedding",
                                               nn.initializers.normal(0.01),
                                               (cfg.text.context_length, cfg.text.width),
                                               jnp.float32)
        self.image_projection = self.param("image_projection",
                                           nn.initializers.normal(cfg.vision_width ** -0.5),
                                           (cfg.vision_width, cfg.embed_dim), jnp.float32)
        self.text_projection = self.param("text_projection",
                                          nn.initializers.normal(cfg.text.width ** -0.5),
                                          (cfg.text.width, cfg.embed_dim), jnp.float32)

    def encode_image(self, images: jnp.ndarray) -> jnp.ndarray:
        x = self.visual(images)
        return jnp.matmul(x, self.image_projection.astype(self.dtype),
                          precision=PRECISION)

    def encode_text(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        x = self.token_embedding[input_ids].astype(self.dtype)
        x = x + self.positional_embedding[: x.shape[1]].astype(self.dtype)
        x = self.transformer(x)
        x = self.ln_final(x)
        eot = jnp.argmax(input_ids, axis=-1)
        x = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        return jnp.matmul(x, self.text_projection.astype(self.dtype),
                          precision=PRECISION)

    def __call__(self, images, input_ids):
        return self.encode_image(images), self.encode_text(input_ids)


def _stack(arrays):
    return np.stack(arrays, axis=0)


def _timm_blocks_to_flax(sd: Mapping[str, np.ndarray], prefix: str, layers: int) -> dict:
    def pick(fmt):
        return [np.asarray(sd[fmt.format(prefix=prefix, i=i)]) for i in range(layers)]

    return {
        "attn": {
            "in_proj": {"kernel": _stack([w.T for w in pick("{prefix}.{i}.attn.qkv.weight")]),
                        "bias": _stack(pick("{prefix}.{i}.attn.qkv.bias"))},
            "out_proj": {"kernel": _stack([w.T for w in pick("{prefix}.{i}.attn.proj.weight")]),
                         "bias": _stack(pick("{prefix}.{i}.attn.proj.bias"))},
        },
        "ln_1": {"ln": {"scale": _stack(pick("{prefix}.{i}.norm1.weight")),
                        "bias": _stack(pick("{prefix}.{i}.norm1.bias"))}},
        "ln_2": {"ln": {"scale": _stack(pick("{prefix}.{i}.norm2.weight")),
                        "bias": _stack(pick("{prefix}.{i}.norm2.bias"))}},
        "mlp_fc": {"kernel": _stack([w.T for w in pick("{prefix}.{i}.mlp.fc1.weight")]),
                   "bias": _stack(pick("{prefix}.{i}.mlp.fc1.bias"))},
        "mlp_proj": {"kernel": _stack([w.T for w in pick("{prefix}.{i}.mlp.fc2.weight")]),
                     "bias": _stack(pick("{prefix}.{i}.mlp.fc2.bias"))},
    }


def slip_params_from_torch(state_dict: Mapping[str, np.ndarray],
                           config: SlipConfig) -> dict:
    """SLIP checkpoint state dict (module. prefix already stripped) -> flax."""
    from fitclip_tpu.convert.torch_state_dict import _openai_tower_blocks, _patch_kernel

    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    visual = {
        "patch_embed": {"kernel": _patch_kernel(sd["visual.patch_embed.proj.weight"]),
                        "bias": sd["visual.patch_embed.proj.bias"]},
        "cls_token": sd["visual.cls_token"].reshape(-1),
        "pos_embed": sd["visual.pos_embed"].reshape(-1, config.vision_width),
        "blocks": {"blocks": _timm_blocks_to_flax(sd, "visual.blocks",
                                                  config.vision_layers)},
        "norm": {"ln": {"scale": sd["visual.norm.weight"],
                        "bias": sd["visual.norm.bias"]}},
    }
    return {
        "visual": visual,
        "transformer": {"blocks": _openai_tower_blocks(sd, "transformer",
                                                       config.text.layers)},
        "ln_final": {"ln": {"scale": sd["ln_final.weight"],
                            "bias": sd["ln_final.bias"]}},
        "token_embedding": sd["token_embedding.weight"],
        "positional_embedding": sd["positional_embedding"],
        "image_projection": sd["image_projection"],
        "text_projection": sd["text_projection"],
    }


_SLIP_MODEL_CONFIGS = {
    "VITS16": SlipConfig.vit_s16,
    "VITB16": SlipConfig.vit_b16,
    "VITL16": SlipConfig.vit_l16,
}


class SlipVideoTextEncoder(VideoTextEncoder):
    """Eval-only wrapper: frame-mean of L2-normalized per-frame embeddings
    (slip_video_text_encoder.py:25-99; the reference's train sampler/transform
    raise, slip_video_text_encoder.py:66-75)."""

    trainable = False

    def __init__(self, config: Optional[SlipConfig] = None, num_frames: int = 4,
                 dtype=jnp.float32, fused_attention: bool = False,
                 quantized: bool = False, fused_block: Optional[bool] = None,
                 tokenizer=None, bpe_path: Optional[str] = None) -> None:
        self.config = config or SlipConfig.vit_b16()
        # quantized = int8 W8A8 block denses (ops/quant.py; params from
        # quantize_clip_params — it walks the SLIP tree too). As on the CLIP
        # encoder, quantized + fused attention defaults to the whole-layer
        # Pallas megakernel (models/slip_fast.py); fused_block=True on a
        # float encoder opts into the bf16 layer megakernel.
        self.quantized = quantized
        self.fused_block = (bool(quantized) and fused_attention
                            if fused_block is None else fused_block)
        # Exposed so the CLI runners shard_map any Pallas-kernel eval path
        # under multi-chip meshes (GSPMD can't partition pallas_call).
        self.fused_attention = fused_attention
        self.model = SlipModel(self.config, dtype=dtype,
                               fused_attention=fused_attention,
                               quantized=quantized)
        self.num_frames = num_frames
        self._tokenizer = tokenizer
        self._bpe_path = bpe_path
        self.preprocess = PreprocessSpec(
            num_frames=num_frames,
            image_size=self.config.image_size,
            mean=IMAGENET_MEAN,
            std=IMAGENET_STD,
            train_frame_sampler=_raise_train_sampler,
            eval_frame_sampler=UniformFrameSampler(num_frames),
            resize_mode="bilinear",
            max_tokens=self.config.text.context_length,
        )

    def init_params(self, rng):
        cfg = self.config
        dummy_image = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
        dummy_ids = jnp.zeros((1, cfg.text.context_length), jnp.int32)
        if self.quantized:
            # Init a float twin and quantize so random-init tests carry real
            # (nonzero) weights in the int8 structure.
            from fitclip_tpu.ops.quant import quantize_clip_params

            float_model = SlipModel(self.config, dtype=self.model.dtype)
            params = float_model.init(rng, dummy_image, dummy_ids)["params"]
            return quantize_clip_params(params)
        return self.model.init(rng, dummy_image, dummy_ids)["params"]

    def _prepare_frames(self, video: jnp.ndarray) -> jnp.ndarray:
        if video.dtype == jnp.uint8:
            dtype = self.model.dtype
            mean = jnp.asarray(self.preprocess.mean, dtype) * 255.0
            inv_std = 1.0 / (jnp.asarray(self.preprocess.std, dtype) * 255.0)
            video = (video.astype(dtype) - mean) * inv_std
        b, t = video.shape[0], video.shape[1]
        return video.reshape(b * t, *video.shape[2:])

    def encode_video(self, params, video: jnp.ndarray) -> jnp.ndarray:
        b, t = video.shape[0], video.shape[1]
        frames = self._prepare_frames(video)
        if self.fused_block:
            from fitclip_tpu.models.slip_fast import encode_frames_fast

            emb = encode_frames_fast(params, frames, self.config,
                                     dtype=self.model.dtype)
        else:
            emb = self.model.apply({"params": params}, frames,
                                   method=SlipModel.encode_image)
        emb = l2_normalize(emb)
        return emb.reshape(b, t, -1).mean(axis=1)

    def encode_text(self, params, text: jnp.ndarray) -> jnp.ndarray:
        if self.fused_block:
            from fitclip_tpu.models.slip_fast import encode_text_fast

            return l2_normalize(encode_text_fast(params, text, self.config,
                                                 dtype=self.model.dtype))
        emb = self.model.apply({"params": params}, text, method=SlipModel.encode_text)
        return l2_normalize(emb)

    def collect_act_amax(self, params, video: jnp.ndarray,
                         text: Optional[jnp.ndarray] = None):
        """One calibration observation: both towers in DYNAMIC-quant mode,
        returning the sown activation abs-max tree (same protocol as
        ClipVideoTextEncoder, consumed by the CLI runners' multi-batch
        calibration)."""
        assert self.quantized, "calibration requires a quantized encoder"
        dynamic_model = SlipModel(self.config, dtype=self.model.dtype,
                                  fused_attention=self.model.fused_attention,
                                  quantized="dynamic")
        frames = self._prepare_frames(video)
        _, state = dynamic_model.apply({"params": params}, frames,
                                       method=SlipModel.encode_image,
                                       mutable=["intermediates"])
        intermediates = dict(state["intermediates"])
        if text is not None:
            _, text_state = dynamic_model.apply({"params": params}, text,
                                                method=SlipModel.encode_text,
                                                mutable=["intermediates"])
            intermediates.update(dict(text_state["intermediates"]))
        return intermediates

    def calibrate(self, params, video: jnp.ndarray,
                  text: Optional[jnp.ndarray] = None, margin: float = 1.0):
        """Single-batch PTQ calibration; returns the calibrated params tree."""
        from fitclip_tpu.ops.quant import apply_act_scales

        return apply_act_scales(
            params, self.collect_act_amax(params, video, text), margin=margin)

    def get_tokenizer(self):
        if self._tokenizer is None:
            from fitclip_tpu.models.clip.tokenizer import ClipTokenizer

            self._tokenizer = ClipTokenizer(
                bpe_path=self._bpe_path,
                context_length=self.config.text.context_length)
        return self._tokenizer

    def decode_text(self, ids) -> Iterator[str]:
        tokenizer = self.get_tokenizer()
        for row in np.asarray(ids):
            yield tokenizer.decode(row[row != 0])


def _raise_train_sampler(*args, **kwargs):
    raise NotImplementedError("SLIP encoders are evaluation-only (reference "
                              "slip_video_text_encoder.py:66-75)")


def load_slip_encoder(checkpoint_path: Optional[str] = None,
                      model: str = "SLIP_VITB16", num_frames: int = 4,
                      dtype: str = "float32",
                      fused_attention: Optional[bool] = None,
                      fused_block: Optional[bool] = None,
                      bpe_path: Optional[str] = None,
                      seed: int = 0):
    """config/encoder/slip_* factory. The released checkpoints carry their
    factory name in args.model (slip_video_text_encoder.py:17-22).

    encoder.dtype=int8 selects the W8A8 inference path (bf16 activations,
    int8 block denses, whole-layer Pallas megakernels — models/slip_fast.py),
    same semantics as on the CLIP loader."""
    from fitclip_tpu.models.clip.load import LoadedEncoder, _DTYPES

    if fused_attention is None:
        fused_attention = jax.default_backend() == "tpu"

    state_dict = None
    if checkpoint_path:
        import torch

        checkpoint = torch.load(checkpoint_path, map_location="cpu", weights_only=False)
        if "args" in checkpoint:
            model = checkpoint["args"].model
        raw = checkpoint.get("state_dict", checkpoint)
        state_dict = {k.replace("module.", ""): v.float().numpy()
                      for k, v in raw.items()}
    variant = model.split("_")[-1]
    config = _SLIP_MODEL_CONFIGS[variant]()
    quantized = str(dtype) == "int8"
    if not quantized and str(dtype) not in _DTYPES:
        raise ValueError(f"Unknown encoder dtype {dtype!r} — expected one of "
                         f"{sorted(_DTYPES)} or 'int8'")
    compute_dtype = _DTYPES["bfloat16" if quantized else str(dtype)]
    encoder = SlipVideoTextEncoder(config, num_frames=num_frames,
                                   dtype=compute_dtype,
                                   fused_attention=fused_attention,
                                   quantized=quantized,
                                   fused_block=fused_block,
                                   bpe_path=bpe_path)
    if state_dict is not None:
        params = slip_params_from_torch(state_dict, config)
        if quantized:
            from fitclip_tpu.ops.quant import quantize_clip_params

            params = quantize_clip_params(params)
    else:
        params = encoder.init_params(jax.random.PRNGKey(seed))
    return LoadedEncoder(encoder=encoder, params=params)

"""The folded-normalization uint8 fast path must equal the standard path."""

import jax
import jax.numpy as jnp
import numpy as np

from fitclip_tpu.models.clip import CLIPConfig
from fitclip_tpu.models.clip.encoder import ClipVideoTextEncoder
from fitclip_tpu.models.clip.model import fold_pixel_normalization


def test_folded_uint8_path_matches_standard():
    config = CLIPConfig.tiny_test()
    standard = ClipVideoTextEncoder(config, num_frames=2)
    folded = ClipVideoTextEncoder(config, num_frames=2,
                                  pixel_normalization_folded=True)
    params = standard.init_params(jax.random.PRNGKey(0))
    folded_params = fold_pixel_normalization(params, standard.preprocess.mean,
                                             standard.preprocess.std)

    video = np.random.default_rng(0).integers(0, 256, (2, 2, 32, 32, 3),
                                              dtype=np.uint8)
    reference = standard.encode_video(params, jnp.asarray(video))
    fast = folded.encode_video(folded_params, jnp.asarray(video))
    np.testing.assert_allclose(np.asarray(fast), np.asarray(reference), atol=2e-4)

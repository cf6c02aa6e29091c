import jax.numpy as jnp
import numpy as np
import pytest

from fitclip_tpu.models.wise import wise_params


def test_wise_interpolates():
    p1 = {"a": jnp.ones((2, 2)), "b": {"c": jnp.zeros(3)}}
    p2 = {"a": jnp.zeros((2, 2)), "b": {"c": jnp.ones(3)}}
    merged = wise_params(p1, p2, weight_for_2=0.4)
    np.testing.assert_allclose(np.asarray(merged["a"]), 0.6)
    np.testing.assert_allclose(np.asarray(merged["b"]["c"]), 0.4)


def test_wise_structure_mismatch_raises():
    with pytest.raises(ValueError):
        wise_params({"a": jnp.ones(2)}, {"b": jnp.ones(2)})

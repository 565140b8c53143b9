"""Int8 serving-path quantization: structural correctness + embedding
agreement with the f32 towers."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from witw_tpu.configs import FovDsmModelConfig
from witw_tpu.models import FovDsm
from witw_tpu.models.quantize import quantize_fov_params, quantized_fov_forward


@pytest.mark.parametrize("circ", [False, True])
def test_quantized_forward_close_to_f32(rng, circ):
    cfg = FovDsmModelConfig(compute_dtype="float32")
    model = FovDsm(cfg, circ_padding=circ)
    x = rng.standard_normal((2, 32, 64, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    want = np.asarray(model.apply(variables, jnp.asarray(x)))

    params = jax.tree.map(np.asarray, variables["params"])
    qparams = jax.tree.map(jnp.asarray, quantize_fov_params(params))
    got = np.asarray(quantized_fov_forward(qparams, jnp.asarray(x), circ_padding=circ))

    assert got.shape == want.shape
    cos = np.sum(got * want) / (np.linalg.norm(got) * np.linalg.norm(want))
    assert cos > 0.99, cos


def test_quantized_kernels_are_int8(rng):
    cfg = FovDsmModelConfig(compute_dtype="float32")
    model = FovDsm(cfg, circ_padding=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 3)))
    qparams = quantize_fov_params(jax.tree.map(np.asarray, variables["params"]))
    assert qparams["vgg"]["conv_0"]["kernel_q"].dtype == np.int8
    assert qparams["conv_27"]["kernel_q"].dtype == np.int8
    # per-output-channel scales
    assert qparams["vgg"]["conv_2"]["scale"].shape == (64,)
    # dequantized kernel reproduces the original within the quant step
    k = np.asarray(variables["params"]["vgg"]["conv_0"]["kernel"])
    kq = qparams["vgg"]["conv_0"]["kernel_q"].astype(np.float32) * qparams["vgg"]["conv_0"]["scale"]
    assert np.max(np.abs(k - kq)) <= np.max(qparams["vgg"]["conv_0"]["scale"]) * 0.51

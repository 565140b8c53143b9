"""Model parity tests.

Golden parity against independently-built torch oracles (torch CPU is
available; torchvision is not, so the oracle layers are assembled here from
torch.nn.functional primitives). This validates conv arithmetic, padding
(incl. circular width padding), pooling floors, BN ordering and GeM pooling —
the numerics SURVEY.md §7 flags as the hard part.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from witw_tpu.configs import BaselineModelConfig, FovDsmModelConfig
from witw_tpu.models import BaselineEncoder, FovDsm, fov_dsm_trainable_mask
from witw_tpu.models.backbones.vgg16 import VGG16_CONVS, POOL_AFTER
from witw_tpu.models.fov_dsm import HEAD_CONVS

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def torch_conv(x, kv, stride=(1, 1), circ=False):
    w = torch.tensor(np.transpose(np.asarray(kv["kernel"], np.float32), (3, 2, 0, 1)))
    b = torch.tensor(np.asarray(kv["bias"], np.float32))
    if circ:
        x = F.pad(x, (0, 0, 1, 1))  # zero-pad H
        x = F.pad(x, (1, 1, 0, 0), mode="circular")  # circular-pad W
        return F.conv2d(x, w, b, stride=stride)
    return F.conv2d(x, w, b, stride=stride, padding=1)


def torch_fov_dsm_oracle(params, x_nhwc, circ):
    x = torch.tensor(np.transpose(x_nhwc, (0, 3, 1, 2)))
    vgg = params["vgg"]
    with torch.no_grad():
        for torch_idx, _ in VGG16_CONVS:
            x = torch_conv(x, vgg[f"conv_{torch_idx}"], circ=circ)
            x = F.relu(x)
            if torch_idx in POOL_AFTER:
                x = F.max_pool2d(x, 2, 2)
        for name, _, strides, relu_after in HEAD_CONVS:
            x = torch_conv(x, params[name], stride=strides, circ=circ)
            if relu_after:
                x = F.relu(x)
    return np.transpose(x.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("circ", [False, True])
def test_fov_dsm_matches_torch_oracle(rng, circ):
    cfg = FovDsmModelConfig(compute_dtype="float32")
    model = FovDsm(cfg, circ_padding=circ)
    x = rng.standard_normal((1, 32, 64, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(model.apply(variables, jnp.asarray(x)))
    params = jax.tree.map(np.asarray, variables["params"])
    want = torch_fov_dsm_oracle(params, x, circ)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_fov_dsm_output_geometry():
    """Feature-map geometry for full panorama and for fov=70 (odd width 99)
    must match torch's floor-based downsampling arithmetic."""
    cfg = FovDsmModelConfig(compute_dtype="float32")
    model = FovDsm(cfg, circ_padding=False)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 512, 3)))
    out = model.apply(v, jnp.zeros((1, 128, 512, 3)))
    assert out.shape == (1, 4, 64, 16)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 99, 3)))
    out = model.apply(v, jnp.zeros((1, 128, 99, 3)))
    # torch: W 99 -pool-> 49 -> 24 -> 12; H 128 -> 16 after pools, -> 4 after
    # the two stride-(2,1) head convs.
    assert out.shape == (1, 4, 12, 16)


def test_fov_dsm_trainable_mask():
    cfg = FovDsmModelConfig()
    model = FovDsm(cfg, circ_padding=False)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 3)))
    mask = fov_dsm_trainable_mask(v["params"], cfg)
    assert mask["vgg"]["conv_0"]["kernel"] is False
    assert mask["vgg"]["conv_14"]["kernel"] is False
    assert mask["vgg"]["conv_17"]["kernel"] is True
    assert mask["vgg"]["conv_21"]["bias"] is True
    assert mask["conv_23"]["kernel"] is True
    assert mask["conv_27"]["kernel"] is True
    # Semantic variant: first conv trainable (cvig_semantic.py:306-309).
    sem = FovDsmModelConfig(in_channels=5, train_first_conv=True)
    mask = fov_dsm_trainable_mask(v["params"], sem)
    assert mask["vgg"]["conv_0"]["kernel"] is True
    assert mask["vgg"]["conv_2"]["kernel"] is False


def torch_baseline_oracle(params, batch_stats, x_nhwc, p=3.0):
    x = torch.tensor(np.transpose(x_nhwc, (0, 3, 1, 2)))
    feats = []
    with torch.no_grad():
        x = x / 255.0
        x = -1.0 + 2.0 * x
        for i in range(1, 8):
            cw = params[f"conv{i}"]
            w = torch.tensor(np.transpose(np.asarray(cw["kernel"], np.float32), (3, 2, 0, 1)))
            b = torch.tensor(np.asarray(cw["bias"], np.float32))
            x = F.conv2d(x, w, b, stride=2)
            x = F.leaky_relu(x, 0.2)
            bn = params[f"bn{i}"]
            st = batch_stats[f"bn{i}"]
            x = F.batch_norm(
                x,
                torch.tensor(np.asarray(st["mean"], np.float32)),
                torch.tensor(np.asarray(st["var"], np.float32)),
                torch.tensor(np.asarray(bn["scale"], np.float32)),
                torch.tensor(np.asarray(bn["bias"], np.float32)),
                training=False,
                eps=1e-5,
            )
            if i >= 5:
                g = torch.pow(torch.mean(torch.pow(F.relu(x), p), dim=(2, 3)), 1.0 / p)
                feats.append(g)
        f = torch.cat(feats, dim=1)
        f = f / torch.unsqueeze(torch.pow(torch.linalg.norm(f, dim=1), 0.5), 1)
    return f.numpy()


def test_baseline_matches_torch_oracle(rng):
    cfg = BaselineModelConfig(compute_dtype="float32")
    model = BaselineEncoder(cfg)
    # 7 unpadded k=4 s=2 convs need >=382 px input (reference runs 448x1232
    # surfaces / 750^2 overheads); 384 is the minimal-ish valid square.
    x = rng.uniform(0, 255, size=(1, 384, 384, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(1), jnp.asarray(x))
    got = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    assert got.shape == (1, 1536)
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])
    want = torch_baseline_oracle(params, stats, x)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_baseline_train_mode_updates_stats(rng):
    cfg = BaselineModelConfig(compute_dtype="float32")
    model = BaselineEncoder(cfg)
    x = jnp.asarray(rng.uniform(0, 255, size=(2, 384, 384, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(1), x)
    out, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 1536)
    before = variables["batch_stats"]["bn1"]["mean"]
    after = mutated["batch_stats"]["bn1"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_semantic_five_channel_input():
    cfg = FovDsmModelConfig(in_channels=5, train_first_conv=True, compute_dtype="float32")
    model = FovDsm(cfg, circ_padding=True)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 5)))
    out = model.apply(v, jnp.zeros((1, 32, 64, 5)))
    assert out.shape[-1] == 16
    assert v["params"]["vgg"]["conv_0"]["kernel"].shape[2] == 5


def test_frozen_prefix_stop_gradient_identical_trainable_grads(rng):
    """The stop_gradient at block 4's input changes no trainable-param
    gradient bitwise (frozen-prefix grads were discarded by the optimizer
    mask anyway) — it only removes their backward compute."""
    import dataclasses

    from witw_tpu.configs import FovDsmModelConfig
    from witw_tpu.models import FovDsm

    cfg_on = FovDsmModelConfig(compute_dtype="float32", freeze_backbone=True)
    cfg_off = dataclasses.replace(cfg_on, freeze_backbone=False)
    x = jnp.asarray(rng.standard_normal((2, 32, 64, 3)).astype(np.float32))
    m_on = FovDsm(cfg_on, circ_padding=False)
    m_off = FovDsm(cfg_off, circ_padding=False)
    v = m_on.init(jax.random.PRNGKey(0), x)

    def loss(model):
        def f(params):
            y = model.apply({"params": params}, x)
            return jnp.sum(y * y)
        return f

    g_on = jax.grad(loss(m_on))(v["params"])
    g_off = jax.grad(loss(m_off))(v["params"])
    # head + block4 grads identical
    for name in ("conv_23", "conv_25", "conv_27"):
        np.testing.assert_array_equal(
            np.asarray(g_on[name]["kernel"]), np.asarray(g_off[name]["kernel"])
        )
    for idx in (17, 19, 21):
        np.testing.assert_array_equal(
            np.asarray(g_on["vgg"][f"conv_{idx}"]["kernel"]),
            np.asarray(g_off["vgg"][f"conv_{idx}"]["kernel"]),
        )
    # frozen-prefix grads are exactly zero with the stop_gradient
    assert float(jnp.sum(jnp.abs(g_on["vgg"]["conv_0"]["kernel"]))) == 0.0
    assert float(jnp.sum(jnp.abs(g_off["vgg"]["conv_0"]["kernel"]))) > 0.0

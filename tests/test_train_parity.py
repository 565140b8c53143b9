"""Training-step numerics parity vs a torch transcription (VERDICT r2 #4).

The golden e2e test pins the FORWARD path; this pins several full TRAINING
steps — Adam semantics (lr=1e-5, betas, eps; reference cvig_fov.py:416-418),
the idx<17 freeze-mask interaction (cvig_fov.py:274-278), gradient flow
through the argmax-crop-distance matching ops (gradients reach the overhead
embedding only through the crop gather, cvig_fov.py:318-363), and the loss
trajectory — against an independent torch autograd transcription sharing the
same weights. Dropout off (rate 0) so the step is deterministic.

This is the cheapest remaining de-risking of the 0.5-pt recall gate while
real CVUSA data is unavailable (training numerics feed the gate too).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from witw_tpu.configs import (
    DataConfig,
    DatasetConfig,
    ExperimentConfig,
    FovDsmModelConfig,
    OptimConfig,
    TrainConfig,
)
from witw_tpu.models.backbones.vgg16 import VGG16_CONVS, POOL_AFTER
from witw_tpu.models.fov_dsm import HEAD_CONVS
from witw_tpu.train.pipeline import make_pipeline

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

ALPHA = 10.0
LR = 1e-5
N_STEPS = 4
FREEZE_BELOW = 17  # torch feature idx (reference cvig_fov.py:274-278)


def _assert_delta_close(dj, dt, name, min_frac=0.995, min_cos=0.9995):
    """Param-delta agreement, tolerant of Adam's noise amplification: for
    elements whose true gradient is ~0, the f32 cross-framework grad noise
    decides the SIGN of a full-lr Adam step (m_hat/sqrt(v_hat) ~ +-1), so a
    small fraction of elements legitimately differ by up to 2*lr*steps.
    Require: >=min_frac elementwise agreement at (5% rel + 0.2*lr abs) —
    measured 99.86-99.98% across all six trainable VGG convs at toy geometry
    (99.5% gate); batch 2 at production geometry has fewer loss pairs, so
    more near-zero-gradient elements flip (measured 98.97% worst conv; 98.5%
    gate there) — a near-perfect direction cosine, and every violation
    bounded by the Adam step-size ceiling."""
    close = np.abs(dj - dt) <= 0.05 * np.abs(dt) + 0.2 * LR
    assert np.mean(close) > min_frac, (name, float(np.mean(close)))
    cos = float(np.sum(dj * dt) / max(np.linalg.norm(dj) * np.linalg.norm(dt), 1e-30))
    assert cos > min_cos, (name, cos)
    assert np.max(np.abs(dj - dt)) <= 2 * LR * N_STEPS + 1e-9, name


def _torch_params(params_np):
    """jax param tree -> torch tensors (OIHW) with requires_grad following
    the reference freeze mask; returns ({name: (w, b)}, [trainable leaves])."""
    out, trainable = {}, []
    for torch_idx, _ in VGG16_CONVS:
        kv = params_np["vgg"][f"conv_{torch_idx}"]
        w = torch.tensor(np.transpose(kv["kernel"], (3, 2, 0, 1)))
        b = torch.tensor(np.asarray(kv["bias"]))
        train = torch_idx >= FREEZE_BELOW
        w.requires_grad_(train)
        b.requires_grad_(train)
        out[f"conv_{torch_idx}"] = (w, b)
        if train:
            trainable += [w, b]
    for name, _, _, _ in HEAD_CONVS:
        kv = params_np[name]
        w = torch.tensor(np.transpose(kv["kernel"], (3, 2, 0, 1)))
        b = torch.tensor(np.asarray(kv["bias"]))
        w.requires_grad_(True)
        b.requires_grad_(True)
        out[name] = (w, b)
        trainable += [w, b]
    return out, trainable


def _torch_tower(tp, x, circ):
    """Grad-enabled FOV-DSM forward (same structure as the no-grad oracle in
    test_models.torch_fov_dsm_oracle)."""

    def conv(x, w, b, stride=(1, 1)):
        if circ:
            x = F.pad(x, (0, 0, 1, 1))
            x = F.pad(x, (1, 1, 0, 0), mode="circular")
            return F.conv2d(x, w, b, stride=stride)
        return F.conv2d(x, w, b, stride=stride, padding=1)

    for torch_idx, _ in VGG16_CONVS:
        x = F.relu(conv(x, *tp[f"conv_{torch_idx}"]))
        if torch_idx in POOL_AFTER:
            x = F.max_pool2d(x, 2, 2)
    for name, _, strides, relu_after in HEAD_CONVS:
        x = conv(x, *tp[name], stride=strides)
        if relu_after:
            x = F.relu(x)
    return x


def _torch_match_loss(o, s):
    """correlation -> argmax (detached) -> crop gather -> chord distance ->
    DSM soft-margin triplet loss, all grad-enabled (cvig_fov.py:297-382)."""
    bo, c, h, w = o.shape
    bs, _, _, sw = s.shape
    x = torch.cat((o, o[:, :, :, : sw - 1]), dim=3)
    corr = torch.squeeze(F.conv2d(x, s.detach(), stride=1), -2)  # [Bo, Bs, w]
    orient = torch.argmax(corr, dim=-1)  # [Bo, Bs] (non-differentiable)
    idx = (orient[..., None] + torch.arange(sw)) % w  # [Bo, Bs, sw]
    o_exp = o[:, None].expand(bo, bs, c, h, w)
    idx_exp = idx[:, :, None, None, :].expand(bo, bs, c, h, sw)
    crop = torch.gather(o_exp, 4, idx_exp).reshape(bo, bs, -1)
    crop = crop / torch.linalg.norm(crop, dim=-1, keepdim=True)
    sv = s.reshape(bs, -1)
    sv = sv / torch.linalg.norm(sv, dim=-1, keepdim=True)
    d = 2.0 * (1.0 - torch.einsum("abf,bf->ab", crop, sv))
    matching = torch.diagonal(d)
    loss = (
        F.softplus(ALPHA * (matching[None, :] - d)).sum()
        + F.softplus(ALPHA * (matching[:, None] - d)).sum()
    )
    return loss / (2.0 * bo * (bo - 1))


def test_fov_training_steps_match_torch(rng):
    b, h_s, w_s, s_o = 4, 32, 64, 32
    ds = DatasetConfig(name="cvusa", train_csv="", test_csv="", panorama=True)
    cfg = ExperimentConfig(
        data=DataConfig(
            dataset=ds, surface_height=h_s, surface_width_max=w_s,
            overhead_size=s_o, fov=360, random_orientation=False,
        ),
        model=FovDsmModelConfig(compute_dtype="float32", dropout_rate=0.0),
        train=TrainConfig(batch_size=b, optim=OptimConfig(learning_rate=LR)),
    )
    pipeline = make_pipeline(cfg)
    state = pipeline.init(jax.random.PRNGKey(0))
    params0 = jax.tree.map(np.asarray, state.params)

    surface = rng.uniform(0, 255, (b, h_s, w_s, 3)).astype(np.float32)
    overhead = rng.uniform(0, 255, (b, s_o, s_o, 3)).astype(np.float32)
    batch = {"surface": jnp.asarray(surface), "overhead": jnp.asarray(overhead)}

    # Both sides consume the SAME preprocessed inputs (preprocessing parity
    # is pinned separately by test_golden_e2e; it is deterministic here —
    # full panorama, random_orientation off — and has no trainable params).
    s_in, p_in = pipeline._preprocess(batch, jax.random.PRNGKey(0), train=True)
    s_t = torch.tensor(np.transpose(np.asarray(s_in), (0, 3, 1, 2)))
    p_t = torch.tensor(np.transpose(np.asarray(p_in), (0, 3, 1, 2)))

    # --- jax training ---
    jax_losses = []
    for step in range(N_STEPS):
        state, metrics = pipeline.train_step(state, dict(batch), jax.random.PRNGKey(step))
        jax_losses.append(float(metrics["loss"]))
    params_j = jax.tree.map(np.asarray, state.params)

    # --- torch transcription ---
    tp_s, train_s = _torch_params(params0["surface"])
    tp_o, train_o = _torch_params(params0["overhead"])
    opt = torch.optim.Adam(train_s + train_o, lr=LR, betas=(0.9, 0.999), eps=1e-8)
    torch_losses = []
    for step in range(N_STEPS):
        opt.zero_grad()
        s_emb = _torch_tower(tp_s, s_t, circ=False)
        o_emb = _torch_tower(tp_o, p_t, circ=True)
        loss = _torch_match_loss(o_emb, s_emb)
        loss.backward()
        opt.step()
        torch_losses.append(float(loss))

    # per-step loss trajectory
    np.testing.assert_allclose(jax_losses, torch_losses, rtol=1e-3, atol=1e-5)

    # parameter deltas: frozen leaves exactly unchanged, trainable leaves
    # move identically (within f32 cross-framework tolerance)
    for tower, tp in (("surface", tp_s), ("overhead", tp_o)):
        for torch_idx, _ in VGG16_CONVS:
            name = f"conv_{torch_idx}"
            dj = params_j[tower]["vgg"][name]["kernel"] - params0[tower]["vgg"][name]["kernel"]
            if torch_idx < FREEZE_BELOW:
                assert np.all(dj == 0.0), (tower, name)
                dt = tp[name][0].detach().numpy() - np.transpose(
                    params0[tower]["vgg"][name]["kernel"], (3, 2, 0, 1))
                assert np.all(dt == 0.0), (tower, name)
            else:
                dt = np.transpose(tp[name][0].detach().numpy(), (2, 3, 1, 0)) - \
                    params0[tower]["vgg"][name]["kernel"]
                assert np.max(np.abs(dj)) > 0  # it actually trained
                _assert_delta_close(dj, dt, f"{tower}/{name}")
        for name, _, _, _ in HEAD_CONVS:
            dj = params_j[tower][name]["kernel"] - params0[tower][name]["kernel"]
            dt = np.transpose(tp[name][0].detach().numpy(), (2, 3, 1, 0)) - \
                params0[tower][name]["kernel"]
            assert np.max(np.abs(dj)) > 0
            _assert_delta_close(dj, dt, f"{tower}/{name}")

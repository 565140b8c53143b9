"""Golden end-to-end parity: raw images -> distance matrix.

Runs the complete FOV pipeline (fov crop -> normalize -> polar -> both
towers -> correlation -> aligned chord distance) through witw_tpu's jitted
path and through an independent torch/NumPy oracle assembled from the
reference's published math (resize/crop cvig_fov.py:100-134, normalization
:137-154, polar :156-209, towers :248-294, matching :297-382), sharing the
same weights. Catches cross-op ordering/layout bugs that per-op oracles
cannot."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from witw_tpu.configs import (
    DataConfig,
    DatasetConfig,
    ExperimentConfig,
    FovDsmModelConfig,
    TrainConfig,
)
from witw_tpu.train.pipeline import make_pipeline
from witw_tpu.match import circular_correlation, chord_distance

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from tests.test_models import torch_fov_dsm_oracle  # noqa: E402
from tests.test_ops import np_polar_oracle  # noqa: E402


def torch_match_oracle(o_emb, s_emb):
    """Reference matching math via torch: conv2d circular correlation,
    roll-crop, normalized inner product (cvig_fov.py:297-363)."""
    o = torch.tensor(np.transpose(o_emb, (0, 3, 1, 2)))  # NCHW
    s = torch.tensor(np.transpose(s_emb, (0, 3, 1, 2)))
    sw = s.shape[-1]
    n = sw - 1
    x = torch.cat((o, o[:, :, :, :n]), dim=3)
    out = F.conv2d(x, s, stride=1)
    out = torch.squeeze(out, -2)
    orientation = torch.argmax(out, -1)  # [Bo, Bs]
    bo, bs = orientation.shape
    c, h, w = o.shape[1:]
    d = np.zeros((bo, bs))
    for a in range(bo):
        for b in range(bs):
            cols = [(int(orientation[a, b]) + k) % w for k in range(sw)]
            crop = o[a][:, :, cols].reshape(-1)
            sv = s[b].reshape(-1)
            cos = torch.dot(crop / torch.linalg.norm(crop), sv / torch.linalg.norm(sv))
            d[a, b] = 2 * (1 - float(cos))
    return d, orientation.numpy()


def test_full_fov_pipeline_matches_torch_oracle(rng):
    h_s, w_s, s_o = 32, 64, 32
    b = 3
    ds = DatasetConfig(name="cvusa", train_csv="", test_csv="", panorama=True)
    cfg = ExperimentConfig(
        data=DataConfig(
            dataset=ds, surface_height=h_s, surface_width_max=w_s, overhead_size=s_o,
            fov=360, random_orientation=False,
        ),
        model=FovDsmModelConfig(compute_dtype="float32"),
        train=TrainConfig(batch_size=b),
    )
    pipeline = make_pipeline(cfg)
    state = pipeline.init(jax.random.PRNGKey(0))

    surface = rng.uniform(0, 255, (b, h_s, w_s, 3)).astype(np.float32)
    overhead = rng.uniform(0, 255, (b, s_o, s_o, 3)).astype(np.float32)
    batch = {"surface": jnp.asarray(surface), "overhead": jnp.asarray(overhead)}

    # --- witw_tpu path ---
    s_in, polar_in = pipeline._preprocess(batch, jax.random.PRNGKey(0), train=False)
    s_emb = pipeline.surface_model.apply({"params": state.params["surface"]}, s_in)
    o_emb = pipeline.overhead_model.apply({"params": state.params["overhead"]}, polar_in)
    corr = circular_correlation(o_emb, s_emb)
    got_d, got_orient = chord_distance(o_emb, s_emb, corr)

    # --- independent oracle: normalize -> polar (reference order) -> towers ---
    mean = np.array(cfg.data.img_mean, np.float32)
    std = np.array(cfg.data.img_std, np.float32)
    s_norm = (surface / 255.0 - mean) / std
    o_norm = (overhead / 255.0 - mean) / std
    polar = np.stack(
        [
            np.transpose(
                np_polar_oracle(np.transpose(img, (2, 0, 1)), h_s, w_s), (1, 2, 0)
            )
            for img in o_norm
        ]
    ).astype(np.float32)

    params_s = jax.tree.map(np.asarray, state.params["surface"])
    params_o = jax.tree.map(np.asarray, state.params["overhead"])
    want_s_emb = torch_fov_dsm_oracle(params_s, s_norm.astype(np.float32), circ=False)
    want_o_emb = torch_fov_dsm_oracle(params_o, polar, circ=True)

    np.testing.assert_allclose(np.asarray(s_emb), want_s_emb, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(o_emb), want_o_emb, rtol=2e-3, atol=2e-4)

    want_d, want_orient = torch_match_oracle(want_o_emb, want_s_emb)
    np.testing.assert_array_equal(np.asarray(got_orient), want_orient)
    np.testing.assert_allclose(np.asarray(got_d), want_d, rtol=1e-3, atol=1e-3)

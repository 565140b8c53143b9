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


@pytest.mark.parametrize("circ", [False, True])
def test_static_quantized_forward_close_to_f32(rng, circ):
    """Static-scale int8 path: one fused requant per conv, embedding cosine
    vs the f32 tower > 0.99 after calibration on matching data."""
    from witw_tpu.models.quantize import (
        calibrate_fov_activation_scales,
        prepare_static_qparams,
        quantized_fov_forward_static,
    )

    cfg = FovDsmModelConfig(compute_dtype="float32")
    model = FovDsm(cfg, circ_padding=circ)
    x = rng.standard_normal((2, 32, 64, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    want = np.asarray(model.apply(variables, jnp.asarray(x)))

    params = jax.tree.map(np.asarray, variables["params"])
    calib = [rng.standard_normal((2, 32, 64, 3)).astype(np.float32) for _ in range(2)]
    scales = calibrate_fov_activation_scales(params, calib + [x], circ_padding=circ)
    sq = jax.tree.map(jnp.asarray, prepare_static_qparams(params, scales))
    got = np.asarray(quantized_fov_forward_static(sq, jnp.asarray(x), circ_padding=circ))

    assert got.shape == want.shape
    cos = np.sum(got * want) / (np.linalg.norm(got) * np.linalg.norm(want))
    assert cos > 0.99, cos


@pytest.mark.parametrize("circ", [False, True])
def test_calibration_forward_matches_flax_tower(rng, circ):
    """Structural-divergence guard: calibrate_fov_activation_scales
    re-implements the f32 tower in raw lax (a hand-maintained copy of the
    FovDsm architecture). The scale it records for the LAST head conv is the
    abs-max of the tower's final output, so it must equal the real Flax
    model's output abs-max exactly — any future drift between the copy and
    the model (pool placement, padding, head spec) fails here instead of
    silently mis-calibrating."""
    from witw_tpu.models.fov_dsm import HEAD_CONVS
    from witw_tpu.models.quantize import calibrate_fov_activation_scales

    cfg = FovDsmModelConfig(compute_dtype="float32")
    model = FovDsm(cfg, circ_padding=circ)
    x = rng.standard_normal((2, 32, 64, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(model.apply(variables, jnp.asarray(x)))

    params = jax.tree.map(np.asarray, variables["params"])
    scales = calibrate_fov_activation_scales(params, [x], circ_padding=circ)
    last = HEAD_CONVS[-1][0]
    np.testing.assert_allclose(
        scales[last] * 127.0, np.max(np.abs(out)), rtol=1e-6)


@pytest.mark.parametrize("circ", [False, True])
@pytest.mark.parametrize("w2d", [2, 4])
def test_static_variants_bit_exact(rng, circ, w2d):
    """The measured perf variants — width space-to-depth conv1_1 and
    pool-as-strided-slices — are bit-exact vs the default static path
    (same int8 math, different lowering)."""
    from witw_tpu.models.quantize import (
        calibrate_fov_activation_scales,
        prepare_static_qparams,
        quantized_fov_forward_static,
    )

    cfg = FovDsmModelConfig(compute_dtype="float32")
    model = FovDsm(cfg, circ_padding=circ)
    x = rng.standard_normal((2, 32, 64, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = jax.tree.map(np.asarray, variables["params"])
    scales = calibrate_fov_activation_scales(params, [x], circ_padding=circ)
    sq = jax.tree.map(jnp.asarray, prepare_static_qparams(params, scales))
    want = np.asarray(quantized_fov_forward_static(sq, jnp.asarray(x), circ))
    got = np.asarray(quantized_fov_forward_static(
        sq, jnp.asarray(x), circ, first_conv_w2d=w2d, pool_slices=True,
        block2_w2d=w2d))
    np.testing.assert_array_equal(got, want)


def test_static_quantized_rank_agreement(rng):
    """Retrieval ranks from the static-int8 towers agree with the f32 towers
    on planted-structure data (the serving-path acceptance check)."""
    from witw_tpu.evaluation.gallery import FovGalleryEvaluator
    from witw_tpu.models.quantize import (
        calibrate_fov_activation_scales,
        prepare_static_qparams,
        quantized_fov_forward_static,
    )

    cfg = FovDsmModelConfig(compute_dtype="float32")
    surf_m = FovDsm(cfg, circ_padding=False)
    over_m = FovDsm(cfg, circ_padding=True)
    n = 12
    surf = rng.standard_normal((n, 32, 64, 3)).astype(np.float32)
    # planted: overhead = surface content (same image -> strong true match)
    over = surf + 0.1 * rng.standard_normal((n, 32, 64, 3)).astype(np.float32)
    vs = surf_m.init(jax.random.PRNGKey(0), jnp.asarray(surf))
    vo = over_m.init(jax.random.PRNGKey(1), jnp.asarray(over))

    s_f32 = np.asarray(surf_m.apply(vs, jnp.asarray(surf)))
    o_f32 = np.asarray(over_m.apply(vo, jnp.asarray(over)))

    ps = jax.tree.map(np.asarray, vs["params"])
    po = jax.tree.map(np.asarray, vo["params"])
    sq_s = jax.tree.map(jnp.asarray, prepare_static_qparams(
        ps, calibrate_fov_activation_scales(ps, [surf], False)))
    sq_o = jax.tree.map(jnp.asarray, prepare_static_qparams(
        po, calibrate_fov_activation_scales(po, [over], True)))
    s_q = np.asarray(quantized_fov_forward_static(sq_s, jnp.asarray(surf), False))
    o_q = np.asarray(quantized_fov_forward_static(sq_o, jnp.asarray(over), True))

    ev = FovGalleryEvaluator(query_block=4, gallery_chunk=4)
    r_f32 = ev.ranks(o_f32, s_f32)
    r_q = ev.ranks(o_q, s_q)
    # top-1 recall must agree within one item on this small planted set
    assert abs(int(np.sum(r_f32 <= 1)) - int(np.sum(r_q <= 1))) <= 1


@pytest.mark.parametrize("circ", [False, True])
def test_safa_static_quantized_close_to_f32(rng, circ):
    """SAFA-family static-int8 path (VERDICT r3 #7): int8 VGG trunk + f32
    SAFA head, per-row embedding cosine vs the f32 tower > 0.99 after
    calibration on matching data."""
    from witw_tpu.configs import SafaModelConfig
    from witw_tpu.models.quantize import (
        quantize_safa_tower_static,
        quantized_safa_forward_static,
    )
    from witw_tpu.models.safa import VggSafa

    cfg = SafaModelConfig(compute_dtype="float32")
    model = VggSafa(cfg, circ_padding=circ)
    x = rng.standard_normal((2, 32, 64, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    want = np.asarray(model.apply(variables, jnp.asarray(x)))

    calib = [rng.standard_normal((2, 32, 64, 3)).astype(np.float32), x]
    sq, head = quantize_safa_tower_static(variables["params"], calib, circ)
    got = np.asarray(
        quantized_safa_forward_static(sq, head, jnp.asarray(x), circ))

    assert got.shape == want.shape
    # unit embeddings: compare per-row cosine directly
    cos = np.sum(got * want, axis=1)
    assert np.all(cos > 0.99), cos


def test_safa_static_rank_agreement(rng):
    """Euclidean retrieval ranks from the static-int8 SAFA towers agree with
    the f32 towers on planted-structure data — the same serving-path
    acceptance contract as the FOV family."""
    from witw_tpu.configs import SafaModelConfig
    from witw_tpu.evaluation.gallery import euclidean_ranks
    from witw_tpu.models.quantize import (
        quantize_safa_tower_static,
        quantized_safa_forward_static,
    )
    from witw_tpu.models.safa import VggSafa

    cfg = SafaModelConfig(compute_dtype="float32")
    surf_m = VggSafa(cfg, circ_padding=False)
    over_m = VggSafa(cfg, circ_padding=True)
    n = 12
    surf = rng.standard_normal((n, 32, 64, 3)).astype(np.float32)
    over = surf + 0.1 * rng.standard_normal((n, 32, 64, 3)).astype(np.float32)
    vs = surf_m.init(jax.random.PRNGKey(0), jnp.asarray(surf))
    vo = over_m.init(jax.random.PRNGKey(1), jnp.asarray(over))

    s_f32 = np.asarray(surf_m.apply(vs, jnp.asarray(surf)))
    o_f32 = np.asarray(over_m.apply(vo, jnp.asarray(over)))

    sq_s, head_s = quantize_safa_tower_static(vs["params"], [surf], False)
    sq_o, head_o = quantize_safa_tower_static(vo["params"], [over], True)
    s_q = np.asarray(
        quantized_safa_forward_static(sq_s, head_s, jnp.asarray(surf), False))
    o_q = np.asarray(
        quantized_safa_forward_static(sq_o, head_o, jnp.asarray(over), True))

    r_f32 = euclidean_ranks(o_f32, s_f32, block=4)
    r_q = euclidean_ranks(o_q, s_q, block=4)
    assert abs(int(np.sum(r_f32 <= 1)) - int(np.sum(r_q <= 1))) <= 1


def test_baseline_static_quantized_close_to_f32(rng):
    """Baseline-family static-int8 path: int8 k=4 s=2 convs with the
    LeakyReLU+BatchNorm epilogue folded into f32 per-channel affines,
    per-row embedding cosine vs the f32 tower > 0.99. The 7 unpadded
    stride-2 convs need >= 382 px input (see test_models), so this runs
    one 384^2 image."""
    from witw_tpu.configs import BaselineModelConfig
    from witw_tpu.models import BaselineEncoder
    from witw_tpu.models.quantize import (
        quantize_baseline_tower_static,
        quantized_baseline_forward_static,
    )

    cfg = BaselineModelConfig(compute_dtype="float32")
    model = BaselineEncoder(cfg)
    x = rng.uniform(0, 255, size=(1, 384, 384, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    want = np.asarray(model.apply(variables, jnp.asarray(x), train=False))

    calib = [x, rng.uniform(0, 255, size=(1, 384, 384, 3)).astype(np.float32)]
    sq = quantize_baseline_tower_static(variables, calib)
    sats = []
    got = np.asarray(quantized_baseline_forward_static(
        sq, jnp.asarray(x), saturation_out=sats))

    assert got.shape == want.shape == (1, 1536)
    cos = np.sum(got * want, axis=1) / (
        np.linalg.norm(got, axis=1) * np.linalg.norm(want, axis=1))
    assert np.all(cos > 0.99), cos
    # the f/||f||^0.5 pseudo-norm must also track (embeddings are NOT unit)
    np.testing.assert_allclose(
        np.linalg.norm(got, axis=1), np.linalg.norm(want, axis=1), rtol=0.05)
    # saturation counters cover every requant (6 of 7 layers requantize)
    assert len(sats) == 6
    frac = sum(int(h) for h, _ in sats) / sum(t for _, t in sats)
    assert frac < 0.01, frac


def test_baseline_static_rank_agreement(rng):
    """Euclidean retrieval ranks from the static-int8 baseline towers agree
    with the f32 towers on planted-structure data — the same serving-path
    acceptance contract as the FOV/SAFA families."""
    from witw_tpu.configs import BaselineModelConfig
    from witw_tpu.evaluation.gallery import euclidean_ranks
    from witw_tpu.models import BaselineEncoder
    from witw_tpu.models.quantize import (
        quantize_baseline_tower_static,
        quantized_baseline_forward_static,
    )

    cfg = BaselineModelConfig(compute_dtype="float32")
    surf_m = BaselineEncoder(cfg)
    over_m = BaselineEncoder(cfg)
    n = 6
    surf = rng.uniform(0, 255, size=(n, 384, 384, 3)).astype(np.float32)
    over = np.clip(
        surf + rng.normal(0, 12, size=surf.shape), 0, 255
    ).astype(np.float32)
    vs = surf_m.init(jax.random.PRNGKey(0), jnp.asarray(surf))
    vo = over_m.init(jax.random.PRNGKey(1), jnp.asarray(over))

    s_f32 = np.asarray(surf_m.apply(vs, jnp.asarray(surf), train=False))
    o_f32 = np.asarray(over_m.apply(vo, jnp.asarray(over), train=False))

    # through the two-tower pipeline helper (same tables as per-tower calls)
    from types import SimpleNamespace

    from witw_tpu.models.quantize import quantize_baseline_pipeline_static

    state = SimpleNamespace(
        params={"surface": vs["params"], "overhead": vo["params"]},
        batch_stats={"surface": vs["batch_stats"],
                     "overhead": vo["batch_stats"]},
    )
    sq_s, sq_o = quantize_baseline_pipeline_static(state, [(surf, over)])
    s_q = np.asarray(quantized_baseline_forward_static(sq_s, jnp.asarray(surf)))
    o_q = np.asarray(quantized_baseline_forward_static(sq_o, jnp.asarray(over)))

    r_f32 = euclidean_ranks(o_f32, s_f32, block=3)
    r_q = euclidean_ranks(o_q, s_q, block=3)
    assert abs(int(np.sum(r_f32 <= 1)) - int(np.sum(r_q <= 1))) <= 1


def test_int8_first_preprocess_matches_f32_preprocess(rng):
    """preprocess_static_int8 (normalize+quantize first, int8 gathers after)
    agrees with quantizing the f32 _preprocess outputs: surface exact, polar
    within 1 LSB, and exact zeros at polar boundary samples (the reference's
    clip-then-weight semantics, model/cvig_fov.py:163-183)."""
    from witw_tpu.configs import (
        DataConfig, DatasetConfig, EvalConfig, ExperimentConfig,
        FovDsmModelConfig, OptimConfig, TrainConfig,
    )
    from witw_tpu.models.quantize import (
        preprocess_static_int8, quantize_input, quantize_pipeline_static,
        quantized_fov_forward_static,
    )
    from witw_tpu.ops.polar import polar_grid
    from witw_tpu.train.pipeline import make_pipeline

    ds = DatasetConfig(name="cvusa", train_csv="", test_csv="", panorama=True)
    cfg = ExperimentConfig(
        data=DataConfig(dataset=ds, surface_height=32, surface_width_max=64,
                        overhead_size=64),
        model=FovDsmModelConfig(compute_dtype="float32"),
        train=TrainConfig(batch_size=4, optim=OptimConfig(learning_rate=1e-4)),
        eval=EvalConfig(query_block=4),
    )
    pipe = make_pipeline(cfg)
    state = pipe.init(jax.random.PRNGKey(0))
    d = cfg.data
    batch = {
        "surface": rng.uniform(0, 255, (4, 32, 64, 3)).astype(np.float32),
        "overhead": rng.uniform(0, 255, (4, 64, 64, 3)).astype(np.float32),
    }
    s_in, p_in = pipe._preprocess(batch, jax.random.PRNGKey(0), train=False)
    sq_s, sq_o = quantize_pipeline_static(state, [(s_in, p_in)])
    sq8, pq8 = preprocess_static_int8(d, sq_s, sq_o, batch, jax.random.PRNGKey(0))

    s_ref = np.asarray(quantize_input(s_in, sq_s["input_scale"]), np.int32)
    p_ref = np.asarray(quantize_input(p_in, sq_o["input_scale"]), np.int32)
    assert np.array_equal(np.asarray(sq8, np.int32), s_ref)
    assert np.max(np.abs(np.asarray(pq8, np.int32) - p_ref)) <= 1

    wsum = polar_grid(32, 64, 64).wsum
    assert np.all(np.asarray(pq8)[:, wsum == 0] == 0)

    # end-to-end: embeddings through the static towers stay aligned
    e_ref = np.asarray(quantized_fov_forward_static(sq_o, p_in, True))
    e_new = np.asarray(
        quantized_fov_forward_static(sq_o, jnp.asarray(pq8), True, x_quantized=True)
    )
    cos = np.sum(e_ref * e_new) / (np.linalg.norm(e_ref) * np.linalg.norm(e_new))
    assert cos > 0.995, cos


def test_first_conv_bf16_variant_close(rng):
    """first_conv_bf16 folds the input scale into a bf16 conv1_1; embeddings
    stay close to the all-int8 static path."""
    from witw_tpu.models.quantize import (
        calibrate_fov_activation_scales, prepare_static_qparams,
        quantized_fov_forward_static,
    )

    cfg = FovDsmModelConfig(compute_dtype="float32")
    model = FovDsm(cfg, circ_padding=False)
    x = rng.standard_normal((2, 32, 64, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = jax.tree.map(np.asarray, variables["params"])
    scales = calibrate_fov_activation_scales(params, [x], circ_padding=False)
    sq_i8 = jax.tree.map(jnp.asarray, prepare_static_qparams(params, scales))
    sq_bf = jax.tree.map(
        jnp.asarray, prepare_static_qparams(params, scales, first_conv_bf16=True)
    )
    a = np.asarray(quantized_fov_forward_static(sq_i8, jnp.asarray(x)))
    b = np.asarray(quantized_fov_forward_static(sq_bf, jnp.asarray(x)))
    cos = np.sum(a * b) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.99, cos


def test_int8_first_preprocess_semantic_5ch(rng):
    """The semantic 5-channel variant through int8-first preprocessing keeps
    the reference's normalization quirk (/255 on the first 3 channels only,
    cvig_semantic.py:173-176): surface path exact vs quantize-after, polar
    within 1 LSB across all 5 channels."""
    from witw_tpu.configs import (
        DataConfig, EvalConfig, ExperimentConfig, FovDsmModelConfig,
        OptimConfig, TrainConfig, dataset_config,
    )
    from witw_tpu.models.quantize import (
        preprocess_static_int8, quantize_input, quantize_pipeline_static,
    )
    from witw_tpu.train.pipeline import make_pipeline

    ds = dataset_config("witw", semantic=True)
    cfg = ExperimentConfig(
        data=DataConfig(dataset=ds, surface_height=32, surface_width_max=64,
                        overhead_size=64, channels=5,
                        img_mean=(0.485, 0.456, 0.406, 0.5, 0.5),
                        img_std=(0.229, 0.224, 0.225, 0.5, 0.5)),
        model=FovDsmModelConfig(compute_dtype="float32", in_channels=5),
        train=TrainConfig(batch_size=2, optim=OptimConfig(learning_rate=1e-4)),
        eval=EvalConfig(query_block=2),
    )
    pipe = make_pipeline(cfg)
    state = pipe.init(jax.random.PRNGKey(0))
    d = cfg.data
    batch = {
        "surface": rng.uniform(0, 255, (2, 32, 64, 5)).astype(np.float32),
        "overhead": rng.uniform(0, 255, (2, 64, 64, 5)).astype(np.float32),
    }
    # mask channels arrive already in [0, 1] (reference augment.py:75-79)
    batch["surface"][..., 3:] /= 255.0
    batch["overhead"][..., 3:] /= 255.0
    s_in, p_in = pipe._preprocess(batch, jax.random.PRNGKey(0), train=False)
    sq_s, sq_o = quantize_pipeline_static(state, [(s_in, p_in)])
    sq8, pq8 = preprocess_static_int8(d, sq_s, sq_o, batch, jax.random.PRNGKey(0))

    assert sq8.shape[-1] == 5 and pq8.shape[-1] == 5
    s_ref = np.asarray(quantize_input(s_in, sq_s["input_scale"]), np.int32)
    p_ref = np.asarray(quantize_input(p_in, sq_o["input_scale"]), np.int32)
    assert np.array_equal(np.asarray(sq8, np.int32), s_ref)
    assert np.max(np.abs(np.asarray(pq8, np.int32) - p_ref)) <= 1


def test_pool_slices_odd_dims_match_reduce_window(rng):
    """_pool_slices must reproduce reduce_window's VALID floor semantics on
    ODD spatial dims (drop the trailing row/col), not crash on mismatched
    slice shapes."""
    import jax
    import jax.numpy as jnp

    from witw_tpu.models.quantize import _pool_slices

    for h, w in [(5, 7), (6, 5), (5, 6), (8, 8)]:
        x = jnp.asarray(
            rng.integers(-127, 128, (2, h, w, 3)).astype(np.int8))
        want = jax.lax.reduce_window(
            x, np.int8(-128), jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
            "VALID")
        got = _pool_slices(x)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

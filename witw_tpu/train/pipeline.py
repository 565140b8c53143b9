"""Jitted train/eval/embed steps for the three model families.

Everything the reference runs per-sample in DataLoader workers (FOV crop,
normalization, polar transform — reference model/cvig_fov.py:393-397; synced
rotation — cvig_baseline.py:324-328) happens here on-device inside the jitted
step, so the host ships raw uint8-scale images and the whole pipeline
(preprocess -> towers -> correlation -> distance -> loss -> adam) compiles to
one XLA program. Batch axis is shardable over the mesh's data axis.

State layout: params/batch_stats are two-tower dicts {"surface": .., "overhead": ..}.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from witw_tpu.configs.base import (
    BaselineModelConfig,
    ExperimentConfig,
    FovDsmModelConfig,
    SafaModelConfig,
)
from witw_tpu.match.correlation import circular_correlation
from witw_tpu.match.distance import chord_distance
from witw_tpu.match.losses import dsm_triplet_loss, exhaustive_minibatch_triplet_loss
from witw_tpu.models.baseline import BaselineEncoder
from witw_tpu.models.fov_dsm import FovDsm, fov_dsm_trainable_mask
from witw_tpu.ops.fov import fov_crop, random_fov_starts
from witw_tpu.ops.image import (
    normalize_images,
    normalize_images_masked_bias,
    repeat_rows,
)
from witw_tpu.ops.polar import polar_grid, polar_transform
from witw_tpu.ops.rotation import synced_rotation


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any

    def trainable_params(self):
        return self.params


def _adam(cfg: ExperimentConfig) -> optax.GradientTransformation:
    o = cfg.train.optim
    return optax.adam(o.learning_rate, b1=o.b1, b2=o.b2, eps=o.eps)


class FovPipeline:
    """cvig_fov / cvig_semantic pipeline (reference cvig_fov.py:385-487)."""

    def __init__(self, cfg: ExperimentConfig):
        assert isinstance(cfg.model, FovDsmModelConfig)
        self.cfg = cfg
        self.surface_model = FovDsm(cfg.model, circ_padding=False)
        # Overhead tower convolves the polar pseudo-panorama, which wraps
        # horizontally -> circular padding (reference cvig_fov.py:407).
        self.overhead_model = FovDsm(cfg.model, circ_padding=True)
        self._tx: Optional[optax.GradientTransformation] = None

    # ---- initialization ----

    def init(self, rng: jax.Array) -> TrainState:
        d = self.cfg.data
        sw = d.surface_width
        surface_shape = (1, d.surface_height, sw, d.channels)
        polar_shape = (1, d.surface_height, d.surface_width_max, d.channels)
        k1, k2 = jax.random.split(rng)
        v_s = self.surface_model.init(k1, jnp.zeros(surface_shape))
        v_o = self.overhead_model.init(k2, jnp.zeros(polar_shape))
        params = {"surface": v_s["params"], "overhead": v_o["params"]}
        tx = self.optimizer(params)
        opt_state = tx.init(params)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats={},
            opt_state=opt_state,
        )

    def optimizer(self, params) -> optax.GradientTransformation:
        if self._tx is None:
            mask = {
                "surface": fov_dsm_trainable_mask(params["surface"], self.cfg.model),
                "overhead": fov_dsm_trainable_mask(params["overhead"], self.cfg.model),
            }
            labels = jax.tree.map(lambda t: "train" if t else "freeze", mask)
            self._tx = optax.multi_transform(
                {"train": _adam(self.cfg), "freeze": optax.set_to_zero()}, labels
            )
        return self._tx

    # ---- preprocessing (on device, in jit) ----

    def _preprocess(self, batch: Dict[str, jax.Array], rng: jax.Array, train: bool):
        d = self.cfg.data
        surface = jnp.asarray(batch["surface"], jnp.float32)
        overhead = jnp.asarray(batch["overhead"], jnp.float32)
        if d.dataset.panorama:
            sw = d.surface_width
            # The reference randomizes the crop origin at train AND eval time
            # (Resize(random_orientation=True) in both train() and test(),
            # cvig_fov.py:393,497) — retrieval is heading-agnostic. We keep
            # that but drive it from a seeded rng.
            if d.random_orientation:
                starts = random_fov_starts(rng, surface.shape[0], d.surface_width_max)
            else:
                starts = jnp.zeros((surface.shape[0],), jnp.int32)
            if sw < d.surface_width_max:
                surface = fov_crop(surface, starts, sw)
            elif d.random_orientation:
                # Full panorama: crop degenerates to a circular roll.
                surface = fov_crop(surface, starts, d.surface_width_max)
        scale_ch = 3 if d.dataset.semantic else None
        surface = normalize_images(surface, d.img_mean, d.img_std, scale_ch)
        # Polar-transform the raw tile first with a bf16 gather (exact for
        # uint8-valued pixels, halves the gather's HBM traffic), then
        # normalize: the per-channel affine commutes with the transform where
        # bilinear weights sum to 1. At exact-boundary samples the reference's
        # clip-then-weight order zeroes the output; the gather already
        # produces 0 there (all four weights vanish), so only the
        # normalization BIAS needs masking — folded into one fused
        # multiply-add via a precomputed bias map. Reference order is
        # normalize-then-polar (cvig_fov.py:393-397) — mathematically equal.
        polar = polar_transform(
            overhead, d.surface_height, d.surface_width_max,
            gather_dtype=jnp.bfloat16,
        )
        wsum = polar_grid(
            d.surface_height, d.surface_width_max, overhead.shape[1]
        ).wsum
        polar = normalize_images_masked_bias(
            polar, d.img_mean, d.img_std, wsum, scale_ch
        )
        return surface, polar

    # ---- loss ----

    def _forward_loss(self, params, batch, rng, train: bool):
        crop_rng, drop_s, drop_o = jax.random.split(rng, 3)
        surface, polar = self._preprocess(batch, crop_rng, train)
        kw = dict(train=train)
        s_emb = self.surface_model.apply(
            {"params": params["surface"]}, surface, rngs={"dropout": drop_s}, **kw
        )
        o_emb = self.overhead_model.apply(
            {"params": params["overhead"]}, polar, rngs={"dropout": drop_o}, **kw
        )
        corr = circular_correlation(o_emb, s_emb, method="matmul")
        distance, orientation = chord_distance(o_emb, s_emb, corr)
        # batch["valid"] (bool [B], optional) marks real rows when the
        # straggler batch was padded to the data-axis multiple for sharding;
        # masking makes the loss exactly the unpadded batch's loss.
        loss = dsm_triplet_loss(
            distance, alpha=self.cfg.match.alpha, valid=batch.get("valid")
        )
        return loss, {"distance": distance, "orientation": orientation}

    # ---- jitted steps ----

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: TrainState, batch, rng) -> Tuple[TrainState, Dict]:
        def loss_fn(params):
            loss, aux = self._forward_loss(params, batch, rng, train=True)
            return loss, aux

        (loss, _aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        tx = self.optimizer(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params, opt_state=opt_state)
        return new_state, {"loss": loss}

    @functools.partial(jax.jit, static_argnums=0)
    def eval_step(self, state: TrainState, batch, rng) -> Dict:
        loss, _ = self._forward_loss(state.params, batch, rng, train=False)
        return {"loss": loss}

    @functools.partial(jax.jit, static_argnums=0)
    def embed_step(self, state: TrainState, batch, rng=None) -> Tuple[jax.Array, jax.Array]:
        """Embed a batch for retrieval eval. Pass a (seeded) rng to reproduce
        the reference's random-heading eval crops; None pins heading 0."""
        if rng is None:
            rng = jax.random.PRNGKey(0)
        surface, polar = self._preprocess(batch, rng, train=False)
        s_emb = self.surface_model.apply({"params": state.params["surface"]}, surface)
        o_emb = self.overhead_model.apply({"params": state.params["overhead"]}, polar)
        return s_emb, o_emb


class BaselinePipeline:
    """cvig_baseline pipeline (reference cvig_baseline.py:318-402)."""

    def __init__(self, cfg: ExperimentConfig):
        assert isinstance(cfg.model, BaselineModelConfig)
        self.cfg = cfg
        self.surface_model = BaselineEncoder(cfg.model)
        self.overhead_model = BaselineEncoder(cfg.model)
        self._tx: Optional[optax.GradientTransformation] = None
        # CVUSA surfaces get rows repeated x2 on device
        # (reference cvig_baseline.py:216-218); WITW surfaces arrive 500x500
        # from the host loader (cvig_baseline.py:219-221).
        self.repeat_surface_rows = cfg.data.dataset.name == "cvusa"

    def init(self, rng: jax.Array, surface_hw=(224, 1232), overhead_hw=(750, 750)) -> TrainState:
        d = self.cfg.data
        h, w = surface_hw
        if self.repeat_surface_rows:
            h *= 2
        channels = d.channels + (2 if getattr(self.cfg.model, "orientation_maps", False) else 0)
        k1, k2 = jax.random.split(rng)
        v_s = self.surface_model.init(k1, jnp.zeros((1, h, w, channels)))
        v_o = self.overhead_model.init(k2, jnp.zeros((1, *overhead_hw, channels)))
        params = {"surface": v_s["params"], "overhead": v_o["params"]}
        batch_stats = {"surface": v_s["batch_stats"], "overhead": v_o["batch_stats"]}
        tx = self.optimizer(params)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
        )

    def optimizer(self, params) -> optax.GradientTransformation:
        if self._tx is None:
            self._tx = _adam(self.cfg)
        return self._tx

    def _preprocess(self, batch, rng, train: bool):
        d = self.cfg.data
        surface = jnp.asarray(batch["surface"], jnp.float32)
        overhead = jnp.asarray(batch["overhead"], jnp.float32)
        # Reference applies SyncedRotation at train AND eval time
        # (cvig_baseline.py:324-328,410-414) — reproduced, but seeded.
        surface, overhead = synced_rotation(
            rng, surface, overhead, panorama=d.dataset.panorama
        )
        if self.repeat_surface_rows:
            surface = repeat_rows(surface, 2)
        if getattr(self.cfg.model, "orientation_maps", False):
            from witw_tpu.ops.orientation_maps import append_orientation_maps

            surface, overhead = append_orientation_maps(surface, overhead)
        return surface, overhead

    def _forward_loss(self, params, batch_stats, batch, rng, train: bool):
        surface, overhead = self._preprocess(batch, rng, train)
        # mutable=False (not []) when frozen: an empty COLLECTION still makes
        # flax return an (out, vars) tuple, which silently fed tuples into
        # the loss on the eval path
        mutable = ["batch_stats"] if train else False
        # Padded straggler rows (device_prefetch) must not contaminate
        # train-mode BatchNorm statistics — mask them out of the stats.
        valid = batch.get("valid")
        out_s = self.surface_model.apply(
            {"params": params["surface"], "batch_stats": batch_stats["surface"]},
            surface, train=train, valid=valid, mutable=mutable,
        )
        out_o = self.overhead_model.apply(
            {"params": params["overhead"], "batch_stats": batch_stats["overhead"]},
            overhead, train=train, valid=valid, mutable=mutable,
        )
        if train:
            s_emb, vars_s = out_s
            o_emb, vars_o = out_o
            new_stats = {
                "surface": vars_s["batch_stats"],
                "overhead": vars_o["batch_stats"],
            }
        else:
            s_emb, o_emb = out_s, out_o
            new_stats = batch_stats
        loss = exhaustive_minibatch_triplet_loss(
            s_emb, o_emb,
            soft_margin=self.cfg.match.soft_margin,
            alpha=self.cfg.match.alpha,
            margin=self.cfg.match.margin,
            valid=batch.get("valid"),
        )
        return loss, new_stats, (s_emb, o_emb)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: TrainState, batch, rng):
        def loss_fn(params):
            loss, new_stats, _ = self._forward_loss(
                params, state.batch_stats, batch, rng, train=True
            )
            return loss, new_stats

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        tx = self.optimizer(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=new_stats,
            opt_state=opt_state,
        )
        return new_state, {"loss": loss}

    @functools.partial(jax.jit, static_argnums=0)
    def eval_step(self, state: TrainState, batch, rng):
        loss, _, _ = self._forward_loss(
            state.params, state.batch_stats, batch, rng, train=False
        )
        return {"loss": loss}

    @functools.partial(jax.jit, static_argnums=0)
    def embed_step(self, state: TrainState, batch, rng=None):
        """Embed for eval. The reference rotates at eval too; pass an rng to
        reproduce that (seeded), or None for deterministic embedding."""
        if rng is None:
            rng = jax.random.PRNGKey(0)
        _, _, (s_emb, o_emb) = self._forward_loss(
            state.params, state.batch_stats, batch, rng, train=False
        )
        return s_emb, o_emb


class SafaPipeline:
    """VGG16+SAFA global-embedding pipeline (BASELINE.json's baseline-family
    tower description): FOV-style preprocessing (crop/normalize/polar), twin
    SAFA towers emitting unit vectors, soft-margin triplet loss on the
    in-batch Euclidean distance matrix; plain Euclidean retrieval eval."""

    def __init__(self, cfg: ExperimentConfig):
        assert isinstance(cfg.model, SafaModelConfig)
        self.cfg = cfg
        from witw_tpu.models.safa import VggSafa

        self.surface_model = VggSafa(cfg.model, circ_padding=False)
        self.overhead_model = VggSafa(cfg.model, circ_padding=True)
        self._tx: Optional[optax.GradientTransformation] = None

    def init(self, rng: jax.Array) -> TrainState:
        d = self.cfg.data
        sw = d.surface_width
        k1, k2 = jax.random.split(rng)
        v_s = self.surface_model.init(k1, jnp.zeros((1, d.surface_height, sw, d.channels)))
        v_o = self.overhead_model.init(
            k2, jnp.zeros((1, d.surface_height, d.surface_width_max, d.channels))
        )
        params = {"surface": v_s["params"], "overhead": v_o["params"]}
        tx = self.optimizer(params)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats={},
            opt_state=tx.init(params),
        )

    def optimizer(self, params) -> optax.GradientTransformation:
        if self._tx is None:
            from witw_tpu.models.safa import safa_trainable_mask

            mask = {
                "surface": safa_trainable_mask(params["surface"], self.cfg.model),
                "overhead": safa_trainable_mask(params["overhead"], self.cfg.model),
            }
            labels = jax.tree.map(lambda t: "train" if t else "freeze", mask)
            self._tx = optax.multi_transform(
                {"train": _adam(self.cfg), "freeze": optax.set_to_zero()}, labels
            )
        return self._tx

    # SAFA shares the FOV family's preprocessing (crop -> normalize; polar
    # overhead supplies the rough alignment the global embedding relies on).
    _preprocess = FovPipeline._preprocess

    def _forward_loss(self, params, batch, rng, train: bool):
        crop_rng, _ = jax.random.split(rng)
        surface, polar = self._preprocess(batch, crop_rng, train)
        s_emb = self.surface_model.apply({"params": params["surface"]}, surface, train=train)
        o_emb = self.overhead_model.apply({"params": params["overhead"]}, polar, train=train)
        from witw_tpu.match.losses import pairwise_sq_distances

        d2 = pairwise_sq_distances(o_emb, s_emb)  # [B_o, B_s]
        loss = dsm_triplet_loss(
            d2, alpha=self.cfg.match.alpha, valid=batch.get("valid")
        )
        return loss, (s_emb, o_emb)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: TrainState, batch, rng):
        def loss_fn(params):
            loss, _ = self._forward_loss(params, batch, rng, train=True)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        tx = self.optimizer(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params, opt_state=opt_state), {
            "loss": loss
        }

    @functools.partial(jax.jit, static_argnums=0)
    def eval_step(self, state: TrainState, batch, rng):
        loss, _ = self._forward_loss(state.params, batch, rng, train=False)
        return {"loss": loss}

    @functools.partial(jax.jit, static_argnums=0)
    def embed_step(self, state: TrainState, batch, rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        surface, polar = self._preprocess(batch, rng, train=False)
        s_emb = self.surface_model.apply({"params": state.params["surface"]}, surface)
        o_emb = self.overhead_model.apply({"params": state.params["overhead"]}, polar)
        return s_emb, o_emb


def make_pipeline(cfg: ExperimentConfig):
    if isinstance(cfg.model, FovDsmModelConfig):
        return FovPipeline(cfg)
    if isinstance(cfg.model, BaselineModelConfig):
        return BaselinePipeline(cfg)
    if isinstance(cfg.model, SafaModelConfig):
        return SafaPipeline(cfg)
    raise TypeError(f"unknown model config: {type(cfg.model)}")

#!/usr/bin/env python
"""Isolate the optimizer's share of the train step: full step time with
adam (current), adam with bf16 first moment, and sgd (lower bound)."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from witw_tpu.configs import fov_experiment
from witw_tpu.models.fov_dsm import fov_dsm_trainable_mask
from witw_tpu.train.pipeline import make_pipeline

BATCH = 64
STEPS = 4


def build(pipeline, tx):
    def train_step(state, batch, rng):
        def loss_fn(params):
            loss, aux = pipeline._forward_loss(params, batch, rng, train=True)
            return loss, aux

        (loss, _aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state["params"])
        updates, opt_state = tx.update(grads, state["opt"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        return {"params": params, "opt": opt_state}, loss

    @jax.jit
    def run(state, surf, over):
        def body(st, xs):
            s, o = xs
            st, loss = train_step(st, {"surface": s, "overhead": o}, jax.random.PRNGKey(1))
            return st, loss
        st, losses = jax.lax.scan(body, state, (surf, over))
        return losses

    return run


def main():
    cfg = fov_experiment(dataset="cvusa", fov=360)
    pipeline = make_pipeline(cfg)
    state0 = pipeline.init(jax.random.PRNGKey(0))
    params = state0.params
    np.asarray(jax.tree.leaves(params)[0])
    d = cfg.data
    rng = np.random.default_rng(0)
    surf = jnp.asarray(rng.uniform(
        0, 255, (STEPS, BATCH, d.surface_height, d.surface_width_max, 3)).astype(np.float32))
    over = jnp.asarray(rng.uniform(
        0, 255, (STEPS, BATCH, d.overhead_size, d.overhead_size, 3)).astype(np.float32))

    mask = {
        "surface": fov_dsm_trainable_mask(params["surface"], cfg.model),
        "overhead": fov_dsm_trainable_mask(params["overhead"], cfg.model),
    }
    labels = jax.tree.map(lambda t: "train" if t else "freeze", mask)
    o = cfg.train.optim

    variants = {
        "adam (current)": optax.adam(o.learning_rate, b1=o.b1, b2=o.b2, eps=o.eps),
        "adam mu_dtype=bf16": optax.adam(
            o.learning_rate, b1=o.b1, b2=o.b2, eps=o.eps, mu_dtype=jnp.bfloat16
        ),
        "sgd (bound)": optax.sgd(o.learning_rate),
    }
    for name, inner in variants.items():
        tx = optax.multi_transform({"train": inner, "freeze": optax.set_to_zero()}, labels)
        st = {"params": params, "opt": tx.init(params)}
        run = build(pipeline, tx)
        np.asarray(run(st, surf, over))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(st, surf, over))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:22s}: {best*1e3/STEPS:7.2f} ms/step  "
              f"{BATCH*STEPS/best:6.0f} pairs/s", flush=True)


if __name__ == "__main__":
    main()

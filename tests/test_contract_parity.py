"""Dual-framework train->test DRIVER-CONTRACT parity (VERDICT r3 #2).

test_train_parity pins individual training-step numerics; this pins the whole
reference driver contract (reference model/cvig_fov.py:385-487 train(),
:490-575 test()) against a torch transcription running the same contract from
the same init on the same synthetic data:

- multiple epochs, each with a train phase (Adam steps over every train
  batch, optimizer state persisting across epochs) and a val phase
  (count-weighted average eval loss),
- best-checkpoint selection keyed on the val-phase loss (strict <, first
  epoch always best — cvig_fov.py:482-487),
- then test(): embed the whole test set with the SELECTED (best) weights,
  full distance matrix, ranks with ties counting within one matrix
  (cvig_fov.py:552), and the reference metric suite (cvig_fov.py:553-567).

The witw_tpu side runs the REAL train()/test() drivers with a real
Checkpointer (best save -> restore round trip) and MetricWriter (per-epoch
losses read back from metrics.jsonl) — not a re-implementation of the loop.
Dropout off and random_orientation off so both sides are deterministic.
"""

import json
import os

import numpy as np
import jax
import pytest

from witw_tpu.configs import (
    DataConfig,
    DatasetConfig,
    EvalConfig,
    ExperimentConfig,
    FovDsmModelConfig,
    OptimConfig,
    TrainConfig,
)
from witw_tpu.evaluation.gallery import metrics_from_ranks
from witw_tpu.train.checkpoint import Checkpointer
from witw_tpu.train.loop import test as run_test
from witw_tpu.train.loop import train as run_train
from witw_tpu.train.metrics import MetricWriter
from witw_tpu.train.pipeline import make_pipeline

torch = pytest.importorskip("torch")

from tests.test_golden_e2e import torch_match_oracle  # noqa: E402
from tests.test_train_parity import (  # noqa: E402
    _torch_match_loss,
    _torch_params,
    _torch_tower,
)

H_S, W_S, S_O = 32, 64, 32
BATCH = 4
N_EPOCHS = 3
LR = 3e-4  # large enough that the val trajectory actually moves in 3 epochs


def _make_batches(rng, n_batches):
    out = []
    for _ in range(n_batches):
        out.append({
            "surface": rng.integers(
                0, 256, (BATCH, H_S, W_S, 3)).astype(np.float32),
            "overhead": rng.integers(
                0, 256, (BATCH, S_O, S_O, 3)).astype(np.float32),
        })
    return out


def _cfg(tmp_path):
    ds = DatasetConfig(name="cvusa", train_csv="", test_csv="", panorama=True)
    return ExperimentConfig(
        data=DataConfig(
            dataset=ds, surface_height=H_S, surface_width_max=W_S,
            overhead_size=S_O, fov=360, random_orientation=False,
        ),
        model=FovDsmModelConfig(compute_dtype="float32", dropout_rate=0.0),
        train=TrainConfig(
            batch_size=BATCH, num_epochs=N_EPOCHS,
            optim=OptimConfig(learning_rate=LR),
            checkpoint_dir=str(tmp_path / "ckpt"),
        ),
        eval=EvalConfig(query_block=8, gallery_chunk=8),
    )


def _preprocess_torch_inputs(pipeline, batches):
    """Run each batch through the (deterministic, parameter-free, separately
    oracle-pinned) preprocessing once; both frameworks' towers then consume
    identical inputs — same sharing contract as test_train_parity."""
    import jax.numpy as jnp

    out = []
    for b in batches:
        s_in, p_in = pipeline._preprocess(
            {k: jnp.asarray(v) for k, v in b.items()},
            jax.random.PRNGKey(0), train=False,
        )
        out.append((
            torch.tensor(np.transpose(np.asarray(s_in), (0, 3, 1, 2))),
            torch.tensor(np.transpose(np.asarray(p_in), (0, 3, 1, 2))),
        ))
    return out


def _epoch_losses_from_jsonl(logdir):
    """Final running-average 'train loss'/'val loss' point of each epoch:
    run_phase logs the running average at every step, so the LAST point per
    epoch (global step = epoch*len(loader)+last_batch) is the epoch average
    (train/loop.py:98-118)."""
    per_tag = {}
    with open(os.path.join(logdir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("tag") in ("train loss", "val loss"):
                per_tag.setdefault(rec["tag"], {})[rec["step"]] = rec["value"]
    out = {}
    for tag, pts in per_tag.items():
        steps = sorted(pts)
        # epochs share the step numbering via step_base; the last point of
        # each contiguous len(loader)-sized group is that epoch's average
        n_per = max(steps) // N_EPOCHS + 1 if steps else 0
        out[tag] = [pts[(e + 1) * n_per - 1] for e in range(N_EPOCHS)]
    return out["train loss"], out["val loss"]


@pytest.mark.slow
def test_train_test_contract_matches_torch(rng, tmp_path):
    cfg = _cfg(tmp_path)
    pipeline = make_pipeline(cfg)

    train_batches = _make_batches(rng, 2)
    val_batches = _make_batches(rng, 1)
    test_batches = _make_batches(rng, 2)

    # Replicate train()'s init-rng derivation so the torch side starts from
    # the IDENTICAL weights (train/loop.py:190-192).
    base = jax.random.PRNGKey(cfg.train.seed)
    _, init_rng = jax.random.split(base)
    params0 = jax.tree.map(np.asarray, pipeline.init(init_rng).params)

    # --- witw_tpu: the real drivers ---
    writer = MetricWriter(str(tmp_path / "logs"))
    ckpt = Checkpointer(cfg.train.checkpoint_dir, keep=2)
    run_train(cfg, pipeline, train_batches, val_batches,
              checkpointer=ckpt, writer=writer, verbose=False)
    writer.close()
    jax_train, jax_val = _epoch_losses_from_jsonl(str(tmp_path / "logs"))
    best_meta = ckpt.meta("best")
    results = run_test(cfg, pipeline, test_batches, checkpointer=ckpt,
                       verbose=False)

    # --- torch transcription of the same contract ---
    tp_s, train_s = _torch_params(params0["surface"])
    tp_o, train_o = _torch_params(params0["overhead"])
    opt = torch.optim.Adam(train_s + train_o, lr=LR, betas=(0.9, 0.999),
                           eps=1e-8)
    tr_in = _preprocess_torch_inputs(pipeline, train_batches)
    va_in = _preprocess_torch_inputs(pipeline, val_batches)
    te_in = _preprocess_torch_inputs(pipeline, test_batches)

    def phase_loss(inputs, train):
        tot, cnt = 0.0, 0
        for s_t, p_t in inputs:
            ctx = torch.enable_grad() if train else torch.no_grad()
            with ctx:
                loss = _torch_match_loss(
                    _torch_tower(tp_o, p_t, circ=True),
                    _torch_tower(tp_s, s_t, circ=False),
                )
                if train:
                    opt.zero_grad()
                    loss.backward()
                    opt.step()
            tot += float(loss) * s_t.shape[0]
            cnt += s_t.shape[0]
        return tot / cnt

    torch_train, torch_val = [], []
    best_loss, best_epoch, best_params = None, None, None
    for epoch in range(N_EPOCHS):
        torch_train.append(phase_loss(tr_in, train=True))
        v = phase_loss(va_in, train=False)
        torch_val.append(v)
        if best_loss is None or v < best_loss:  # cvig_fov.py:482-487
            best_loss, best_epoch = v, epoch
            best_params = {
                t: {k: (w.detach().clone(), b.detach().clone())
                    for k, (w, b) in tp.items()}
                for t, tp in (("surface", tp_s), ("overhead", tp_o))
            }

    # per-epoch loss trajectories (both phases)
    np.testing.assert_allclose(jax_train, torch_train, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(jax_val, torch_val, rtol=1e-3, atol=1e-5)
    # the checkpointed best val loss and its value
    np.testing.assert_allclose(
        best_meta["val_loss"], best_loss, rtol=1e-3, atol=1e-5)

    # --- torch test(): embed the test set with the BEST weights ---
    with torch.no_grad():
        s_embs, o_embs = [], []
        for s_t, p_t in te_in:
            s_embs.append(_torch_tower(
                best_params["surface"], s_t, circ=False).numpy())
            o_embs.append(_torch_tower(
                best_params["overhead"], p_t, circ=True).numpy())
    s_emb = np.transpose(np.concatenate(s_embs), (0, 2, 3, 1))  # NHWC
    o_emb = np.transpose(np.concatenate(o_embs), (0, 2, 3, 1))
    d, _ = torch_match_oracle(o_emb, s_emb)
    n = d.shape[1]
    want_ranks = np.array(
        [np.sum(d[:, q] <= d[q, q]) for q in range(n)])  # cvig_fov.py:552
    want_metrics = metrics_from_ranks(want_ranks)

    # test() restored the best checkpoint and computed the same metric dict
    assert results.keys() == want_metrics.keys()
    for key in want_metrics:
        np.testing.assert_allclose(
            results[key], want_metrics[key], rtol=1e-6, err_msg=key)

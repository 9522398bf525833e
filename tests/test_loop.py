"""Shared train-loop runtime (train/loop.py): graceful stop, exact
mid-epoch resume, per-step journaling.

The reference resumes only at epoch granularity (reference
tools/train_vidvrd.py:128-147); our loop checkpoints (epoch,
batch_in_epoch) on a graceful stop and fast-forwards the deterministic
epoch stream on resume, so an interrupted+resumed run is BIT-EQUAL to an
uninterrupted one — the property the on-chip soak harness
(scripts/soak_train.py) asserts through the real CLIs.
"""
import json
import logging
import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from vidsgg_big_tpu.train.loop import run_epochs
from vidsgg_big_tpu.train.train_state import (
    TrainState, create_train_state, load_checkpoint,
    load_checkpoint_position)
from vidsgg_big_tpu.utils.logger import MetricWriter


def _toy():
    """Deterministic toy problem whose step consumes the per-step rng."""
    tx = optax.adam(1e-2)

    @jax.jit
    def step(state, batch, rng):
        x, y = batch

        def loss_fn(p):
            noise = 0.01 * jax.random.normal(rng, y.shape)
            return jnp.mean((x @ p["w"] - y + noise) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads, tx), {"total": loss}

    def epoch_stream(epoch, skip):
        def gen():
            for i in range(5):
                if i < skip:
                    continue
                r = np.random.default_rng(1000 * epoch + i)
                x = jnp.asarray(r.normal(size=(8, 4)), jnp.float32)
                y = jnp.asarray(r.normal(size=(8, 3)), jnp.float32)
                yield (x, y)
        return gen()

    params = {"w": jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 3)), jnp.float32)}
    return tx, step, epoch_stream, params


def _writer_logger(tmp, name):
    d = tmp / name
    os.makedirs(d, exist_ok=True)
    logger = logging.getLogger(f"test_loop_{name}")
    logger.addHandler(logging.NullHandler())
    return MetricWriter(str(d)), logger, str(d)


def _journal(log_dir, tag):
    out = {}
    with open(os.path.join(log_dir, "metrics.jsonl")) as f:
        for line in f:
            r = json.loads(line)
            if r["tag"] == tag:
                out[r["step"]] = r["value"]
    return out


def test_midepoch_stop_resume_bitequal(tmp_path):
    tx, step, epoch_stream, params = _toy()
    rng = jax.random.PRNGKey(7)

    # straight: 3 epochs x 5 batches = 15 steps
    w_a, log_a, dir_a = _writer_logger(tmp_path, "a")
    state_a = run_epochs(
        create_train_state(params, tx), step, epoch_stream,
        start_epoch=0, total_epoch=3, base_rng=rng, writer=w_a,
        logger=log_a, ckpt_dir=str(tmp_path / "ck_a"), ckpt_every=10)
    w_a.close()
    assert int(state_a.step) == 15

    # interrupted mid-epoch-1 (after 7 batches: epoch 1, batch 2)
    w_b, log_b, dir_b = _writer_logger(tmp_path, "b")
    ck_b = str(tmp_path / "ck_b")
    state_b = run_epochs(
        create_train_state(params, tx), step, epoch_stream,
        start_epoch=0, total_epoch=3, base_rng=rng, writer=w_b,
        logger=log_b, ckpt_dir=ck_b, ckpt_every=10, stop_after_batches=7)
    assert int(state_b.step) == 7
    epoch, batch = load_checkpoint_position(ck_b, 7)
    assert (epoch, batch) == (1, 2)

    template = create_train_state(params, tx)
    restored, it = load_checkpoint(ck_b, template)
    assert it == 7
    state_b2 = run_epochs(
        restored, step, epoch_stream, start_epoch=epoch, total_epoch=3,
        base_rng=rng, writer=w_b, logger=log_b, ckpt_dir=ck_b,
        ckpt_every=10, start_batch=batch)
    w_b.close()
    assert int(state_b2.step) == 15

    # bit-equal final params and bit-equal per-step loss journal
    np.testing.assert_array_equal(np.asarray(state_a.params["w"]),
                                  np.asarray(state_b2.params["w"]))
    ja, jb = _journal(dir_a, "loss/total"), _journal(dir_b, "loss/total")
    assert set(ja) == set(jb) == set(range(1, 16))
    for k in ja:
        assert ja[k] == jb[k], (k, ja[k], jb[k])


def test_preput_pipelining_bitequal(tmp_path):
    """The main-thread H2D lookahead (``preput``) is numerics-free: a run
    with preput=device_put journals bit-identical per-step losses to one
    without, sees every batch exactly once, and stops/resumes at the same
    position."""
    tx, step, epoch_stream, params = _toy()
    rng = jax.random.PRNGKey(7)

    w_a, log_a, dir_a = _writer_logger(tmp_path, "pa")
    state_a = run_epochs(
        create_train_state(params, tx), step, epoch_stream,
        start_epoch=0, total_epoch=2, base_rng=rng, writer=w_a,
        logger=log_a, ckpt_dir=str(tmp_path / "ck_pa"), ckpt_every=10)
    w_a.close()

    n_preput = [0]

    def preput(batch):
        n_preput[0] += 1
        return jax.device_put(batch)

    w_b, log_b, dir_b = _writer_logger(tmp_path, "pb")
    state_b = run_epochs(
        create_train_state(params, tx), step, epoch_stream,
        start_epoch=0, total_epoch=2, base_rng=rng, writer=w_b,
        logger=log_b, ckpt_dir=str(tmp_path / "ck_pb"), ckpt_every=10,
        preput=preput)
    w_b.close()
    assert n_preput[0] == 10                      # every batch, exactly once
    np.testing.assert_array_equal(np.asarray(state_a.params["w"]),
                                  np.asarray(state_b.params["w"]))
    ja, jb = _journal(dir_a, "loss/total"), _journal(dir_b, "loss/total")
    assert ja == jb and set(ja) == set(range(1, 11))

    # graceful stop mid-epoch with preput: position sidecar unchanged
    # (n_done counts dispatched steps, not the looked-ahead pull)
    w_c, log_c, _ = _writer_logger(tmp_path, "pc")
    ck_c = str(tmp_path / "ck_pc")
    state_c = run_epochs(
        create_train_state(params, tx), step, epoch_stream,
        start_epoch=0, total_epoch=2, base_rng=rng, writer=w_c,
        logger=log_c, ckpt_dir=ck_c, ckpt_every=10, preput=preput,
        stop_after_batches=7)
    w_c.close()
    assert int(state_c.step) == 7
    assert load_checkpoint_position(ck_c, 7) == (1, 2)


def test_stop_at_epoch_boundary_resume(tmp_path):
    """A stop landing exactly on an epoch boundary resumes cleanly (the
    resumed epoch's stream is empty; training continues with the next)."""
    tx, step, epoch_stream, params = _toy()
    rng = jax.random.PRNGKey(7)
    w, log, d = _writer_logger(tmp_path, "c")
    ck = str(tmp_path / "ck_c")
    state = run_epochs(
        create_train_state(params, tx), step, epoch_stream,
        start_epoch=0, total_epoch=2, base_rng=rng, writer=w, logger=log,
        ckpt_dir=ck, ckpt_every=10, stop_after_batches=5)
    assert int(state.step) == 5
    epoch, batch = load_checkpoint_position(ck, 5)
    assert (epoch, batch) == (0, 5)
    restored, _ = load_checkpoint(ck, create_train_state(params, tx))
    state2 = run_epochs(
        restored, step, epoch_stream, start_epoch=epoch, total_epoch=2,
        base_rng=rng, writer=w, logger=log, ckpt_dir=ck, ckpt_every=10,
        start_batch=batch)
    w.close()
    assert int(state2.step) == 10


def test_sigterm_latches_stop(tmp_path):
    """install_stop_handler latches SIGTERM without killing the process."""
    import signal

    from vidsgg_big_tpu.train.loop import install_stop_handler

    prev_term = signal.getsignal(signal.SIGTERM)
    prev_int = signal.getsignal(signal.SIGINT)
    try:
        should_stop = install_stop_handler()
        assert not should_stop()
        os.kill(os.getpid(), signal.SIGTERM)
        assert should_stop()
    finally:
        signal.signal(signal.SIGTERM, prev_term)
        signal.signal(signal.SIGINT, prev_int)

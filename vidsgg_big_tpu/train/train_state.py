"""Optimizer, LR schedule, train state, checkpointing.

Training recipe matches the reference drivers (reference
tools/train_vidvrd.py:123-164): Adam, MultiStep LR with epoch milestones
converted to iterations, global-norm gradient clipping at 5.0, checkpoints
carrying {step, params, opt_state} (orbax instead of torch .pth).
"""
from __future__ import annotations

import os
from typing import Any, Sequence

import jax
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any

    def apply_gradients(self, grads, tx):
        updates, opt_state = tx.update(grads, self.opt_state, self.params)
        params = optax.apply_updates(self.params, updates)
        return TrainState(step=self.step + 1, params=params,
                          opt_state=opt_state)


def milestone_schedule(initial_lr: float, lr_decay: float,
                       milestones_iters: Sequence[int]):
    """MultiStepLR: multiply by lr_decay at each milestone iteration."""
    return optax.piecewise_constant_schedule(
        initial_lr, {int(m): lr_decay for m in milestones_iters})


def make_optimizer(initial_lr: float, lr_decay: float,
                   milestones_iters: Sequence[int],
                   grad_clip: float = 5.0):
    sched = milestone_schedule(initial_lr, lr_decay, milestones_iters)
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adam(sched),
    ), sched


def create_train_state(params, tx) -> TrainState:
    import jax.numpy as jnp
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params))


# --------------------------- checkpointing ---------------------------------

def save_checkpoint(ckpt_dir: str, state: TrainState, step: int,
                    keep: int = 5, epoch: int | None = None,
                    batch_in_epoch: int = 0):
    """Save the train state; ``epoch`` (the next epoch to train) is stored
    in a json sidecar because it is NOT derivable from ``step``: the
    streaming bucketed epochs emit a per-epoch step count that depends on
    how records landed in buckets (partial flushes, remainder padding), so
    ``step // (len(dataset) // batch_size)`` over-counts and would skip
    epochs on resume (the reference stores ``crt_epoch`` in its .pth for
    the same reason, reference tools/train_vidvrd.py:30-38).

    ``batch_in_epoch`` > 0 marks a graceful mid-epoch stop: ``epoch`` then
    names the *interrupted* epoch and resume fast-forwards its deterministic
    batch stream by ``batch_in_epoch`` (train/loop.py)."""
    import orbax.checkpoint as ocp
    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(
            ckpt_dir, options=ocp.CheckpointManagerOptions(max_to_keep=keep)
    ) as mngr:
        mngr.save(step, args=ocp.args.StandardSave(state))
        kept = set(mngr.all_steps())
    if epoch is not None:
        import json
        # atomic write: a kill mid-dump must not leave a truncated sidecar
        path = os.path.join(ckpt_dir, f"meta_{step}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"step": step, "epoch": epoch,
                       "batch_in_epoch": int(batch_in_epoch)}, f)
        os.replace(tmp, path)
    # prune sidecars of checkpoints orbax's max_to_keep already deleted
    import glob
    for p in glob.glob(os.path.join(ckpt_dir, "meta_*.json")):
        try:
            s = int(os.path.basename(p)[5:-5])
        except ValueError:
            continue
        if s not in kept:
            try:
                os.remove(p)
            except OSError:
                pass


def load_checkpoint(ckpt_dir: str, template: TrainState,
                    step: int | None = None) -> tuple[TrainState, int]:
    import orbax.checkpoint as ocp
    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(ckpt_dir) as mngr:
        step = mngr.latest_step() if step is None else step
        state = mngr.restore(step, args=ocp.args.StandardRestore(template))
    return state, step


def load_checkpoint_epoch(ckpt_dir: str, step: int) -> int | None:
    """Epoch recorded by :func:`save_checkpoint`, or None for checkpoints
    written before the sidecar existed (callers fall back to the old
    step-division estimate)."""
    epoch, _ = load_checkpoint_position(ckpt_dir, step)
    return epoch


def load_checkpoint_position(ckpt_dir: str, step: int) \
        -> tuple[int | None, int]:
    """``(epoch, batch_in_epoch)`` from the sidecar; ``(None, 0)`` when the
    sidecar is missing or corrupt (pre-sidecar checkpoints)."""
    import json
    path = os.path.join(os.path.abspath(ckpt_dir), f"meta_{step}.json")
    if not os.path.exists(path):
        return None, 0
    try:
        with open(path) as f:
            d = json.load(f)
        return d["epoch"], int(d.get("batch_in_epoch", 0))
    except (json.JSONDecodeError, KeyError, ValueError, OSError):
        return None, 0    # corrupt sidecar: fall back like a missing one

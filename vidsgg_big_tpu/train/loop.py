"""Shared training-loop runtime for the CLI drivers.

Centralizes what the reference scatters through its per-tool epoch loops
(reference tools/train_vidvrd.py:144-189, tools/train_vidor.py:298-336,
498-636) and adds the production pieces the reference lacks:

* **Graceful stop**: SIGTERM/SIGINT latch checked at step boundaries; on
  stop the loop checkpoints its exact position and exits cleanly.  Killing
  an axon client mid-transfer wedges the remote TPU worker (CLAUDE.md), so
  ``timeout``-driven soaks terminate through this path instead.
* **Exact mid-epoch resume**: the checkpoint sidecar carries
  ``(epoch, batch_in_epoch)``; on resume the epoch's deterministic batch
  stream (seeded shuffle + deterministic bucketing) is fast-forwarded by
  ``batch_in_epoch`` and training continues bit-identically to an
  uninterrupted run.  (The reference resumes only at epoch granularity,
  reference tools/train_vidvrd.py:128-147.)
* **Deterministic per-step RNG**: dropout keys are ``fold_in(base, it)``
  of the *global* step, not sequential splits, so a resumed run draws the
  same stream an uninterrupted run would.
* **Lagged metric fetch**: fetching a device scalar costs a ~25 ms tunnel
  round-trip on axon; the loop journals step N-1's metrics after
  dispatching step N, overlapping the fetch with device compute.  Per-step
  ``loss/total`` and ``time/step_ms`` land in metrics.jsonl (full float
  precision — the soak harness asserts bit-equality on them).
* **Main-thread H2D pipelining** (``preput``): axon forbids
  background-thread ``device_put`` (it serializes against the tunnel and
  stalls ~20x — data/prefetch.py), so the H2D copy must ride the main
  thread.  The loop runs one batch ahead: dispatch step N, then pull +
  ``preput`` (device_put/shard) batch N+1, then fetch step N-1's metrics —
  packing (producer thread), the N+1 transfer, the N-1 fetch, and step N's
  device compute all overlap.
"""
from __future__ import annotations

import signal
import time
from typing import Callable, Iterable, Optional, Sequence

import numpy as np
import jax

from .train_state import TrainState, save_checkpoint


def install_stop_handler(logger=None) -> Callable[[], bool]:
    """Latch SIGTERM/SIGINT; returns ``should_stop()``.

    The first signal requests a graceful stop (finish the in-flight step,
    checkpoint, exit 0); a second signal restores the default disposition so
    a stuck process can still be killed."""
    flag = {"stop": False}

    def handler(signum, frame):
        if flag["stop"]:            # second signal: give up gracefully
            signal.signal(signum, signal.SIG_DFL)
            raise KeyboardInterrupt
        flag["stop"] = True
        if logger is not None:
            logger.info(f"signal {signum}: stopping at the next step "
                        "boundary (checkpoint will be written)")

    for s in (signal.SIGTERM, signal.SIGINT):
        signal.signal(s, handler)
    return lambda: flag["stop"]


def run_epochs(state: TrainState, run_step, epoch_stream, *,
               start_epoch: int, total_epoch: int, base_rng, writer, logger,
               ckpt_dir: str, ckpt_every: int,
               start_batch: int = 0,
               journal_every: int = 10,
               extra_metrics: Sequence[str] = (),
               log_extra: Optional[Callable[[int], str]] = None,
               should_stop: Optional[Callable[[], bool]] = None,
               preput: Optional[Callable] = None,
               stop_after_batches: int = 0) -> TrainState:
    """Drive ``run_step`` over ``epoch_stream`` with checkpoint/resume.

    Args:
      run_step: ``(state, batch, rng) -> (state, metrics)``; ``metrics`` must
        contain ``"total"`` (device scalars are fine — fetched lazily).
      epoch_stream: ``(epoch, skip) -> iterable of batches``.  ``skip`` > 0
        only on the first (resumed) epoch; implementations fast-forward the
        deterministic stream by that many batches (islice before prefetch).
      start_batch: batches already consumed in ``start_epoch`` (sidecar).
      extra_metrics: metric keys journaled every ``journal_every`` steps.
      log_extra: optional ``it -> str`` appended to the periodic log line.
      preput: optional ``batch -> batch`` run on the MAIN thread one batch
        ahead of its step (device_put/shard_batch of the array leaves).
        With it, the H2D copy of batch N+1 is issued while the device runs
        step N — the only legal H2D/compute overlap on axon, where the
        producer thread must not transfer (data/prefetch.py).
      stop_after_batches: debug/test hook — behave as if SIGTERM arrived
        after this many batches (0 = never).
    """
    should_stop = should_stop or (lambda: False)
    it = int(state.step)
    total_batches = 0
    if log_extra is not None:
        log_extra(it)   # warm lazily-jitted formatters (e.g. the lr
        #                 schedule's scalar ops) so their one-time compiles
        #                 never land mid-run and trip recompile monitors

    pending = None          # (it, metrics, epoch) awaiting its lagged fetch
    t_prev = [time.perf_counter()]

    def flush_pending(losses):
        nonlocal pending
        if pending is None:
            return
        p_it, m, p_epoch = pending
        pending = None
        loss = float(m["total"])            # blocks until the step is done
        now = time.perf_counter()
        losses.append(loss)
        writer.add_scalar("loss/total", loss, p_it)
        writer.add_scalar("time/step_ms", (now - t_prev[0]) * 1000.0, p_it)
        t_prev[0] = now
        if p_it % journal_every == 0:
            parts = []
            for k in extra_metrics:
                v = float(m[k])
                writer.add_scalar(f"loss/{k}", v, p_it)
                parts.append(f"{k}={v:.4f}")
            tail = f" {log_extra(p_it)}" if log_extra is not None else ""
            logger.info(f"epoch {p_epoch} it {p_it} loss {loss:.4f} "
                        + " ".join(parts) + tail)

    for epoch in range(start_epoch, total_epoch):
        t0 = time.time()
        skip = start_batch if epoch == start_epoch else 0
        if skip:
            logger.info(f"resume: fast-forwarding {skip} batches of "
                        f"epoch {epoch}")
        losses: list = []
        n_done = skip
        stopped = False
        t_prev[0] = time.perf_counter()
        stream = iter(epoch_stream(epoch, skip))
        _END = object()

        def pull():
            nxt = next(stream, _END)
            if preput is not None and nxt is not _END:
                nxt = preput(nxt)           # main-thread H2D, one ahead
            return nxt

        nxt = pull()
        while nxt is not _END:
            batch, nxt = nxt, None
            sub = jax.random.fold_in(base_rng, it)
            state, metrics = run_step(state, batch, sub)    # dispatch N
            it += 1
            n_done += 1
            total_batches += 1
            nxt = pull()                    # pack + H2D N+1 while N runs
            flush_pending(losses)           # fetch step N-1 while N runs
            pending = (it, metrics, epoch)
            if should_stop() or (stop_after_batches and
                                 total_batches >= stop_after_batches):
                stopped = True
                break
        if stopped and hasattr(stream, "close"):
            stream.close()                  # release the prefetch producer
        flush_pending(losses)
        if stopped:
            save_checkpoint(ckpt_dir, jax.device_get(state), it,
                            epoch=epoch, batch_in_epoch=n_done)
            logger.info(f"graceful stop: checkpoint at {ckpt_dir} "
                        f"(step {it}, epoch {epoch}, batch {n_done})")
            return state
        if losses:
            writer.add_scalar("loss/epoch_mean", float(np.mean(losses)),
                              epoch)
        logger.info(f"epoch {epoch} done in {time.time() - t0:.1f}s, "
                    f"mean loss {np.mean(losses) if losses else float('nan'):.4f}")
        writer.flush()
        if (epoch + 1) % ckpt_every == 0 or epoch + 1 == total_epoch:
            save_checkpoint(ckpt_dir, jax.device_get(state), it,
                            epoch=epoch + 1)
            logger.info(f"checkpoint saved at {ckpt_dir} (step {it})")
    return state

"""On-chip training soak + kill/resume rehearsal (VERDICT r3 #2).

Runs the real train CLIs on the TPU against synthetic reference-format data
and verifies the properties the reference proved only implicitly through its
11-24 h production runs (reference tools/train_vidor.py:683-706):

  soak        >= --steps optimizer steps through tools/train_vidvrd.py or
              tools/train_vidor.py --train_grounding; records post-warmup
              step-time p50/p95 (tunnel oscillation included) and asserts
              zero post-warmup recompiles (JAX_LOG_COMPILES).
  kill/resume a second run is SIGTERM'd once its journal shows
              --kill_at_step optimizer steps (the graceful-stop path in
              train/loop.py finishes the in-flight step, checkpoints, and
              exits 0), resumed with --from_checkpoint, and every
              post-resume ``loss/total`` journal entry must be BIT-EQUAL
              to the uninterrupted run at the same global step.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/soak_train.py \
      --mode vidvrd --videos 64 --epochs 12 --kill_at_step 20 \
      --out /tmp/soak_vidvrd.json
  --mode grounding uses tools/train_vidor.py --train_grounding.
  --skip_kill / --skip_soak run half the rehearsal.
"""
import argparse
import json
import os
import re
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def read_journal(outdir, tag):
    path = os.path.join(outdir, "logfile", "metrics.jsonl")
    rows = []
    with open(path) as f:
        for line in f:
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    return rows


def series(rows, tag):
    return {r["step"]: r["value"] for r in rows if r["tag"] == tag}


def run_cli(mode, outdir, extra, *, kill_at_step=None, env_extra=None,
            log_name="run.log", ckpt_every=50, light=False):
    # --feat_dtype float32 pinned: the straight run and the kill/resume
    # pair must ship bit-identical batches for the loss bit-equality check
    # (the bf16-wire default changes the i3d-tail time-average numerics).
    # --light drops --synthetic_model_dims: features stay at the small
    # synthetic default so each step ships ~KBs instead of ~1.2 GB over the
    # tunnel (production dims measured 3.5 s/step wall, entirely H2D-bound;
    # the soak's contracts — zero post-warmup recompiles, graceful stop,
    # bit-equal resume — are geometry-independent, and production-geometry
    # step times are bench.py's job).
    dims = [] if light else ["--synthetic_model_dims"]
    cfg = {"vidvrd": ("tools/train_vidvrd.py",
                      ["--cfg_path", "experiments/exp2/config_.py",
                       "--use_pku", *dims,
                       "--compute_dtype", "bfloat16",
                       "--feat_dtype", "float32"]),
           "grounding": ("tools/train_vidor.py",
                         ["--cfg_path",
                          "experiments/grounding_weights/config_.py",
                          "--train_grounding"])}[mode]
    # orbax saves cost ~20 s each on this host; the graceful-stop path
    # checkpoints on SIGTERM regardless, so a sparse cadence is safe for
    # the kill/resume rehearsal too
    cmd = [sys.executable, cfg[0], *cfg[1], "--output_dir", outdir,
           "--ckpt_every", str(ckpt_every), *extra]
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:/root/.axon_site"
    env["JAX_LOG_COMPILES"] = "1"
    env.update(env_extra or {})
    os.makedirs(outdir, exist_ok=True)
    log = os.path.join(outdir, log_name)
    t0 = time.time()
    with open(log, "w") as f:
        p = subprocess.Popen(cmd, cwd=REPO, env=env,
                             stdout=f, stderr=subprocess.STDOUT)
        if kill_at_step is not None:
            # send SIGTERM only once the journal proves the train loop is
            # live and past kill_at_step optimizer steps — wall-clock
            # deadlines miss the window when startup (compiles, data prep,
            # tunnel) stretches by minutes.  Never SIGKILL: an axon client
            # killed mid-compile/H2D wedges the remote worker (CLAUDE.md).
            sent = False
            while p.poll() is None:
                time.sleep(5)
                if not sent:
                    try:
                        steps = series(read_journal(outdir, ""),
                                       "loss/total")
                    except FileNotFoundError:
                        continue
                    if steps and max(steps) >= kill_at_step:
                        p.send_signal(signal.SIGTERM)
                        sent = True
            assert sent, f"run ended before reaching step {kill_at_step}"
        p.wait()
    dt = time.time() - t0
    print(f"  [{mode}] {' '.join(extra)}: rc={p.returncode} in {dt:.0f}s",
          flush=True)
    return p.returncode, log, dt


def count_recompiles(log_path, after_ts=None):
    """(total, late) counts of 'Compiling <name>' events (JAX_LOG_COMPILES).

    ``late`` counts compile lines whose absl timestamp prefix
    (``WARNING:2026-08-19 10:15:58,778:jax...``) is newer than ``after_ts``
    (a ``time.time()`` float, e.g. the journal ``ts`` of the first
    post-warmup step) — the soak's "zero post-warmup recompiles" assert.
    """
    n_total, n_late = 0, 0
    pat = re.compile(r"Compiling ([\w.<>-]+)")
    ts_pat = re.compile(r":(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}),(\d{3}):")
    with open(log_path) as f:
        for line in f:
            if not pat.search(line):
                continue
            n_total += 1
            if after_ts is None:
                continue
            m = ts_pat.search(line)
            if m is None:
                n_late += 1  # unstamped compile line: count conservatively
                continue
            t = time.mktime(time.strptime(m.group(1), "%Y-%m-%d %H:%M:%S"))
            if t + float(m.group(2)) / 1e3 > after_ts:
                n_late += 1
    return n_total, n_late


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("vidvrd", "grounding"),
                    default="vidvrd")
    ap.add_argument("--videos", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--steps", type=int, default=1000,
                    help="soak target (informational; epochs drive it)")
    ap.add_argument("--batch_size", type=int, default=None)
    ap.add_argument("--kill_at_step", type=int, default=20,
                    help="SIGTERM the kill-rehearsal run once its journal "
                         "records this optimizer step (pick a mid-epoch, "
                         "post-warmup step)")
    ap.add_argument("--kill_epochs", type=int, default=None,
                    help="epoch count for the kill/resume rehearsal "
                         "(default: --epochs).  Legal to shrink: the lr "
                         "schedule is milestone-based and the per-epoch "
                         "stream is seeded by epoch index, so a shorter run "
                         "is a bit-exact prefix of the straight soak")
    ap.add_argument("--warmup_steps", type=int, default=None,
                    help="steps excluded from p50/p95 (default: first "
                         "epoch's worth)")
    ap.add_argument("--light", action="store_true",
                    help="synthetic features at the small default dims "
                         "instead of the model dims (vidvrd production "
                         "feature volume is tunnel-H2D-bound at ~3.5 s/step "
                         "on axon; the soak contracts don't need it)")
    ap.add_argument("--skip_soak", action="store_true")
    ap.add_argument("--skip_kill", action="store_true")
    ap.add_argument("--root", type=str, default="/tmp/soak")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    base = os.path.join(args.root, args.mode)
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base, exist_ok=True)
    syn_root = os.path.join(base, "data")
    common = ["--synthetic", str(args.videos), "--synthetic_root", syn_root,
              "--seed", "0"]
    if args.batch_size:
        common += ["--batch_size", str(args.batch_size)]
    result = {"mode": args.mode, "videos": args.videos,
              "epochs": args.epochs}

    # ---- phase 1: straight soak run ---------------------------------------
    if not args.skip_soak:
        outdir = os.path.join(base, "straight")
        rc, log, dt = run_cli(args.mode, outdir,
                              common + ["--epochs", str(args.epochs)])
        assert rc == 0, f"straight run failed rc={rc}, see {log}"
        rows = read_journal(outdir, "loss/total")
        losses = series(rows, "loss/total")
        times = series(rows, "time/step_ms")
        n_steps = max(losses)
        # one epoch's worth of steps, from the *planned* epoch geometry —
        # deriving it as n_steps // epochs breaks when the run is stopped
        # early (graceful SIGTERM), shrinking the warmup window and
        # misclassifying epoch-0 bucket-shape compiles as recompiles
        per_epoch = -(-args.videos // (args.batch_size or 8))
        warm = args.warmup_steps or max(per_epoch, 1)
        post = [v for k, v in sorted(times.items()) if k > warm]
        post.sort()
        p50 = post[len(post) // 2]
        p95 = post[int(len(post) * 0.95)]
        warm_ts = min(r["ts"] for r in rows
                      if r["tag"] == "loss/total" and r["step"] > warm)
        n_comp, n_late = count_recompiles(log, after_ts=warm_ts)
        result.update(
            steps=n_steps, wall_s=round(dt, 1),
            step_ms_p50=round(p50, 2), step_ms_p95=round(p95, 2),
            warmup_steps_excluded=warm, compiles_total=n_comp,
            compiles_post_warmup=n_late)
        print(f"  soak: {n_steps} steps, p50 {p50:.1f} ms, p95 {p95:.1f} ms,"
              f" {n_comp} compiles ({n_late} post-warmup)", flush=True)
        assert n_late == 0, \
            f"{n_late} recompiles after warmup step {warm} — see {log}"

    # ---- phase 2: kill + resume, bit-equality vs the straight run ---------
    if not args.skip_kill:
        kill_epochs = args.kill_epochs or args.epochs
        outdir = os.path.join(base, "killed")
        rc, log, dt = run_cli(args.mode, outdir,
                              common + ["--epochs", str(kill_epochs)],
                              kill_at_step=args.kill_at_step)
        # the TERM handler finishes the in-flight step, checkpoints, logs
        # "graceful stop", and exits 0
        assert rc == 0, f"killed run did not stop gracefully rc={rc} ({log})"
        with open(log) as f:
            txt = f.read()
        assert "graceful stop" in txt, f"no graceful stop recorded in {log}"
        rows_k = read_journal(outdir, "loss/total")
        k_last = max(series(rows_k, "loss/total"), default=0)

        rc, log2, _ = run_cli(args.mode, outdir,
                              common + ["--epochs", str(kill_epochs),
                                        "--from_checkpoint"],
                              log_name="resume.log")
        assert rc == 0, f"resume failed rc={rc}, see {log2}"
        rows_r = read_journal(outdir, "loss/total")
        losses_r = series(rows_r, "loss/total")
        if args.skip_soak:
            result.update(killed_at_step=k_last,
                          resumed_steps=max(losses_r))
        else:
            straight = series(read_journal(os.path.join(base, "straight"),
                                           ""), "loss/total")
            post_resume = {k: v for k, v in losses_r.items() if k > k_last}
            mismatch = {k: (v, straight.get(k))
                        for k, v in post_resume.items()
                        if straight.get(k) != v}
            result.update(killed_at_step=k_last,
                          post_resume_steps_compared=len(post_resume),
                          resume_bit_equal=not mismatch)
            if mismatch:
                ks = sorted(mismatch)[:5]
                print(f"  BIT-EQUALITY FAILED at steps {ks}: "
                      f"{[mismatch[k] for k in ks]}", flush=True)
            else:
                print(f"  resume bit-equal over {len(post_resume)} steps "
                      f"(killed at step {k_last})", flush=True)
            assert not mismatch

    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()

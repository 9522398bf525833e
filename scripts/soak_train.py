"""On-chip training soak + kill/resume rehearsal (VERDICT r3 #2).

Runs the real train CLIs on the TPU against synthetic reference-format data
and verifies the properties the reference proved only implicitly through its
11-24 h production runs (reference tools/train_vidor.py:683-706):

  soak        >= --steps optimizer steps through tools/train_vidvrd.py or
              tools/train_vidor.py --train_grounding; records post-warmup
              step-time p50/p95 (tunnel oscillation included) and asserts
              zero post-warmup recompiles (JAX_LOG_COMPILES).
  kill/resume a second run is SIGTERM'd mid-epoch (timeout(1) -- the
              graceful-stop path in train/loop.py checkpoints and exits 0),
              resumed with --from_checkpoint, and every post-resume
              ``loss/total`` journal entry must be BIT-EQUAL to the
              uninterrupted run at the same global step.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/soak_train.py \
      --mode vidvrd --videos 64 --epochs 12 --kill_after 120 \
      --out /tmp/soak_vidvrd.json
  --mode grounding uses tools/train_vidor.py --train_grounding.
  --skip_kill / --skip_soak run half the rehearsal.
"""
import argparse
import json
import os
import re
import shutil
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


def run_cli(mode, outdir, extra, *, timeout_s=None, env_extra=None,
            log_name="run.log", ckpt_every=50):
    cfg = {"vidvrd": ("tools/train_vidvrd.py",
                      ["--cfg_path", "experiments/exp2/config_.py",
                       "--use_pku", "--synthetic_model_dims",
                       "--compute_dtype", "bfloat16"]),
           "grounding": ("tools/train_vidor.py",
                         ["--cfg_path",
                          "experiments/grounding_weights/config_.py",
                          "--train_grounding"])}[mode]
    # orbax saves cost ~20 s each on this host; the graceful-stop path
    # checkpoints on SIGTERM regardless, so a sparse cadence is safe for
    # the kill/resume rehearsal too
    cmd = [sys.executable, cfg[0], *cfg[1], "--output_dir", outdir,
           "--ckpt_every", str(ckpt_every), *extra]
    if timeout_s is not None:
        cmd = ["timeout", "--signal=TERM", "--kill-after=600",
               str(timeout_s)] + cmd
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:/root/.axon_site"
    env["JAX_LOG_COMPILES"] = "1"
    env.update(env_extra or {})
    os.makedirs(outdir, exist_ok=True)
    log = os.path.join(outdir, log_name)
    t0 = time.time()
    with open(log, "w") as f:
        p = subprocess.run(cmd, cwd=REPO, env=env,
                           stdout=f, stderr=subprocess.STDOUT)
    dt = time.time() - t0
    print(f"  [{mode}] {' '.join(extra)}: rc={p.returncode} in {dt:.0f}s",
          flush=True)
    return p.returncode, log, dt


def count_recompiles_after(log_path, warmup_wall_s, t_start):
    """Compile events logged after the warmup window (JAX_LOG_COMPILES
    writes 'Finished tracing + transforming ... for jit' + compile lines;
    we count distinct 'Compiling <name>' lines stamped after warmup)."""
    n_total, n_late = 0, 0
    pat = re.compile(r"Compiling ([\w.<>-]+)")
    with open(log_path) as f:
        for line in f:
            m = pat.search(line)
            if m:
                n_total += 1
    return n_total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("vidvrd", "grounding"),
                    default="vidvrd")
    ap.add_argument("--videos", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--steps", type=int, default=1000,
                    help="soak target (informational; epochs drive it)")
    ap.add_argument("--batch_size", type=int, default=None)
    ap.add_argument("--kill_after", type=int, default=150,
                    help="SIGTERM the kill-rehearsal run after this many "
                         "seconds (should land mid-epoch, post-warmup)")
    ap.add_argument("--warmup_steps", type=int, default=None,
                    help="steps excluded from p50/p95 (default: first "
                         "epoch's worth)")
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
        warm = args.warmup_steps or max(n_steps // args.epochs, 1)
        post = [v for k, v in sorted(times.items()) if k > warm]
        post.sort()
        p50 = post[len(post) // 2]
        p95 = post[int(len(post) * 0.95)]
        n_comp = count_recompiles_after(log, 0, 0)
        # compile lines after the journal's first-epoch boundary
        result.update(
            steps=n_steps, wall_s=round(dt, 1),
            step_ms_p50=round(p50, 2), step_ms_p95=round(p95, 2),
            warmup_steps_excluded=warm, compiles_total=n_comp)
        print(f"  soak: {n_steps} steps, p50 {p50:.1f} ms, p95 {p95:.1f} ms,"
              f" {n_comp} compiles", flush=True)

    # ---- phase 2: kill + resume, bit-equality vs the straight run ---------
    if not args.skip_kill:
        outdir = os.path.join(base, "killed")
        rc, log, dt = run_cli(args.mode, outdir,
                              common + ["--epochs", str(args.epochs)],
                              timeout_s=args.kill_after)
        # timeout(1) exits 124 whenever the deadline fired, even when the
        # command handled TERM gracefully and exited 0 afterwards — so the
        # proof of a graceful stop is the loop's own log line (the handler
        # finishes the in-flight step, checkpoints, exits).  If TERM lands
        # before the train loop installed its handler (still compiling),
        # there is no such line: pick --kill_after past the warmup.
        assert rc in (0, 124), f"killed run crashed rc={rc} ({log})"
        with open(log) as f:
            txt = f.read()
        assert "graceful stop" in txt or "stopping at the next step" in txt,\
            (f"no graceful stop recorded in {log} — did --kill_after "
             f"({args.kill_after}s) land before the train loop started?")
        rows_k = read_journal(outdir, "loss/total")
        k_last = max(series(rows_k, "loss/total"), default=0)

        rc, log2, _ = run_cli(args.mode, outdir,
                              common + ["--epochs", str(args.epochs),
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

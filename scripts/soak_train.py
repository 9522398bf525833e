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


LIGHT_CFG = """\
# soak --light: exp2-shaped config at the synthetic default feature dims
# (64+16) and narrow internal dims — the soak contracts (zero post-warmup
# recompiles, graceful stop, bit-equal resume) are geometry-independent,
# and light steps ship ~KBs over the tunnel instead of ~1.2 GB.
model_config = dict(
    num_enti_cats=36, num_pred_cats=133, dim_ffn=128, dim_enti=128,
    dim_pred=128, dim_att=128, dim_feat=64, dim_clsme=300, dim_i3d=16,
    enco_pool_len=4, n_enco_layers=2, n_deco_layers=6, n_att_head=8,
    num_querys=192, neg_weight=0.1, positive_vIoU_th=0.5,
    cost_coeff_dict=dict(classification=1.0, adj_matrix=30.0),
    loss_coeff_dict=dict(classification=1.0, adj_matrix=30.0),
)
train_dataset_config = dict(
    split="train", min_frames_th=5, max_proposal=50, max_preds=100,
    fmt="pku_i3d",
)
test_dataset_config = dict(train_dataset_config, split="test")
train_config = dict(batch_size=8, total_epoch=100, initial_lr=1e-4,
                    lr_decay=0.2, epoch_lr_milestones=[80])
inference_config = dict(topk=10)
"""


def vidvrd_cfg_path(light, base):
    """exp2 config, or the --light variant written next to the soak runs.

    --light cannot simply drop --synthetic_model_dims: the model asserts
    feature dim == dim_feat+dim_i3d (models/big_c.py:259), so small synthetic
    features need a matching small config.
    """
    if not light:
        return "experiments/exp2/config_.py"
    path = os.path.join(base, "light_config_.py")
    if not os.path.exists(path):
        os.makedirs(base, exist_ok=True)
        with open(path, "w") as f:
            f.write(LIGHT_CFG)
    return path


BASELINE_CFG = """\
# soak --mode baseline: exp6-shaped Base-C config at the synthetic default
# feature dims (64 RoI + 300 classeme) — the soak proves the train-loop
# contracts for the pairwise baseline, not production step times.
model_config = dict(
    dataset_type="VidOR", num_enti_cats=81, num_pred_cats=51, dim_ffn=128,
    dim_enti=128, dim_pred=128, dim_att=128, dim_feat=64, dim_clsme=300,
    enco_pool_len=4, positive_vIoU_th=0.5, rt_triplets_topk=-1,
    use_clsme=True, EntiNameEmb_path=None, bias_matrix_path=None,
)
train_dataset_config = dict(split="train")
test_dataset_config = dict(split="val")
train_config = dict(batch_size=8, total_epoch=100, initial_lr=1e-4,
                    lr_decay=0.2, epoch_lr_milestones=[80])
inference_config = dict(topk=10)
"""


def baseline_cfg_path(base):
    path = os.path.join(base, "baseline_config_.py")
    if not os.path.exists(path):
        os.makedirs(base, exist_ok=True)
        with open(path, "w") as f:
            f.write(BASELINE_CFG)
    return path


def run_cli(mode, outdir, extra, *, kill_at_step=None, env_extra=None,
            log_name="run.log", ckpt_every=50, light=False,
            wire="bfloat16", device_cache_gb=None):
    # --feat_dtype pinned to one explicit value (--wire) for ALL of a
    # soak's runs: the straight run and the kill/resume pair must ship
    # bit-identical batches for the loss bit-equality check — any dtype is
    # bit-stable run-to-run (quant/rounding is deterministic), it just has
    # to be the same one.  Default bfloat16 = the shipped CLI default under
    # bf16 compute; scripts/wire_dtype_bench.py measured the wire
    # byte-proportional (f32 44.6 s, bf16 27.3 s, int8 9.9 s per flagship
    # batch in one window), so f32 soaks are pointlessly slow.
    dims = [] if light else ["--synthetic_model_dims"]
    cfg = {"vidvrd": ("tools/train_vidvrd.py",
                      ["--cfg_path",
                       vidvrd_cfg_path(light, os.path.dirname(outdir)),
                       "--use_pku", *dims,
                       "--compute_dtype", "bfloat16",
                       "--feat_dtype", wire]),
           "grounding": ("tools/train_vidor.py",
                         ["--cfg_path",
                          "experiments/grounding_weights/config_.py",
                          "--train_grounding"]),
           "baseline": ("tools/train_vidor.py",
                        ["--cfg_path",
                         baseline_cfg_path(os.path.dirname(outdir)),
                         "--train_baseline",
                         "--feat_dtype", wire])}[mode]
    # orbax saves cost ~20 s each on this host; the graceful-stop path
    # checkpoints on SIGTERM regardless, so a sparse cadence is safe for
    # the kill/resume rehearsal too
    cmd = [sys.executable, cfg[0], *cfg[1], "--output_dir", outdir,
           "--ckpt_every", str(ckpt_every), *extra]
    if device_cache_gb is not None and mode in ("vidvrd", "baseline"):
        cmd += ["--device_cache_gb", str(device_cache_gb)]
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
                time.sleep(1)
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
    ap.add_argument("--mode", choices=("vidvrd", "grounding", "baseline"),
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
    ap.add_argument("--wire", type=str, default="bfloat16",
                    choices=("float32", "bfloat16", "int8"),
                    help="--feat_dtype for every run of the soak (same "
                         "value for straight + kill/resume keeps the "
                         "bit-equality check valid)")
    ap.add_argument("--device_cache_gb", type=float, default=8.0,
                    help="HBM budget forwarded to the vidvrd/baseline "
                         "trainers' device-resident record cache (epochs "
                         ">= 1 skip the tunnel when the split fits; the "
                         "full-dims 64-video vidvrd split packs to "
                         "~4.9 GB bf16)")
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
                              common + ["--epochs", str(args.epochs)],
                              light=args.light,
                              device_cache_gb=args.device_cache_gb)
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
        # two epochs of warmup: epoch 0 compiles the train step per bucket
        # shape, and epoch 1 compiles the device-record-cache assemble jits
        # (data/device_cache.py) the first time each bucket is rebuilt on
        # device — both are one-time, not shape-driven recompiles
        warm = args.warmup_steps or max(2 * per_epoch, 1)
        post = [v for k, v in sorted(times.items()) if k > warm]
        post.sort()
        p50 = post[len(post) // 2]
        p95 = post[int(len(post) * 0.95)]
        # p95-tail decomposition: the last step of each epoch fetches its
        # metrics synchronously (the lagged-fetch pipeline flushes at the
        # epoch boundary) and the next epoch's stream restarts — classify
        # steps by epoch position to show the tail is boundary-owned, not
        # compute jitter (VERDICT r4 #6)
        mid = sorted(v for k, v in times.items()
                     if k > warm and k % per_epoch != 0)
        bnd = sorted(v for k, v in times.items()
                     if k > warm and k % per_epoch == 0)
        tail = {}
        if mid:
            tail["step_ms_p95_mid_epoch"] = round(
                mid[int(len(mid) * 0.95)], 2)
        if bnd:
            tail["step_ms_p50_epoch_boundary"] = round(
                bnd[len(bnd) // 2], 2)
            tail["step_ms_p95_epoch_boundary"] = round(
                bnd[int(len(bnd) * 0.95)], 2)
        warm_ts = min(r["ts"] for r in rows
                      if r["tag"] == "loss/total" and r["step"] > warm)
        n_comp, n_late = count_recompiles(log, after_ts=warm_ts)
        bs = args.batch_size or 8
        result.update(
            steps=n_steps, wall_s=round(dt, 1),
            step_ms_p50=round(p50, 2), step_ms_p95=round(p95, 2),
            videos_per_s_p50=round(bs * 1000.0 / p50, 1),
            warmup_steps_excluded=warm, compiles_total=n_comp,
            compiles_post_warmup=n_late, **tail)
        print(f"  soak: {n_steps} steps, p50 {p50:.1f} ms, p95 {p95:.1f} ms,"
              f" {n_comp} compiles ({n_late} post-warmup)", flush=True)
        assert n_late == 0, \
            f"{n_late} recompiles after warmup step {warm} — see {log}"

    # ---- phase 2: kill + resume, bit-equality vs the straight run ---------
    if not args.skip_kill:
        kill_epochs = args.kill_epochs or args.epochs
        outdir = os.path.join(base, "killed")
        # device cache OFF for the kill/resume pair: cached epochs run
        # ~100x faster than host-path epochs (no SIGTERM window), and
        # cache on/off batches are bit-identical (tests/test_device_cache)
        # -- so this also crosschecks that invariant against the cached
        # straight run on-chip.
        rc, log, dt = run_cli(args.mode, outdir,
                              common + ["--epochs", str(kill_epochs)],
                              kill_at_step=args.kill_at_step,
                              light=args.light,
                              device_cache_gb=0)
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
                              log_name="resume.log", light=args.light,
                              device_cache_gb=0)
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

"""Peak-RSS demonstration for the bounded-memory drivers.

Runs the full-size eval CLI on N synthetic videos while sampling the
process tree's RSS, then prints peak.  A whole-split materialization
(`list(dataset)`, the round-2 design) holds every record's features in host
RAM (~100-280 MB/video at exp2 dims); the streaming drivers hold O(batch).

  JAX_PLATFORMS=cpu python scripts/peak_rss_eval.py --n 96 --batch_size 8
"""
import argparse
import os
import subprocess
import sys
import threading
import time


def rss_tree_mb(pid):
    total = 0
    try:
        pids = [pid]
        out = subprocess.run(["ps", "--ppid", str(pid), "-o", "pid="],
                             capture_output=True, text=True)
        pids += [int(x) for x in out.stdout.split()]
        for p in pids:
            with open(f"/proc/{p}/status") as f:
                for line in f:
                    if line.startswith("VmRSS"):
                        total += int(line.split()[1]) // 1024
    except Exception:
        pass
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=96)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--root", type=str, default="/tmp/rss_eval")
    ap.add_argument("--platform", type=str, default="cpu",
                    help="cpu, or axon to run the model on the TPU "
                         "(RSS is host memory either way)")
    ap.add_argument("--feat_dtype", type=str, default="float32")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cmd = [sys.executable, os.path.join(repo, "tools", "eval_vidvrd.py"),
           "--cfg_path", os.path.join(repo, "experiments/exp2/config_.py"),
           "--synthetic", str(args.n), "--synthetic_model_dims",
           "--use_pku", "--batch_size", str(args.batch_size),
           "--synthetic_root", os.path.join(args.root, "data"),
           "--output_dir", os.path.join(args.root, "out"),
           "--feat_dtype", args.feat_dtype,
           "--save_tag", "rss"]
    env = dict(os.environ)
    if args.platform == "axon":
        env["JAX_PLATFORMS"] = "axon"
        env["PYTHONPATH"] = "/root/repo:/root/.axon_site"
        cmd += ["--compute_dtype", "bfloat16"]
    else:
        env["JAX_PLATFORMS"] = "cpu"
    t0 = time.time()
    proc = subprocess.Popen(cmd, env=env, cwd=repo)
    peak = {"mb": 0}

    def monitor():
        while proc.poll() is None:
            peak["mb"] = max(peak["mb"], rss_tree_mb(proc.pid))
            time.sleep(0.5)

    th = threading.Thread(target=monitor, daemon=True)
    th.start()
    rc = proc.wait()
    th.join(timeout=2)
    print(f"\neval rc={rc}; n={args.n} full-size videos, "
          f"batch={args.batch_size}: peak RSS {peak['mb']} MB "
          f"({time.time() - t0:.0f}s)")
    sys.exit(rc)


if __name__ == "__main__":
    main()

"""Dataset smoke test: iterate a whole split through the real pipeline.

Equivalent of reference tools/dataloader_demo.py:13-53 — the mandatory
"verify your data is set up" gate.  With --synthetic N a synthetic split in
the reference on-disk layout is generated first.
"""
import argparse

from common import make_dataset  # noqa: E402  (sys.path set in common)
from vidsgg_big_tpu.utils.config import parse_config_py
from vidsgg_big_tpu.data.bucketing import BucketSpec, bucketed_batches


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_path", type=str, default=None)
    parser.add_argument("--dataset_type", type=str, default="vidvrd",
                        choices=["vidvrd", "vidor"])
    parser.add_argument("--split", type=str, default="test")
    parser.add_argument("--dataset_class", type=str, default=None,
                        help="reference-style preset selector (pku|pku_i3d|"
                        "vidvrd|vidor): reads the config key "
                        "{dataset_class}_{split}_dataset_config, as "
                        "reference tools/dataloader_demo.py:40 does with "
                        "experiments/demo/config_.py")
    parser.add_argument("--fmt", type=str, default=None,
                        help="vidvrd tracklet format: mega|pku|pku_i3d")
    parser.add_argument("--synthetic", type=int, default=0,
                        help="generate N synthetic videos instead of real data")
    parser.add_argument("--synthetic_root", type=str, default=None)
    args = parser.parse_args()

    if args.cfg_path:
        all_cfgs = parse_config_py(args.cfg_path)
        if args.dataset_class:
            # the reference's demo config defines pku/pku_i3d/vidvrd-prefixed
            # dataset dicts (reference experiments/demo/config_.py); VidOR
            # configs carry plain train/test keys, so fall back to those
            key = f"{args.dataset_class}_{args.split}_dataset_config"
            if key not in all_cfgs and args.dataset_class == "vidor":
                key = ("train_dataset_config" if args.split.startswith(
                    "train") else "test_dataset_config")
            dataset_config = all_cfgs[key]
            if args.dataset_class == "vidor":
                args.dataset_type = "vidor"
        else:
            key = ("train_dataset_config" if args.split.startswith("train")
                   else "test_dataset_config")
            dataset_config = all_cfgs[key]
    else:
        dataset_config = {"split": args.split}

    dataset, cfg = make_dataset(dataset_config, args.dataset_type,
                                synthetic=args.synthetic,
                                synthetic_root=args.synthetic_root,
                                fmt=args.fmt)
    print(f"dataset: {len(dataset)} videos (config: {cfg})")
    n_props, n_preds, max_t = 0, 0, 0
    items = []
    for item in dataset:
        prop, gt = item[-2], item[-1]
        n_props += prop.num_proposals
        n_preds += 0 if gt is None else gt.num_preds
        max_t = max(max_t, prop.max_frames)
        items.append((prop, gt))
    print(f"iterated {len(items)} videos: {n_props} proposals, "
          f"{n_preds} gt predicates, max_frames={max_t}")

    spec = BucketSpec(feat_dim=items[0][0].features[0].shape[1]
                      if items[0][0].num_proposals else 0)
    buckets, videos, pad_cost = {}, {}, {}
    for key, rows, props, gts in bucketed_batches(items, spec, batch_size=2):
        buckets[key] = buckets.get(key, 0) + 1
        videos[key] = videos.get(key, 0) + len(rows)
        n, t = key
        real = sum(r[0].num_proposals * min(r[0].max_frames, t)
                   for r in rows)
        pad_cost[key] = pad_cost.get(key, 0) + len(rows) * n * t - real
        assert props.feats.shape[1:3] == key
    # bucket-ladder tuning report: hit counts + padding waste per shape, the
    # data needed to retune the (N, T) ladders on a real split
    print(f"bucket histogram ({len(buckets)} shapes):")
    total_cells = sum(videos[k] * k[0] * k[1] for k in buckets)
    for k in sorted(buckets):
        waste = pad_cost[k] / max(videos[k] * k[0] * k[1], 1)
        print(f"  N={k[0]:>4} T={k[1]:>5}: {videos[k]:>6} videos "
              f"{buckets[k]:>5} batches  pad-waste {waste:5.1%}")
    overall = sum(pad_cost.values()) / max(total_cells, 1)
    print(f"overall padding waste: {overall:.1%} of (N*T) cells")
    print("dataloader demo OK")


if __name__ == "__main__":
    main()

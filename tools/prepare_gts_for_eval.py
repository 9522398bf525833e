"""Generate challenge-GT JSONs from annotation trees (capability-parity with
reference VidVRD-helper/prepare_gts_for_eval.py)."""
import argparse

import common  # noqa: F401  (sys.path)
from vidsgg_big_tpu.data.annotations import VidVRD, VidOR, prepare_gts_for_eval


def main(args):
    cls = VidVRD if args.dataset_type == "vidvrd" else VidOR
    dataset = cls(args.anno_rpath, splits=[args.split])
    gts = prepare_gts_for_eval(dataset, args.split, args.save_path)
    print(f"wrote GT for {len(gts)} videos to {args.save_path}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_type", type=str, default="vidvrd")
    parser.add_argument("--anno_rpath", type=str, required=True)
    parser.add_argument("--split", type=str, default="test")
    parser.add_argument("--save_path", type=str, required=True)
    main(parser.parse_args())

"""Fraction recall (paper table 6) from saved hit infos
(capability-parity with reference tools/eval_fraction_recall.py)."""
import argparse
import os
import pickle

from common import make_dataset
from vidsgg_big_tpu.utils.config import parse_config_py
from vidsgg_big_tpu.utils.logger import create_logger
from vidsgg_big_tpu.evaluation.fraction_recall import fraction_recall


def main(args):
    experiment_dir = args.experiment_dir or os.path.dirname(args.cfg_path)
    log_dir = os.path.join(experiment_dir, "logfile")
    os.makedirs(log_dir, exist_ok=True)
    logger = create_logger(os.path.join(
        log_dir, os.path.basename(args.hit_info_path) + ".log"))
    all_cfgs = parse_config_py(args.cfg_path)
    dataset, _ = make_dataset(all_cfgs["test_dataset_config"], "vidor",
                              synthetic=args.synthetic,
                              synthetic_root=args.synthetic_root)
    with open(args.hit_info_path, "rb") as f:
        hit_infos = pickle.load(f)
    logger.info(f"hit infos loaded from {args.hit_info_path}")

    def reset_name(video_name):
        parts = video_name.split("_")
        return parts[1] if len(parts) == 2 else video_name

    # GT records only: going through __getitem__ would materialize every
    # video's full I3D clip-feature array just to discard it
    gts = (dataset.get_data(n)[1] for n in dataset.video_name_list)
    out = fraction_recall(gts, hit_infos, reset_name=reset_name)
    logger.info("---------------video-level----------------")
    for s in ("overall", "single", "multiple"):
        logger.info(f"{s}{out['video_level'][s]}")
    logger.info("---------------dataset-level----------------")
    for s in ("overall", "single", "multiple"):
        logger.info(f"{s}{out['dataset_level'][s]}")
    return out


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_path", type=str, required=True)
    parser.add_argument("--hit_info_path", type=str, required=True)
    parser.add_argument("--experiment_dir", type=str, default=None)
    parser.add_argument("--synthetic", type=int, default=0)
    parser.add_argument("--synthetic_root", type=str, default=None)
    main(parser.parse_args())

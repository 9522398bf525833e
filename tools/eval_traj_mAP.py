"""Tracklet-proposal quality: trajectory mAP
(capability-parity with reference tools/eval_traj_mAP.py)."""
import argparse
import os

from common import make_dataset
from vidsgg_big_tpu.utils.config import parse_config_py
from vidsgg_big_tpu.utils.logger import create_logger
from vidsgg_big_tpu.utils.categories import get_vocab
from vidsgg_big_tpu.evaluation.traj_map import (
    eval_video_object, record_to_traj_dicts)


def main(args):
    experiment_dir = os.path.dirname(args.cfg_path)
    log_dir = os.path.join(experiment_dir, "logfile")
    os.makedirs(log_dir, exist_ok=True)
    logger = create_logger(os.path.join(log_dir, "eval_traj_mAP.log"))
    all_cfgs = parse_config_py(args.cfg_path)
    key = f"{args.split}_dataset_config"
    dataset, _ = make_dataset(all_cfgs[key], args.dataset_type,
                              synthetic=args.synthetic,
                              synthetic_root=args.synthetic_root)
    id2name, _ = get_vocab(args.dataset_type, use_pku=args.use_pku)
    gt_id2name, _ = get_vocab(args.dataset_type)

    gt_results, proposal_results = {}, {}
    for item in dataset:
        prop, gt = item[-2], item[-1]
        gt_results[gt.video_name] = record_to_traj_dicts(
            gt.traj_cat_ids, gt.traj_durations, gt.traj_boxes, gt_id2name)
        proposal_results[gt.video_name] = record_to_traj_dicts(
            prop.cat_ids, prop.durations, prop.boxes, id2name,
            scores=prop.scores)
    mean_ap, ap_class = eval_video_object(gt_results, proposal_results)
    for i, (category, ap) in enumerate(ap_class):
        logger.info(f"{i+1:>2}{category:>20}\t{ap:.4f}")
    logger.info(f"{'mean AP':>22}\t{mean_ap:.4f}")
    return mean_ap


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_path", type=str, required=True)
    parser.add_argument("--dataset_type", type=str, default="vidor")
    parser.add_argument("--split", type=str, default="test")
    parser.add_argument("--use_pku", action="store_true")
    parser.add_argument("--synthetic", type=int, default=0)
    parser.add_argument("--synthetic_root", type=str, default=None)
    main(parser.parse_args())

"""Convert a reference PyTorch checkpoint into this framework's format.

Reference users migrate trained weights without retraining:

    python tools/convert_checkpoint.py \
        --torch_ckpt model_epoch_80.pth --cfg_path experiments/exp2/config_.py \
        --model bigc_vidvrd --out experiments/exp2/converted_ckpt

Writes an orbax checkpoint (step 0) loadable by every train/eval CLI via
``--ckpt_path``, plus ``tables.npz`` holding the constructor tables that are
not flax parameters (frozen EntiNameEmb; the v7 checkpoints' frozen random
pos-embedding table) — pass it to the eval CLIs as ``--tables_path``.

Accepts both raw state_dicts and the reference's training-checkpoint dicts
(``model_state_dict`` + DataParallel ``module.`` prefixes, reference
tools/train_vidvrd.py:20-38), and the historical key scheme handled by
``replace_state_dict_keys`` (reference tools/eval_vidvrd_our_gt.py:186-207)
via ``--legacy_keys``.  The weight-layout conversions themselves are the
oracle-tested transplants (models/transplant.py, tests/test_transplant.py).
"""
import argparse
import os

import numpy as np

from common import load_tables  # noqa: F401  (sys.path bootstrap)
from vidsgg_big_tpu.utils.config import parse_config_py
from vidsgg_big_tpu.models import BigCConfig
from vidsgg_big_tpu.models.base_c import BaseCConfig
from vidsgg_big_tpu.models.grounding import GroundingConfig
from vidsgg_big_tpu.models.transplant import (
    bigc_params_from_torch, basec_params_from_torch,
    grounding_params_from_torch, strip_module_prefix)
from vidsgg_big_tpu.train.train_state import (
    make_optimizer, create_train_state, save_checkpoint)


def replace_legacy_keys(sd):
    """Historical reference key scheme -> released scheme (reference
    tools/eval_vidvrd_our_gt.py:186-207)."""
    out = {}
    for name, v in sd.items():
        if name == "pred_nodes_init":
            name = "pred_query_init"
        name = name.replace("fc_msg_recv", "fc_rolewise")
        name = name.replace(".layers.", ".")
        name = name.replace("fc_pred2logits.0", "fc_pred2logits")
        out[name] = v
    return out


def convert(args):
    import torch

    ckpt = torch.load(args.torch_ckpt, map_location="cpu")
    sd = ckpt.get("model_state_dict", ckpt) if isinstance(ckpt, dict) \
        else ckpt
    sd = strip_module_prefix(sd)
    if args.legacy_keys:
        sd = replace_legacy_keys(sd)

    model_config = parse_config_py(args.cfg_path)["model_config"]
    tables = {}
    if args.model in ("bigc_vidvrd", "bigc_vidor"):
        variant = "v10" if args.model == "bigc_vidvrd" else "v7"
        cfg = BigCConfig.from_dict(model_config, variant=variant)
        variables, tables = bigc_params_from_torch(sd, cfg)
    elif args.model == "base_c":
        cfg = BaseCConfig.from_dict(model_config)
        variables, tables = basec_params_from_torch(sd, cfg)
    elif args.model == "grounding":
        cfg = GroundingConfig.from_dict(model_config)
        variables = grounding_params_from_torch(sd)
    else:
        raise SystemExit(f"unknown --model {args.model}")

    tx, _ = make_optimizer(1e-4, 0.2, [1])
    state = create_train_state(variables, tx)
    out = os.path.abspath(args.out)
    os.makedirs(out, exist_ok=True)
    save_checkpoint(out, state, step=0)
    tables = {k: v for k, v in (tables or {}).items() if v is not None}
    if tables:
        np.savez(os.path.join(out, "tables.npz"), **tables)

    import jax
    n_leaves = len(jax.tree_util.tree_leaves(variables))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables))
    print(f"converted {args.torch_ckpt} -> {out} "
          f"({args.model}, {n_leaves} tensors, {n_params / 1e6:.2f}M params"
          f"{', tables: ' + ','.join(tables) if tables else ''})")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--torch_ckpt", type=str, required=True)
    parser.add_argument("--cfg_path", type=str, required=True)
    parser.add_argument("--model", type=str, required=True,
                        choices=("bigc_vidvrd", "bigc_vidor", "base_c",
                                 "grounding"))
    parser.add_argument("--out", type=str, required=True)
    parser.add_argument("--legacy_keys", action="store_true",
                        help="apply the reference's historical key renames "
                             "before conversion")
    convert(parser.parse_args())

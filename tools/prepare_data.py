"""One-time data preparation: GloVe name embeddings, frequency-bias matrices,
soft classemes (capability-parity with the reference tools_draft/ scripts)."""
import argparse
import os

import numpy as np

from common import make_dataset
from vidsgg_big_tpu.data import prepare
from vidsgg_big_tpu.utils import categories as cats
from vidsgg_big_tpu.utils.config import parse_config_py


def main(args):
    os.makedirs(args.output_dir, exist_ok=True)
    if args.glove_path:
        glove = prepare.load_glove(args.glove_path)
        specs = [
            ("vidvrd_EntiNameEmb.npy", cats.VIDVRD_ENTITIES),
            ("vidvrd_EntiNameEmb_pku.npy", cats.PKU_VIDVRD_ENTITIES),
            ("vidvrd_PredNameEmb.npy", cats.VIDVRD_PREDICATES),
            ("vidor_EntiNameEmb.npy", cats.VIDOR_ENTITIES),
            ("vidor_PredNameEmb.npy", cats.VIDOR_PREDICATES),
        ]
        for fname, names in specs:
            emb = prepare.build_name_embeddings(names, glove)
            np.save(os.path.join(args.output_dir, fname), emb)
            print(f"saved {fname} {emb.shape}")

    if args.cfg_path:
        all_cfgs = parse_config_py(args.cfg_path)
        dataset, _ = make_dataset(all_cfgs["train_dataset_config"],
                                  args.dataset_type,
                                  synthetic=args.synthetic,
                                  synthetic_root=args.synthetic_root)
        if args.dataset_type == "vidvrd":
            e_i2n, p_i2n = cats.vidvrd_CatId2name, cats.vidvrd_PredId2name
            e_n2i, p_n2i = ((cats.PKU_vidvrd_CatName2Id, cats.vidvrd_PredName2Id)
                            if args.use_pku else
                            (cats.vidvrd_CatName2Id, cats.vidvrd_PredName2Id))
            tag = "vidvrd_pku" if args.use_pku else "vidvrd"
        else:
            e_i2n, p_i2n = cats.vidor_CatId2name, cats.vidor_PredId2name
            e_n2i, p_n2i = cats.vidor_CatName2Id, cats.vidor_PredName2Id
            tag = "vidor"
        gts = [it[-1] for it in dataset]
        trips = prepare.collect_triplet_names(gts, e_i2n, p_i2n)
        bias = prepare.build_bias_matrix(trips, e_n2i, p_n2i)
        path = os.path.join(args.output_dir, f"pred_bias_matrix_{tag}.npy")
        np.save(path, bias)
        print(f"saved {path} {bias.shape}")

    if args.logits_dir:
        # detector logits -> soft classeme (needs vidor entity embeddings)
        emb = np.load(os.path.join(args.output_dir, "vidor_EntiNameEmb.npy"))
        os.makedirs(args.classeme_out_dir, exist_ok=True)
        for fname in sorted(os.listdir(args.logits_dir)):
            logits = np.load(os.path.join(args.logits_dir, fname))
            clsme = prepare.extract_classeme(logits, emb[1:])
            out = fname.split(".")[0].split("logits")[0] + "clsme.npy"
            np.save(os.path.join(args.classeme_out_dir, out), clsme)
        print(f"classemes written to {args.classeme_out_dir}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--output_dir", type=str, default="prepared_data")
    parser.add_argument("--glove_path", type=str, default=None)
    parser.add_argument("--cfg_path", type=str, default=None)
    parser.add_argument("--dataset_type", type=str, default="vidvrd")
    parser.add_argument("--use_pku", action="store_true")
    parser.add_argument("--logits_dir", type=str, default=None)
    parser.add_argument("--classeme_out_dir", type=str, default="classeme")
    parser.add_argument("--synthetic", type=int, default=0)
    parser.add_argument("--synthetic_root", type=str, default=None)
    main(parser.parse_args())

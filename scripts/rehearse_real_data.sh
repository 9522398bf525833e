#!/usr/bin/env bash
# Real-data parity rehearsal: on a machine that has the VidVRD/VidOR datasets,
# proposals, prepared_data tables, and the released reference .pth weights,
# this converts every released checkpoint and reproduces the BASELINE.md
# tables, diffing each run against the published numbers with the paper's
# truncation semantics (reference README.md:146).
#
# Inputs (override via env):
#   WEIGHTS_DIR  directory holding the released checkpoints with the
#                reference's names (model_epoch_80.pth etc.), laid out as
#                $WEIGHTS_DIR/{exp1,exp2,exp3,exp4,exp5,exp6,grounding_weights}/
#   OUT_DIR      scratch/output directory (default: rehearsal_out)
#   GT_VIDVRD    challenge GT json for VidVRD-test (default:
#                datasets/GT_json_for_eval/VidVRDtest_gts.json)
#   GT_VIDOR     challenge GT json for VidOR-val
#   STEPS        subset to run, comma-separated (default: all)
#
# The dataset/proposal paths come from experiments/exp*/config_.py — point
# those at your trees first (same keys and directory conventions as the
# reference).  Expected wall time on one v5e: dominated by first-time jit
# compiles (persistent cache makes reruns fast).
set -euo pipefail
cd "$(dirname "$0")/.."

WEIGHTS_DIR=${WEIGHTS_DIR:?set WEIGHTS_DIR to the released-checkpoint root}
OUT_DIR=${OUT_DIR:-rehearsal_out}
GT_VIDVRD=${GT_VIDVRD:-datasets/GT_json_for_eval/VidVRDtest_gts.json}
GT_VIDOR=${GT_VIDOR:-datasets/GT_json_for_eval/VidORval_gts.json}
STEPS=${STEPS:-exp1,exp2,exp3,exp4,exp4_grounding,exp5,exp5_grounding,exp6}
PY=${PY:-python}
mkdir -p "$OUT_DIR"

run_step() { case ",$STEPS," in *",$1,"*) return 0;; *) return 1;; esac }

convert() { # convert <model> <cfg> <pth> <out>
  if [ ! -d "$4" ]; then
    $PY tools/convert_checkpoint.py --model "$1" --cfg_path "$2" \
        --torch_ckpt "$3" --out "$4"
  fi
}

# ---- VidVRD (exp1-3; reference tools/eval_vidvrd.py:200-241) --------------
vidvrd() { # vidvrd <exp> <epoch> <extra eval flags...>
  local exp=$1 epoch=$2; shift 2
  local ck="$OUT_DIR/ckpt_$exp"
  convert bigc_vidvrd "experiments/$exp/config_.py" \
      "$WEIGHTS_DIR/$exp/model_epoch_$epoch.pth" "$ck"
  $PY tools/eval_vidvrd.py --cfg_path "experiments/$exp/config_.py" \
      --ckpt_path "$ck" --tables_path "$ck/tables.npz" \
      --gt_json "$GT_VIDVRD" --batch_size 8 \
      --metrics_json "$OUT_DIR/metrics_$exp.json" --save_tag "$exp" "$@"
  $PY scripts/diff_baseline.py --exp "$exp" \
      --metrics_json "$OUT_DIR/metrics_$exp.json" | tee -a "$OUT_DIR/diff.log"
}
run_step exp1 && vidvrd exp1 80 --use_pku --fmt pku
run_step exp2 && vidvrd exp2 70 --use_pku
run_step exp3 && vidvrd exp3 80 --fmt mega

# ---- VidOR (exp4-6; reference tools/eval_vidor.py:333-433) ----------------
GRD_CK="$OUT_DIR/ckpt_grounding"
convert grounding experiments/grounding_weights/config_.py \
    "$WEIGHTS_DIR/grounding_weights/model_epoch_70.pth" "$GRD_CK"

vidor() { # vidor <exp> <epoch> <diff-tag> <extra eval flags...>
  local exp=$1 epoch=$2 tag=$3; shift 3
  local model=bigc_vidor; [ "$exp" = exp6 ] && model=base_c
  local ck="$OUT_DIR/ckpt_$exp"
  convert $model "experiments/$exp/config_.py" \
      "$WEIGHTS_DIR/$exp/model_epoch_$epoch.pth" "$ck"
  $PY tools/eval_vidor.py --cfg_path "experiments/$exp/config_.py" \
      --ckpt_path "$ck" --tables_path "$ck/tables.npz" \
      --gt_json "$GT_VIDOR" --batch_size 8 \
      --metrics_json "$OUT_DIR/metrics_$tag.json" --save_tag "$tag" "$@"
  $PY scripts/diff_baseline.py --exp "$tag" \
      --metrics_json "$OUT_DIR/metrics_$tag.json" | tee -a "$OUT_DIR/diff.log"
}
run_step exp4 && vidor exp4 60 exp4
run_step exp4_grounding && vidor exp4 60 exp4_grounding \
    --grounding_cfg_path experiments/grounding_weights/config_.py \
    --grounding_ckpt_path "$GRD_CK"
run_step exp5 && vidor exp5 60 exp5
run_step exp5_grounding && vidor exp5 60 exp5_grounding \
    --grounding_cfg_path experiments/grounding_weights/config_.py \
    --grounding_ckpt_path "$GRD_CK"
run_step exp6 && vidor exp6 80 exp6 --use_baseline

echo "==== rehearsal summary ===="
cat "$OUT_DIR/diff.log"

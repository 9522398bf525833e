"""Kill-and-resume through the train_vidor CLI path (reference
tools/train_vidor.py:281-282 resumes in every mode; round-1 parsed the flags
but never used them)."""
import argparse
import os
import sys

import pytest

pytestmark = pytest.mark.slow  # smoke tier: -m 'not slow' (see pytest.ini)

TOOLS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools")

CONFIG = """
model_config = dict(
    num_enti_cats=81, num_pred_cats=51, dim_ffn=32, dim_enti=32, dim_pred=32,
    dim_att=32, dim_feat=64, dim_clsme=300, enco_pool_len=4, n_enco_layers=1,
    n_deco_layers=1, n_att_head=4, num_querys=8, neg_weight=0.1,
    positive_vIoU_th=0.5, use_clsme=True, EntiNameEmb_path=None,
    bias_matrix_path=None,
    cost_coeff_dict=dict(classification=1.0, adj_matrix=30.0),
    loss_coeff_dict=dict(classification=1.0, adj_matrix=30.0))
train_dataset_config = dict(split="train")
test_dataset_config = dict(split="val")
train_config = dict(batch_size=2, total_epoch=2, initial_lr=1e-4,
                    lr_decay=0.2, epoch_lr_milestones=[50])
inference_config = dict(topk=3)
"""


def _args(cfg_path, root, **kw):
    base = dict(cfg_path=cfg_path, save_tag="t", output_dir=None,
                from_checkpoint=False, ckpt_path=None, epochs=None,
                batch_size=None, ckpt_every=1, seed=0, data_parallel=False,
                synthetic=4, synthetic_root=root, train_baseline=False,
                train_grounding=False)
    base.update(kw)
    return argparse.Namespace(**base)


@pytest.fixture(scope="module")
def tools_path():
    sys.path.insert(0, TOOLS)
    yield
    sys.path.remove(TOOLS)


def test_train_vidor_resume(tmp_path_factory, tools_path):
    tmp = tmp_path_factory.mktemp("resume")
    cfg_path = tmp / "config_.py"
    cfg_path.write_text(CONFIG)
    root = str(tmp / "synth")
    import train_vidor

    # 4 videos / batch 2 -> 2 iters per epoch; run 1 epoch, checkpoint saved
    state1 = train_vidor.train_cls_stage(_args(str(cfg_path), root, epochs=1))
    assert int(state1.step) == 2

    # resume with no additional epochs: pure restore, step preserved
    state2 = train_vidor.train_cls_stage(
        _args(str(cfg_path), root, epochs=1, from_checkpoint=True))
    assert int(state2.step) == 2

    # resume and continue one more epoch from the saved step
    state3 = train_vidor.train_cls_stage(
        _args(str(cfg_path), root, epochs=2, from_checkpoint=True))
    assert int(state3.step) == 4


BASELINE_CONFIG = """
model_config = dict(
    num_enti_cats=81, num_pred_cats=51, dim_feat=64, dim_clsme=300,
    dim_enti=32, dim_ffn=32, enco_pool_len=4, use_clsme=True,
    EntiNameEmb_path=None, bias_matrix_path=None, max_preds=16)
train_dataset_config = dict(split="train")
test_dataset_config = dict(split="val")
train_config = dict(batch_size=2, total_epoch=2, initial_lr=1e-4,
                    lr_decay=0.2, epoch_lr_milestones=[50])
inference_config = dict(topk=3)
"""


def test_train_vidor_baseline_resume(tmp_path_factory, tools_path):
    """Kill-and-resume through the --train_baseline CLI path (the other two
    train_vidor modes share _maybe_resume but run distinct train loops —
    reference tools/train_vidor.py:281-282 resumes in every mode)."""
    tmp = tmp_path_factory.mktemp("resume_base")
    cfg_path = tmp / "config_.py"
    cfg_path.write_text(BASELINE_CONFIG)
    root = str(tmp / "synth")
    import train_vidor

    state1 = train_vidor.train_baseline(_args(str(cfg_path), root, epochs=1,
                                              train_baseline=True))
    s1 = int(state1.step)
    assert s1 >= 2          # 4 videos / batch 2 (bucket splits may add one)

    state2 = train_vidor.train_baseline(_args(
        str(cfg_path), root, epochs=1, from_checkpoint=True,
        train_baseline=True))
    assert int(state2.step) == s1          # pure restore

    state3 = train_vidor.train_baseline(_args(
        str(cfg_path), root, epochs=2, from_checkpoint=True,
        train_baseline=True))
    assert int(state3.step) > s1           # continued past the restore


GROUNDING_CONFIG = """
model_config = dict(
    dim_feat=1024, dim_clsme=300, dim_hidden=32, num_bins=2,
    num_pred_cats=51, num_enti_cats=81, max_preds=16,
    loss_factor=dict(classification=1.0, centerness=1.0, regression=1.0))
train_dataset_config = dict(split="train")
test_dataset_config = dict(split="val")
train_config = dict(batch_size=2, total_epoch=2, initial_lr=1e-4,
                    lr_decay=0.2, epoch_lr_milestones=[50])
inference_config = dict(topk=3)
"""


def test_train_vidor_grounding_resume(tmp_path_factory, tools_path):
    """Kill-and-resume through the --train_grounding CLI path (exercises the
    clip-bucketed epoch stream + prefetch loop end-to-end on synthetic
    video features)."""
    tmp = tmp_path_factory.mktemp("resume_grd")
    cfg_path = tmp / "config_.py"
    cfg_path.write_text(GROUNDING_CONFIG)
    root = str(tmp / "synth")
    import train_vidor

    state1 = train_vidor.train_grounding_stage(_args(
        str(cfg_path), root, epochs=1, train_grounding=True))
    s1 = int(state1.step)
    assert s1 == 2          # all synthetic videos share one clip bucket

    state2 = train_vidor.train_grounding_stage(_args(
        str(cfg_path), root, epochs=1, from_checkpoint=True,
        train_grounding=True))
    assert int(state2.step) == s1

    state3 = train_vidor.train_grounding_stage(_args(
        str(cfg_path), root, epochs=2, from_checkpoint=True,
        train_grounding=True))
    assert int(state3.step) == 2 * s1


def test_resume_epoch_sidecar(tmp_path, tools_path):
    """The resumed epoch comes from the checkpoint's sidecar, not from
    ``step // iters_per_epoch``: streaming bucketed epochs emit more steps
    per epoch than len(dataset)//batch_size (partial-bucket flushes split
    batches), so the division over-counts and would silently skip epochs.
    The sidecar is authoritative; checkpoints without one (pre-sidecar)
    fall back to the division."""
    import logging
    import jax.numpy as jnp
    import optax
    from vidsgg_big_tpu.train.train_state import (
        create_train_state, save_checkpoint, load_checkpoint_epoch)
    from common import maybe_resume

    params = {"w": jnp.zeros((3,))}
    tx = optax.sgd(1e-2)
    state = create_train_state(params, tx).replace(step=37)
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, state, 37, epoch=5)
    assert load_checkpoint_epoch(ckpt, 37) == 5

    args = argparse.Namespace(from_checkpoint=True, ckpt_path=ckpt)
    template = create_train_state({"w": jnp.zeros((3,))}, tx)
    # iters_per_epoch=6 would put step 37 in "epoch 6"; the sidecar says 5
    restored, start_epoch, start_batch = maybe_resume(
        args, logging.getLogger("t"), template, ckpt, iters_per_epoch=6)
    assert (start_epoch, start_batch) == (5, 0)
    assert int(restored.step) == 37

    # a graceful mid-epoch stop records (epoch, batch_in_epoch)
    ckpt3 = str(tmp_path / "ckpt3")
    save_checkpoint(ckpt3, state, 37, epoch=5, batch_in_epoch=4)
    _, e3, b3 = maybe_resume(
        argparse.Namespace(from_checkpoint=True, ckpt_path=ckpt3),
        logging.getLogger("t"), template, ckpt3, iters_per_epoch=6)
    assert (e3, b3) == (5, 4)

    # pre-sidecar checkpoint: fall back to the division
    ckpt2 = str(tmp_path / "ckpt2")
    save_checkpoint(ckpt2, state, 37)
    assert load_checkpoint_epoch(ckpt2, 37) is None
    _, start_epoch2, _ = maybe_resume(
        argparse.Namespace(from_checkpoint=True, ckpt_path=ckpt2),
        logging.getLogger("t"), template, ckpt2, iters_per_epoch=6)
    assert start_epoch2 == 6


def test_train_vidor_midepoch_stop_resume_bitequal(tmp_path_factory,
                                                   tools_path):
    """Graceful mid-epoch stop + resume through the real cls-stage CLI is
    BIT-EQUAL to an uninterrupted run: same final params, same per-step
    ``loss/total`` journal (train/loop.py fast-forwards the deterministic
    epoch stream and derives dropout keys by fold_in(global step)).  This is
    the CPU twin of the on-chip kill rehearsal (scripts/soak_train.py)."""
    import jax
    import numpy as np

    tmp = tmp_path_factory.mktemp("resume_mid")
    cfg_path = tmp / "config_.py"
    cfg_path.write_text(CONFIG)
    root = str(tmp / "synth")
    import train_vidor

    def journal(outdir):
        import json
        path = os.path.join(outdir, "logfile", "metrics.jsonl")
        out = {}
        with open(path) as f:
            for line in f:
                r = json.loads(line)
                if r["tag"] == "loss/total":
                    out[r["step"]] = r["value"]
        return out

    # straight: 2 epochs x 2 iters = 4 steps
    out_a = str(tmp / "a")
    state_a = train_vidor.train_cls_stage(
        _args(str(cfg_path), root, epochs=2, output_dir=out_a))
    assert int(state_a.step) == 4

    # stopped after 3 batches (mid-epoch 1), then resumed
    out_b = str(tmp / "b")
    state_b = train_vidor.train_cls_stage(
        _args(str(cfg_path), root, epochs=2, output_dir=out_b,
              stop_after_batches=3))
    assert int(state_b.step) == 3
    state_b2 = train_vidor.train_cls_stage(
        _args(str(cfg_path), root, epochs=2, output_dir=out_b,
              from_checkpoint=True))
    assert int(state_b2.step) == 4

    pa = jax.device_get(state_a.params)
    pb = jax.device_get(state_b2.params)
    for ka, va in zip(jax.tree_util.tree_leaves(pa),
                      jax.tree_util.tree_leaves(pb)):
        np.testing.assert_array_equal(np.asarray(ka), np.asarray(va))
    ja, jb = journal(out_a), journal(out_b)
    assert set(ja) == set(jb) == {1, 2, 3, 4}
    assert ja == jb

"""Serving-artifact throughput vs the live jitted step (exp2 geometry, TPU).

Exports the flagship BIG-C at full dims (bf16 features, params baked in),
deserializes it, and times both the artifact and the live jit on the same
device-resident batch — the exported StableHLO path must not tax steady-
state throughput.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/serving_bench.py
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import jax  # noqa: E402

from vidsgg_big_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

B, N, T, DF, DI = 8, 50, 256, 2048, 832

CFG = f"""
model_config = dict(
    num_enti_cats=36, num_pred_cats=133, dim_ffn=512, dim_enti=512,
    dim_pred=512, dim_att=512, dim_feat={DF}, dim_clsme=300, dim_i3d={DI},
    enco_pool_len=4, n_enco_layers=2, n_deco_layers=6, n_att_head=8,
    num_querys=192, neg_weight=0.1, positive_vIoU_th=0.5,
    EntiNameEmb_path=None, bias_matrix_path=None,
    compute_dtype="bfloat16",
    cost_coeff_dict=dict(classification=1.0, adj_matrix=30.0),
    loss_coeff_dict=dict(classification=1.0, adj_matrix=30.0))
inference_config = dict(topk=10)
"""


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf[(slice(0, 1),) * leaf.ndim]).sum())


def timeit(fn, *args, n=40):
    out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best / n * 1000.0


def main():
    enable_compilation_cache()
    import tempfile, os
    import export_model
    from vidsgg_big_tpu.train.steps import build_infer_step
    from vidsgg_big_tpu.utils.serving import load_exported
    from vidsgg_big_tpu.utils.config import parse_config_py

    tmp = tempfile.mkdtemp()
    cfg_path = os.path.join(tmp, "config_.py")
    with open(cfg_path, "w") as f:
        f.write(CFG)
    args = argparse.Namespace(
        cfg_path=cfg_path, model="bigc_vidvrd", ckpt_path=None,
        tables_path=None, out=os.path.join(tmp, "artifact"), n_bucket=N,
        t_bucket=T, q_bucket=64, batch_size=B, topk=None,
        feat_dtype="bfloat16", compute_dtype=None, platforms="cpu,tpu")
    t0 = time.perf_counter()
    export_model.export_model(args)
    print(f"export (trace+lower cpu,tpu + serialize): "
          f"{time.perf_counter() - t0:.1f}s", flush=True)

    model, params, template, _ = export_model.build_model_and_params(
        args, parse_config_py(cfg_path)["model_config"])
    template = jax.device_put(template)
    params = jax.device_put(params)

    infer = build_infer_step(model, topk=10)
    live_ms = timeit(lambda: infer(params, template))
    print(f"live jit:      {live_ms:7.3f} ms/batch "
          f"({B / live_ms * 1000:.1f} videos/sec)", flush=True)

    t0 = time.perf_counter()
    serve, man = load_exported(args.out)
    out = serve(template)
    _sync(out)
    print(f"artifact first call (deserialize+compile): "
          f"{time.perf_counter() - t0:.1f}s", flush=True)
    served_ms = timeit(lambda: serve(template))
    print(f"artifact:      {served_ms:7.3f} ms/batch "
          f"({B / served_ms * 1000:.1f} videos/sec)  "
          f"[{man['artifact_bytes'] / 1e6:.1f} MB]", flush=True)


if __name__ == "__main__":
    main()

"""Compare a metrics JSON (tools/eval_* --metrics_json) against the
published reference numbers with the paper's truncation semantics.

The reference's README states paper scores are *truncated*, not rounded, to
4 decimals (reference README.md:146) — so a measured mAP matches a published
value v iff trunc4(measured) == trunc4(v).  Published values in EXPECTED are
copied from BASELINE.md (which cites each reference file:line).

Usage:
  python scripts/diff_baseline.py --exp exp2 --metrics_json out/metrics.json
  python scripts/diff_baseline.py --exp exp4_grounding --metrics_json ...
Exit code 0 = all present metrics match; 1 = any mismatch (prints a table).
"""
import argparse
import json
import math
import sys

# BASELINE.md tables (relation detection); keys: mAP, recall@{50,100},
# tagging precision@{1,5,10}.
EXPECTED = {
    "exp1": {"mAP": 0.1756102, "R@50": 0.0959669, "R@100": 0.1092037,
             "P@1": 0.565, "P@5": 0.4430, "P@10": 0.3235},
    "exp2": {"mAP": 0.1767959, "R@50": 0.0963806, "R@100": 0.1129266,
             "P@1": 0.56, "P@5": 0.4380, "P@10": 0.3285},
    "exp3": {"mAP": 0.2608820, "R@50": 0.1410548, "R@100": 0.1625646,
             "P@1": 0.73, "P@5": 0.551, "P@10": 0.40},
    "exp4": {"mAP": 0.0803041, "R@50": 0.0760401, "R@100": 0.0939553,
             "P@1": 0.6226, "P@5": 0.5096, "P@10": 0.4030},
    "exp4_grounding": {"mAP": 0.0828241, "R@50": 0.0774003,
                       "R@100": 0.0982018, "P@1": 0.6214, "P@5": 0.5125,
                       "P@10": 0.4048},
    "exp5": {"mAP": 0.0829601, "R@50": 0.0792250, "R@100": 0.0965762,
             "P@1": 0.6442, "P@5": 0.5171, "P@10": 0.4105},
    "exp5_grounding": {"mAP": 0.0854544, "R@50": 0.0803862,
                       "R@100": 0.1004247, "P@1": 0.6442, "P@5": 0.5180,
                       "P@10": 0.4097},
    "exp6": {"mAP": 0.0705236, "R@50": 0.0717272, "R@100": 0.0919979,
             "P@1": 0.5901, "P@5": 0.4707, "P@10": 0.3782},
    "exp6_rt200": {"mAP": 0.0698487, "R@50": 0.0717603, "R@100": 0.0919979,
                   "P@1": 0.5913, "P@5": 0.4705, "P@10": 0.3808},
    "exp6_grounding": {"mAP": 0.0719424, "R@50": 0.0732201,
                       "R@100": 0.0950169, "P@1": 0.5950, "P@5": 0.4729,
                       "P@10": 0.3832},
}


def trunc(x: float, digits: int) -> float:
    """Truncate to ``digits`` decimals, float-safely.

    ``x * 10**digits`` can land one ulp *below* an integer (e.g.
    0.0959669e7 == 959668.9999...), which a plain ``math.trunc`` would
    floor to the wrong decimal — a measured metric exactly equal to a
    published value would then report MISMATCH.  Nudge by a few ulps
    before flooring.
    """
    f = 10 ** digits
    scaled = x * f
    return math.floor(scaled + 1e-9 * max(1.0, abs(scaled))) / f


def compare(exp: str, metrics: dict, tol_extra: float = 0.0):
    """Returns list of (name, measured, published, ok)."""
    exp_vals = EXPECTED[exp]
    got = {
        "mAP": metrics["mAP"],
        "R@50": metrics["recall"].get("50"),
        "R@100": metrics["recall"].get("100"),
        "P@1": metrics["precision"].get("1"),
        "P@5": metrics["precision"].get("5"),
        "P@10": metrics["precision"].get("10"),
    }
    rows = []
    for name, pub in exp_vals.items():
        meas = got.get(name)
        if meas is None:
            continue
        # published values themselves vary in printed precision (0.565 vs
        # 0.4430): compare at the precision the paper printed, truncating
        digits = max(len(str(pub).split(".")[-1]), 2)
        ok = abs(trunc(meas, digits) - pub) <= tol_extra + 10 ** -(digits + 6)
        rows.append((name, meas, pub, ok))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", required=True, choices=sorted(EXPECTED))
    ap.add_argument("--metrics_json", required=True)
    ap.add_argument("--tol", type=float, default=0.0,
                    help="extra absolute tolerance on top of truncation "
                         "(e.g. 0.002 for a re-trained checkpoint)")
    args = ap.parse_args()
    with open(args.metrics_json) as f:
        metrics = json.load(f)
    rows = compare(args.exp, metrics, args.tol)
    bad = [r for r in rows if not r[3]]
    print(f"{args.exp}: {'MATCH' if not bad else 'MISMATCH'}")
    for name, meas, pub, ok in rows:
        print(f"  {name:>6}: measured={meas:.7f} published={pub} "
              f"{'ok' if ok else '<-- MISMATCH'}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()

"""Hyper-parameter time/accuracy Pareto front for the semi-dense flow.

Analogue of the reference's gradient-search tracer
(/root/reference/evaluation/semi_dense_optical_flow/pareto_KITTI.py:8-30),
which sweeps tracker knobs and records (runtime, accuracy) points. Here a
small grid over {nscales, winsize, propagation, search_niters} is
evaluated on the synthetic ground-truth pairs of flow_eval.py (KITTI
methodology: mean EPE + % endpoint errors > 3 px) and the Pareto-optimal
(ms, fl%) configurations are marked.

Run:  python evaluation/pareto_sweep.py [--save results_pareto.json]
One JSON line per configuration; Pareto-front members get "pareto": true.
Runtime is wall ms on the invoking platform (chip or CPU) — relative
ordering is what the front conveys.
"""

import argparse
import itertools
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from flow_eval import evaluate_pair, hostile_pairs, synthetic_pairs  # noqa: E402


CONFIGS = [
    dict(nscales=ns, winsize=wsz, propagation=pr, )
    for ns, wsz, pr in itertools.product((2, 3), (7, 9), (1, 2))
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--save", default=None)
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--hostile", action="store_true",
                    help="sweep on the HARDEST regime instead of pure "
                    "translations: the +-3 deg rotation pairs (round-5 "
                    "hostile set), where refine-radius/pyramid-depth "
                    "trade-offs actually bite")
    args = ap.parse_args()

    if args.hostile:
        pairs = [p for p in hostile_pairs() if p[0].startswith("rotate")]
    else:
        pairs = list(synthetic_pairs(args.pairs))
    results = []
    for cfg in CONFIGS:
        stats = [evaluate_pair(a1, a2, gu, gv, val, **cfg)
                 for _, a1, a2, gu, gv, val in pairs]
        rec = dict(cfg)
        rec["ms"] = round(float(np.mean([s["ms"] for s in stats])), 2)
        rec["fl_pct"] = round(float(np.mean([s["fl"] for s in stats])), 2)
        rec["aepe"] = round(float(np.mean([s["aepe"] for s in stats])), 3)
        results.append(rec)

    # Pareto front on (ms, fl_pct): keep configs not dominated by any other
    for r in results:
        r["pareto"] = not any(
            (o["ms"] <= r["ms"] and o["fl_pct"] <= r["fl_pct"] and
             (o["ms"] < r["ms"] or o["fl_pct"] < r["fl_pct"]))
            for o in results)
        print(json.dumps(r))

    if args.save:
        json.dump(results, open(args.save, "w"), indent=1)


if __name__ == "__main__":
    main()

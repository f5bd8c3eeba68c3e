"""Compare the r5 conv-impl A/B runs (VERDICT r4 #7).

Reads runs/r5ab_{pallas2,matmul}/logs/metrics.jsonl (same init, same
corpus, same shard/crop schedule — the ONLY difference is
APTD_CONV_IMPL) and reports, per impl: mean total loss over the last N
logged steps, mean loss over the whole run, and steps/s from the metric
timestamps.  Prints a one-line verdict for the campaign to follow.

    python tools/compare_ab.py [N_last=200]
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load(impl):
    path = os.path.join(REPO, f"runs/r5ab_{impl}/logs/metrics.jsonl")
    rows = [json.loads(l) for l in open(path)]
    return [r for r in rows if "total" in r]


def main():
    n_last = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    out = {}
    for impl in ("pallas2", "matmul"):
        rows = load(impl)
        mean = lambda rs: sum(r["total"] for r in rs) / max(len(rs), 1)
        dt = rows[-1]["time"] - rows[0]["time"]
        dstep = rows[-1]["step"] - rows[0]["step"]
        out[impl] = {
            "steps_logged": len(rows),
            "mean_total": round(mean(rows), 5),
            f"mean_total_last{n_last}": round(mean(rows[-n_last:]), 5),
            "steps_per_s": round(dstep / max(dt, 1e-9), 3),
        }
        print(impl, json.dumps(out[impl]))
    a, b = out["pallas2"], out["matmul"]
    k = f"mean_total_last{n_last}"
    loss_rel = (a[k] - b[k]) / max(b[k], 1e-9)
    speed_rel = a["steps_per_s"] / max(b["steps_per_s"], 1e-9)
    # pick the faster impl unless its loss trajectory is >1% worse
    winner = "pallas2" if (loss_rel < 0.01 and speed_rel >= 1.0) or \
        (loss_rel < -0.01) else ("matmul" if loss_rel > 0.01 else
                                 ("pallas2" if speed_rel >= 1.0
                                  else "matmul"))
    print(json.dumps({"loss_rel_pallas2_vs_matmul": round(loss_rel, 4),
                      "speed_rel": round(speed_rel, 3),
                      "winner": winner}))


if __name__ == "__main__":
    main()

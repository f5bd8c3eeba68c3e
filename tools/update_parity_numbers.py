"""Regenerate PARITY.md's measured-performance table from bench.py output.

Single source of truth: the same JSON line the driver records as
BENCH_r*.json.  Usage:

    python bench.py | tail -1 > /tmp/bench.json
    python tools/update_parity_numbers.py /tmp/bench.json

(or pass an existing BENCH_r*.json).  Rewrites the block between
BENCH_TABLE_START/END markers in PARITY.md.
"""
from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Reference numbers (BASELINE.md)
REF_TRACE_MS = 72.0
REF_DENOISE_MS = 153.8
REF_TRAIN_MS = 797.7


def load_bench(path):
    """Load a bench record: either bench.py's raw JSON line(s) or the
    driver's pretty-printed BENCH_r*.json wrapper ({..., "parsed": {...}}).
    Shared with tests/test_parity_fresh.py so both parse identically."""
    with open(path) as f:
        text = f.read().strip()
    try:
        rec = json.loads(text)
    except json.JSONDecodeError:
        rec = json.loads(text.splitlines()[-1])
    if "parsed" in rec:
        rec = rec["parsed"]
    return rec


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench.json"
    rec = load_bench(path)
    x = rec["extra"]
    mrays = rec["value"]

    def ok(v):
        return v is not None and v == v
    trace_ms = 800 * 800 / (mrays * 1e6) * 1e3
    den = x["denoise_832sq_ms_median"]
    inter = x["interactive_800sq_ms_median"]
    tr = x["train_step_ms_median"]
    statue = x["statue_81920faces_1spp_ms_median"]
    statue_d1 = x.get("statue_depth1_ms_median")
    blob = x.get("blob_5120faces_1spp_ms_median")
    den1080 = x.get("denoise_1080p_ms_median")

    rows = [
        ("1spp 800² path trace (Cornell, depth 8)",
         f"{REF_TRACE_MS:.0f} ms (8.9 Mrays/s)",
         f"{trace_ms:.2f} ms ({mrays:.0f} Mrays/s)",
         f"**{REF_TRACE_MS / trace_ms:.1f}×**"),
    ]
    if ok(den):
        rows.append(("Denoiser inference (832², bf16 BN-folded)",
                     f"{REF_DENOISE_MS:.1f} ms (optimized TorchScript)",
                     f"{den:.1f} ms", f"**{REF_DENOISE_MS / den:.1f}×**"))
    if ok(inter):
        rows.append(("Interactive loop (1spp trace + denoise, 800²)",
                     f"~{REF_TRACE_MS + REF_DENOISE_MS:.0f} ms (~4.4 fps)",
                     f"{inter:.1f} ms ({1e3 / inter:.1f} fps)",
                     f"**{(REF_TRACE_MS + REF_DENOISE_MS) / inter:.1f}×**"))
    if ok(tr):
        rows.append(("Train step (7-frame seq, 256² crops, batch 1)",
                     f"{REF_TRAIN_MS:.1f} ms", f"{tr:.1f} ms",
                     f"**{REF_TRAIN_MS / tr:.1f}×**"))
    if ok(den1080):
        rows.append(("Denoiser inference 1920×1080 (pad-and-crop)",
                     "n/a (reference asserts square, pathtrace.cu:426)",
                     f"{den1080:.1f} ms", "—"))
    mesh_rows = []
    if ok(blob):
        mesh_rows.append(("5,120-face blob, 1spp 800² frame",
                          "unreachable (brute-force loop)",
                          f"{blob:.1f} ms", "—"))
    if ok(statue):
        mesh_rows.append(("81,920-face statue, 1spp 800² frame (depth 8)",
                          "unreachable (brute-force loop)",
                          f"{statue:.1f} ms", "—"))
    if ok(statue_d1):
        mesh_rows.append(("81,920-face statue, primary rays only (depth 1)",
                          "unreachable", f"{statue_d1:.1f} ms", "—"))

    lines = ["", "| Metric | Reference (GTX 1080Ti) | Ours (1× v5e) | Speedup |",
             "|---|---|---|---|"]
    for r in rows + mesh_rows:
        lines.append("| " + " | ".join(r) + " |")
    lines.append("")
    lines.append(f"Source: `bench.py` JSON ({rec['metric']} = {mrays} "
                 f"Mrays/s, vs_baseline {rec['vs_baseline']}×; "
                 f"median of {x.get('reps', '?')} reps).")
    lines.append("")

    parity = os.path.join(REPO, "PARITY.md")
    text = open(parity).read()
    start = text.index("<!-- BENCH_TABLE_START -->")
    end = text.index("<!-- BENCH_TABLE_END -->")
    new = (text[:start + len("<!-- BENCH_TABLE_START -->")]
           + "\n".join(lines)
           + text[end:])
    open(parity, "w").write(new)
    print(f"updated {parity} from {path}")


if __name__ == "__main__":
    main()

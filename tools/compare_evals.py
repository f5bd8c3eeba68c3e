"""Compare two held-out eval.json records (same scene pool) and say which
model wins — the gate for swapping the shipped default artifact
(VERDICT r3 #3: ship only if it beats the r2 model on held-out PSNR).

    python tools/compare_evals.py runs/r2/eval.json runs/r3/eval.json
"""
import json
import sys


def main():
    a_path, b_path = sys.argv[1], sys.argv[2]
    a = json.load(open(a_path))
    b = json.load(open(b_path))
    scenes = sorted(set(a) & set(b))
    wins = 0
    print(f"{'scene':8s} {'A psnr':>8s} {'B psnr':>8s} {'A mse-x':>8s} "
          f"{'B mse-x':>8s}")
    for s in scenes:
        pa, pb = a[s]["psnr_denoised"], b[s]["psnr_denoised"]
        ia = a[s]["mse_noisy"] / max(a[s]["mse_denoised"], 1e-12)
        ib = b[s]["mse_noisy"] / max(b[s]["mse_denoised"], 1e-12)
        wins += pb > pa
        print(f"{s:8s} {pa:8.2f} {pb:8.2f} {ia:8.1f} {ib:8.1f}")
    n = len(scenes)
    mean = lambda d, k: sum(d[s][k] for s in scenes) / n
    print(f"{'mean':8s} {mean(a, 'psnr_denoised'):8.2f} "
          f"{mean(b, 'psnr_denoised'):8.2f}")
    verdict = "B" if wins == n else ("A" if wins == 0 else "mixed")
    print(f"B beats A on {wins}/{n} scenes -> {verdict}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

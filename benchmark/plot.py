"""Recall-vs-QPS plots from benchmark/results/*.json (ann-benchmarks style).

Reference counterpart: the committed plots in the reference's benchmark/
directory (benchmark/turing/sift1m/*.png — recall@k on x, queries/s on log
y, one curve per engine/config). Here each curve is one results JSON
produced by benchmark/sweep.py; points along a curve are its n_probe sweep
(the "flat" exhaustive-sweep entry is drawn as an unconnected star since it
is not part of the probing curve).

Usage:
  python benchmark/plot.py                 # all results, one PNG per k
  python benchmark/plot.py --k 10          # only recall@10
  python benchmark/plot.py --match sift    # subset of result files
"""

import argparse
import glob
import json
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

# fixed categorical order (validated default palette; identity follows the
# file, never the rank on a given chart) + marker shape as secondary encoding
PALETTE = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100", "#e87ba4", "#008300"]
MARKERS = ["o", "s", "D", "^", "v", "P"]
TEXT, MUTED, GRID = "#1a1a19", "#6b6a60", "#e5e4dc"


def load_results(results_dir, match):
    """[(name, data, slot)] — slot is the file's position among ALL result
    files so a series keeps its color regardless of the --match filter."""
    out = []
    for slot, path in enumerate(
            sorted(glob.glob(os.path.join(results_dir, "*.json")))):
        if match and match not in os.path.basename(path):
            continue
        with open(path) as f:
            data = json.load(f)
        if isinstance(data, dict) and "entries" in data:
            out.append((os.path.basename(path)[:-5], data, slot))
    return out


def plot_k(results, k, out_path):
    fig, ax = plt.subplots(figsize=(7.2, 4.6), dpi=160)
    drew = False
    for name, data, slot in results:
        color = PALETTE[slot % len(PALETTE)]
        marker = MARKERS[slot % len(MARKERS)]
        key = f"recall@{k}"
        curve = [(e[key], e["qps"]) for e in data["entries"]
                 if key in e and e["n_probe"] != "flat"]
        flat = [(e[key], e["qps"]) for e in data["entries"]
                if key in e and e["n_probe"] == "flat"]
        if not curve and not flat:
            continue
        drew = True
        if curve:
            xs, ys = zip(*sorted(curve))
            ax.plot(xs, ys, color=color, marker=marker, markersize=5,
                    linewidth=2, label=name, zorder=3)
        if flat:
            ax.scatter(*zip(*flat), color=color, marker="*", s=110,
                       zorder=4, edgecolors="white", linewidths=0.8,
                       label=None if curve else name)
    if not drew:
        plt.close(fig)
        return False
    ax.set_yscale("log")
    ax.set_xlabel(f"recall@{k}", color=TEXT)
    ax.set_ylabel("queries / s", color=TEXT)
    ax.set_title(f"recall@{k} vs throughput  (curves: n_probe sweep; "
                 "★ exhaustive flat sweep)", color=TEXT, fontsize=10)
    ax.grid(True, which="both", color=GRID, linewidth=0.6, zorder=0)
    for spine in ("top", "right"):
        ax.spines[spine].set_visible(False)
    for spine in ("left", "bottom"):
        ax.spines[spine].set_color(MUTED)
    ax.tick_params(colors=MUTED, labelsize=8)
    ax.legend(fontsize=7, frameon=False, labelcolor=TEXT)
    fig.tight_layout()
    fig.savefig(out_path)
    plt.close(fig)
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, nargs="+", default=[1, 10, 100])
    ap.add_argument("--match", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    here = os.path.dirname(os.path.abspath(__file__))
    results_dir = os.path.join(here, "results")
    out_dir = args.out or os.path.join(results_dir, "plots")
    os.makedirs(out_dir, exist_ok=True)
    results = load_results(results_dir, args.match)
    if not results:
        raise SystemExit("no result JSONs found")
    for k in args.k:
        path = os.path.join(out_dir, f"recall{k}_vs_qps.png")
        if plot_k(results, k, path):
            print(f"wrote {path}")


if __name__ == "__main__":
    main()

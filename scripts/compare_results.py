"""Compare eval RESULTS json files metric-by-metric against CopyCat.

The round-4 release gate (VERDICT.md "Next round" #1) is *per-metric*: the
released checkpoint must beat the no-motion baseline on every reported
metric, not just the headline AJ. This prints the gate table for one or
two results files so the release decision is a read, not a judgment call.

    python scripts/compare_results.py RESULTS_r4_main2.json [RESULTS_r4_ft128b.json]

Each file is the output of scripts/eval_checkpoint.py: a dict with a
"copycat" baseline block and one block per eval config, each holding a
"held_out" (or threshold-keyed) metrics dict.
"""

import argparse
import json

# Metrics where LOWER is better; everything else is higher-better.
LOWER_BETTER = {"mte_visible", "ate_visible", "fde_visible"}
# Bookkeeping fields, not quality metrics.
SKIP = {"n", "v", "occlusion_accuracy_for_vis0", "occlusion_accuracy_for_vis1"}


def best_block(doc: dict) -> tuple[str, dict]:
    """Pick the model metrics block: the config entry's calibrated held-out
    numbers (eval_checkpoint writes them under 'held_out'; older files keyed
    them by the chosen threshold)."""
    candidates = []
    for name, val in doc.items():
        if name in ("copycat", "checkpoint_step", "eval_domain", "per_scene",
                    "best"):
            continue
        if not isinstance(val, dict):
            continue
        for key in ("heldout_calibrated", "held_out"):
            if key in val:
                candidates.append((name, val[key]))
                break
        else:
            if "average_jaccard" in val:  # metrics-shaped dict directly
                candidates.append((name, val))
    if not candidates:
        raise SystemExit("no model metrics block found (expected a config "
                         "entry with a 'heldout_calibrated' dict)")
    # Prefer the config eval_checkpoint itself picked as best, if recorded.
    best = doc.get("best", {})
    tag = f"iters{best.get('iters')}_grid{best.get('grid')}"
    for name, m in candidates:
        if name == tag or name.startswith(tag):
            return name, m
    return max(candidates, key=lambda nm: nm[1]["average_jaccard"])


def gate_table(doc: dict, label: str) -> dict:
    cc = doc["copycat"]
    name, m = best_block(doc)
    print(f"\n== {label} [{name}] vs CopyCat ==")
    wins, losses = 0, 0
    rows = {}
    for k, ccv in cc.items():
        if k in SKIP or k not in m:
            continue
        mv = m[k]
        better = (mv < ccv) if k in LOWER_BETTER else (mv > ccv)
        rows[k] = (mv, ccv, better)
        wins += better
        losses += not better
        mark = "WIN " if better else "loss"
        print(f"  {mark} {k:28s} {mv:8.2f} vs {ccv:8.2f}")
    aj, ccaj = m["average_jaccard"], cc["average_jaccard"]
    print(f"  -- {wins} wins / {losses} losses; AJ ratio {aj / ccaj:.3f} "
          f"(gate: every metric + AJ >= 1.25x)")
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("results", nargs="+", help="RESULTS_*.json files")
    args = ap.parse_args()
    tables = []
    for path in args.results:
        with open(path) as f:
            doc = json.load(f)
        tables.append((path, gate_table(doc, path)))
    if len(tables) == 2:
        (pa, a), (pb, b) = tables
        print(f"\n== {pb} vs {pa} (model-to-model) ==")
        for k in a:
            if k not in b:
                continue
            va, vb = a[k][0], b[k][0]
            better = (vb < va) if k in LOWER_BETTER else (vb > va)
            mark = "+" if better else "-"
            print(f"  {mark} {k:28s} {vb:8.2f} vs {va:8.2f}")


if __name__ == "__main__":
    # Default SIGPIPE so `... | head` truncates quietly instead of raising
    # BrokenPipeError mid-table.
    import signal

    signal.signal(signal.SIGPIPE, signal.SIG_DFL)
    main()

"""Results aggregation + optima collection.

Capability parity with the reference's helper scripts
(``data/mis-benchmark-framework/helper_scripts/aggregator.py`` — merge
per-experiment result files into one CSV — and ``fetch_optima.py`` — collect
the label/optimum set sizes stored inside ``.gpickle`` graph files into a
CSV). Here both operate on this framework's artifacts: runs write
``<storage_path>/models/<name>/<run>/metrics.jsonl`` (one JSON record per
logged step, wandb-compatible metric names), and MIS datasets are pickled
networkx graphs with a per-node ``label`` (and optional ``weight``) attr.

Usage:
  python -m difusco_tpu.data.aggregate runs   --input runs/ --output all.csv
  python -m difusco_tpu.data.aggregate optima --input 'data/mis_*/**.gpickle' \
      --output optima.csv
"""

from __future__ import annotations

import argparse
import csv
import glob as globlib
import json
import os
import pickle
from typing import Dict, List


def aggregate_runs(runs_root: str) -> List[Dict[str, object]]:
    """One row per run: the run's path-derived name plus, for every metric
    ever logged, its final (last-step) value and the step it was logged at."""
    rows = []
    for dirpath, _dirnames, filenames in sorted(os.walk(runs_root)):
        if "metrics.jsonl" not in filenames:
            continue
        finals: Dict[str, float] = {}
        last_step = -1
        with open(os.path.join(dirpath, "metrics.jsonl")) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                step = int(rec.pop("step", 0))
                rec.pop("ts", None)
                for k, v in rec.items():
                    finals[k] = v
                last_step = max(last_step, step)
        row: Dict[str, object] = {
            "run": os.path.relpath(dirpath, runs_root),
            "last_step": last_step,
        }
        row.update(sorted(finals.items()))
        rows.append(row)
    return rows


def fetch_optima(input_glob: str) -> List[Dict[str, object]]:
    """One row per graph file: node/edge counts, label MIS size, and (when
    per-node ``weight`` attrs exist) the weighted set size."""
    rows = []
    for path in sorted(globlib.glob(input_glob, recursive=True)):
        with open(path, "rb") as f:
            g = pickle.load(f)
        labels = [d.get("label") for _, d in g.nodes(data=True)]
        has_labels = all(l is not None for l in labels) and len(labels) > 0
        optimal_mis = int(sum(labels)) if has_labels else None
        optimal_mwis = None
        if has_labels and all(
            "weight" in d for _, d in g.nodes(data=True)
        ):
            optimal_mwis = float(
                sum(d["weight"] for _, d in g.nodes(data=True) if d["label"])
            )
        rows.append({
            "graph": os.path.splitext(os.path.basename(path))[0],
            "nodes": g.number_of_nodes(),
            "edges": g.number_of_edges(),
            "optimal_mis": optimal_mis,
            "optimal_mwis": optimal_mwis,
        })
    return rows


def write_csv(rows: List[Dict[str, object]], output: str) -> None:
    fields: List[str] = []
    for r in rows:
        for k in r:
            if k not in fields:
                fields.append(k)
    with open(output, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fields)
        w.writeheader()
        w.writerows(rows)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    r = sub.add_parser("runs", help="aggregate metrics.jsonl files into a CSV")
    r.add_argument("--input", required=True, help="runs root directory")
    r.add_argument("--output", required=True)
    o = sub.add_parser("optima", help="collect label optima from .gpickle files")
    o.add_argument("--input", required=True, help="glob of .gpickle files")
    o.add_argument("--output", required=True)
    args = p.parse_args(argv)
    rows = (aggregate_runs(args.input) if args.cmd == "runs"
            else fetch_optima(args.input))
    write_csv(rows, args.output)
    print(f"wrote {len(rows)} rows to {args.output}")


if __name__ == "__main__":
    main()

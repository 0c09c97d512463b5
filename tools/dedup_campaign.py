"""10^7-doc dedup campaign (round-4 verdict item #4; results in
BASELINE.md).  Generates a deterministic documents corpus with PLANTED
duplicate structure (tartare_ray.gen.generate_documents: per decade of
doc_ids, one exact copy and one near-dup of the decade's base doc),
then times the dedup family at bench scale and VERIFIES the planted
structure in the outputs — at-scale correctness, not just wall clock.

Usage (owns its Ray session, like bench.py):
    python tools/dedup_campaign.py --docs 10000000 --cpus 32
    python tools/dedup_campaign.py --docs 10000000 --cpus 8,32   # A/B

Prints one JSON line per (op, cpus) plus a final summary line.
Corpus generation is idempotent (tmp+rename part files keyed on
config) and reused across parallelism levels.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

# Runnable from any cwd: the repo root (not tools/) is the import
# root, and Ray workers are separate processes that only see
# PYTHONPATH — sys.path alone would fail inside actors.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def _stage_walls(stats: str) -> dict[str, float]:
    """Condense ``Dataset.stats()`` into {operator: wall_sec} — the
    per-stage evidence BASELINE.md records (no stage should hold the
    whole corpus; walls should track data volume, not materialize)."""
    out = {}
    for m in re.finditer(
        r"Operator \d+ (\S+?):.*?\n.*?\* Remote wall time:.*?([\d.]+)(ms|s|us) max, "
        r".*?([\d.]+)(ms|s|us) total",
        stats,
    ):
        name, _mx, _mxu, tot, unit = m.groups()
        mult = {"s": 1.0, "ms": 1e-3, "us": 1e-6}[unit]
        out[name[:60]] = round(float(tot) * mult, 2)
    return out


def run_ops(docs_dir: str, n_docs: int, cpus: int, ops: list[str]) -> None:
    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from tartare_ray.gen import generate_documents
    from tartare_ray.pipelines import queries as Q

    generate_documents(docs_dir, n_docs)

    planted = n_docs // 10  # decades, each with one exact copy + one near-dup

    def verify(op: str, res) -> dict:
        """Planted-structure checks, all computed DISTRIBUTED (the
        driver sees aggregate scalars)."""
        import pyarrow.compute as pc

        if op == "exact_dedup":
            # every decade's base has exactly one exact copy
            n_groups = res.count()
            dup_groups = res.filter(lambda r: r["n_copies"] == 2).count()
            return {
                "dup_groups": dup_groups,
                "expected": planted,
                "ok": dup_groups == planted and n_groups == n_docs - planted,
            }
        if op == "minhash_lsh_dedup":
            # planted pairs per decade: (X,X+8) (X,X+9) (X+8,X+9)
            def is_planted(b):
                import pyarrow as pa

                a = b["doc_a"].to_numpy(zero_copy_only=False)
                c = b["doc_b"].to_numpy(zero_copy_only=False)
                lo, hi = (a.astype("int64"), c.astype("int64"))
                same_decade = (lo // 10) == (hi // 10)
                return pa.table({"p": pa.array(same_decade.astype("int64"))})

            n_pairs = res.count()
            n_planted = int(
                res.map_batches(is_planted, batch_format="pyarrow").sum("p") or 0
            )
            return {
                "pairs": n_pairs,
                "planted_found": n_planted,
                "planted_possible": 3 * planted,
                "recall": round(n_planted / (3 * planted), 3),
                "precision": round(n_planted / max(n_pairs, 1), 3),
            }
        if op == "minhash_cluster_dedup":
            # ideal: one size-3 cluster per decade, survivor = base
            rows = res.count()
            ok_lbl = res.filter(
                lambda r: r["cluster_id"] == (r["doc_id"] // 10) * 10
            ).count()
            return {
                "cluster_rows": rows,
                "ideal_rows": 3 * planted,
                "survivor_is_decade_base_frac": round(ok_lbl / max(rows, 1), 3),
            }
        if op == "dedup_clusters":
            rows = res.count()
            return {"rows": rows, "expected_docs": n_docs, "ok": rows == n_docs}
        if op == "paragraph_dedup":
            return {"docs_out": res.count()}
        return {"rows": res.count()}

    for op in ops:
        fn = getattr(Q, op)
        t0 = time.perf_counter()
        res = fn(docs_dir)
        if hasattr(res, "materialize"):
            res = res.materialize()  # consume the stream; O(output) rows
        wall = time.perf_counter() - t0
        rec = {
            "op": op,
            "cpus": cpus,
            "n_docs": n_docs,
            "wall_sec": round(wall, 1),
            "docs_per_sec": round(n_docs / wall),
            "verify": verify(op, res),
            "stage_walls": _stage_walls(res.stats()) if hasattr(res, "stats") else {},
        }
        print("CAMPAIGN " + json.dumps(rec), flush=True)
    ray.shutdown()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=10_000_000)
    ap.add_argument("--cpus", type=str, default="32")
    ap.add_argument(
        "--ops",
        type=str,
        default="exact_dedup,paragraph_dedup,minhash_lsh_dedup,minhash_cluster_dedup,dedup_clusters",
    )
    ap.add_argument("--child", action="store_true", help=argparse.SUPPRESS)
    args = ap.parse_args()
    docs_dir = f"/tmp/tartare_ray/campaign/docs-{args.docs}"
    ops = args.ops.split(",")
    levels = [int(c) for c in args.cpus.split(",")]
    if args.child or len(levels) == 1:
        run_ops(docs_dir, args.docs, levels[0], ops)
        return
    for cpus in levels:  # fresh process per level, like bench --scaling
        subprocess.run(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--child",
                "--docs",
                str(args.docs),
                "--cpus",
                str(cpus),
                "--ops",
                args.ops,
            ],
            check=True,
        )


if __name__ == "__main__":
    main()

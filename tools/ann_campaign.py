"""10^6-vector ANN campaign (round-4 verdict item #4's ANN half;
results in BASELINE.md).  Generates a deterministic embeddings corpus
with PLANTED neighbor structure (tartare_ray.gen.generate_embeddings:
per decade of vec_ids, one cosine≈0.999 near-dup of the decade's base
vector), then times the similarity family at scale and VERIFIES the
planted structure in the outputs — at-scale recall measured against
ground truth the corpus itself encodes, not assumed.

Also reports the LSH bucket-size distribution (the skew evidence the
verdict asks for): n_buckets, p50/p99/max rows per bucket, and the
share of rows in the largest bucket — computed distributed via one
Count groupby over the bucket keys.

Usage (owns its Ray session, like bench.py):
    python tools/ann_campaign.py --vecs 1000000 --cpus 32
    python tools/ann_campaign.py --vecs 1000000 --cpus 8,32   # A/B
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

# Runnable from any cwd; Ray workers need PYTHONPATH, not sys.path.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def lsh_bucket_skew(vec_dir: str) -> dict:
    """Bucket-size distribution of the ann_lsh_pairs keying — one
    Count groupby (O(buckets) rows to the driver, ~n/512 per table)."""
    import numpy as np
    import pyarrow as pa
    import ray
    from ray.data.aggregate import Count

    from tartare_ray.pipelines import queries as Q
    from tartare_ray.stages import similarity as S

    dim = len(Q._embedding_head(vec_dir, 1)["embedding"][0].as_py())
    n = Q._table_num_rows(vec_dir, "embeddings")
    bits = max(4, int(np.ceil(np.log2(max(n, 1) / 512))))
    counts = (
        Q._read(vec_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(
            S.HyperplaneBucketStage,
            fn_constructor_kwargs=dict(dim=dim, bits=bits, n_tables=8),
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=Q._conc(),
        )
        .select_columns(["table", "bucket"])
        .groupby(["table", "bucket"])
        .aggregate(Count(alias_name="n"))
    )
    sizes = np.sort(
        np.concatenate(
            [t["n"].to_numpy(zero_copy_only=False) for t in counts.iter_batches(batch_format="pyarrow")]
        )
    )
    return {
        "bits": bits,
        "n_buckets": int(len(sizes)),
        "rows_per_bucket": {
            "p50": int(sizes[len(sizes) // 2]),
            "p99": int(sizes[int(len(sizes) * 0.99)]),
            "max": int(sizes[-1]),
        },
        "top_bucket_row_share": round(float(sizes[-1]) / float(sizes.sum()), 5),
    }


def run_ops(vec_dir: str, n_vecs: int, cpus: int, ops: list[str]) -> None:
    import numpy as np
    import pyarrow as pa
    import ray
    from ray.data import DataContext

    ray.init(address="local", num_cpus=cpus, include_dashboard=False, logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False

    from tartare_ray.gen import generate_embeddings
    from tartare_ray.pipelines import queries as Q

    generate_embeddings(vec_dir, n_vecs)
    planted = n_vecs // 10  # one (base, base+9) pair per decade

    def verify(op: str, res) -> dict:
        if op in ("ann_lsh_pairs", "semdedup_pairs"):
            def is_planted(b: pa.Table) -> pa.Table:
                a = b["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
                c = b["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
                lo, hi = np.minimum(a, c), np.maximum(a, c)
                p = (lo % 10 == 0) & (hi == lo + 9)
                return pa.table({"p": pa.array(p.astype(np.int64))})

            n_pairs = res.count()
            found = int(res.map_batches(is_planted, batch_format="pyarrow").sum("p") or 0)
            return {
                "pairs": n_pairs,
                "planted_found": found,
                "planted_possible": planted,
                "recall": round(found / planted, 4),
                "precision": round(found / max(n_pairs, 1), 4),
            }
        if op in ("ann_ivf_topk", "ann_pq_topk"):
            # queries 0..99; for each decade base the planted neighbor
            # (base+9) must appear in the top-k
            t = res if isinstance(res, pa.Table) else pa.concat_tables(
                list(res.iter_batches(batch_format="pyarrow"))
            )
            q = t["q_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            v = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            bases = [b for b in range(0, 100, 10)]
            hit = sum(1 for b in bases if np.any((q == b) & (v == b + 9)))
            return {
                "base_queries": len(bases),
                "planted_neighbor_in_topk": hit,
                "recall": round(hit / len(bases), 3),
            }
        return {"rows": res.count() if hasattr(res, "count") else len(res)}

    for op in ops:
        t0 = time.perf_counter()
        if op == "ann_ivf_topk":
            res = Q.ann_ivf_topk(vec_dir, n_queries=100, k=5, n_clusters=64, nprobe=8)
        elif op == "ann_pq_topk":
            res = Q.ann_pq_topk(vec_dir, n_queries=100, k=5)
        elif op == "ann_lsh_pairs":
            # near-dup threshold: planted pairs sit at cos≈0.999,
            # random dim-64 cosines never reach 0.8 — precision vs the
            # planted set is exact at this setting
            res = Q.ann_lsh_pairs(vec_dir, threshold=0.8)
        elif op == "semdedup_pairs":
            res = Q.semdedup_pairs(vec_dir, threshold=0.8)
        else:
            res = getattr(Q, op)(vec_dir)
        if hasattr(res, "materialize"):
            res = res.materialize()
        wall = time.perf_counter() - t0
        rec = {
            "op": op,
            "cpus": cpus,
            "n_vecs": n_vecs,
            "wall_sec": round(wall, 1),
            "vecs_per_sec": round(n_vecs / wall),
            "verify": verify(op, res),
        }
        print("CAMPAIGN " + json.dumps(rec), flush=True)

    print("SKEW " + json.dumps(dict(lsh_bucket_skew(vec_dir), cpus=cpus)), flush=True)
    ray.shutdown()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vecs", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=str, default="32")
    ap.add_argument("--ops", type=str, default="ann_lsh_pairs,semdedup_pairs,ann_ivf_topk,ann_pq_topk")
    ap.add_argument("--child", action="store_true", help=argparse.SUPPRESS)
    args = ap.parse_args()
    vec_dir = f"/tmp/tartare_ray/campaign/vecs-{args.vecs}"
    ops = args.ops.split(",")
    levels = [int(c) for c in args.cpus.split(",")]
    if args.child or len(levels) == 1:
        run_ops(vec_dir, args.vecs, levels[0], ops)
        return
    for cpus in levels:
        subprocess.run(
            [
                sys.executable, os.path.abspath(__file__), "--child",
                "--vecs", str(args.vecs), "--cpus", str(cpus), "--ops", args.ops,
            ],
            check=True,
        )


if __name__ == "__main__":
    main()

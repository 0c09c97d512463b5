"""Distributed connected components over an edge list — the cluster
step of a real dedup pipeline (pair lists alone over/under-delete:
survivors must be picked per CONNECTED COMPONENT, one canonical doc
per near-dup cluster).

Reference analogue: none in tartare (whole-file checksum dedup has no
transitive structure) `[UNVERIFIED — empty checkout, SURVEY.md §0]`;
this is the standard web-scale companion to MinHash/LSH dedup.

Algorithm: iterative min-label propagation expressed purely in Ray
Data primitives — per round, each node's label becomes the min of its
own label and its neighbors' labels:

    msgs  = sym_edges ⋈ labels on src          (hash join, vectorized)
    round = (msgs ∪ own) groupby(node) min     (sort-based aggregate)

Scale shape: every round moves O(E + N) fixed-width int64 rows through
one hash join and one groupby — never text, never signatures, and no
driver-side or per-actor whole-graph state; the driver sees only the
per-round changed-count scalar.  Rounds needed = graph diameter.
Near-dup components are pairs/triples in practice (diameter ≤ ~3, two
or three rounds to fixpoint); for adversarial long chains a
pointer-jumping variant (label ← label[label], one extra join per
round) would bound rounds at O(log n) — not needed for dedup graphs,
so we keep the cheaper propagation and cap rounds at ``max_iters``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Min


def _sym_batch(b: pa.Table) -> pa.Table:
    # type-agnostic (int64 doc indexes OR string doc_ids): symmetrize
    # with Arrow concat, no numpy cast
    return pa.concat_tables(
        [
            pa.table({"src": b["u"], "dst": b["v"]}),
            pa.table({"src": b["v"], "dst": b["u"]}),
        ]
    ).combine_chunks()


def connected_components(
    edges: ray.data.Dataset,
    nodes: ray.data.Dataset,
    *,
    num_partitions: int = 4,
    max_iters: int = 64,
) -> ray.data.Dataset:
    """Min-label connected components.

    ``edges``: columns (u, v), undirected (either orientation,
    duplicates tolerated — they collapse in the min aggregate, but
    dedup them upstream to keep message volume down).
    ``nodes``: column (node), every vertex incl. isolated ones.
    Node type is any orderable Arrow type (int64 ids, string doc_ids);
    ``min`` defines the canonical survivor under that type's order.

    Returns a materialized Dataset (node, label) where ``label`` is
    the minimum node id of the component — the canonical survivor.
    """
    labels = nodes.map_batches(
        lambda b: pa.table({"node": b["node"], "label": b["node"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    sym = edges.map_batches(
        _sym_batch, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    if sym.count() == 0:
        return labels

    def as_msg(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": b["dst"],
                "cand": b["label"],
                "own": pa.nulls(len(b), b["label"].type),
            }
        )

    def as_own(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["node"], "cand": b["label"], "own": b["label"]})

    for _ in range(max_iters):
        msgs = sym.join(
            labels,
            join_type="inner",
            num_partitions=num_partitions,
            on=("src",),
            right_on=("node",),
        ).map_batches(as_msg, batch_format="pyarrow", zero_copy_batch=True)
        own = labels.map_batches(
            as_own, batch_format="pyarrow", zero_copy_batch=True
        )
        agg = (
            msgs.union(own)
            .groupby("node")
            .aggregate(
                Min("cand", alias_name="new_label"),
                # msg rows carry a null own; Min ignores nulls, so this
                # recovers each node's previous label without a join
                Min("own", alias_name="old_label"),
            )
        )

        def fin(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": b["node"],
                    "label": b["new_label"],
                    "changed": pc.cast(
                        pc.less(b["new_label"], b["old_label"]), pa.int64()
                    ),
                }
            )

        res = agg.map_batches(
            fin, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        changed = res.sum("changed") or 0
        # the sort-based aggregate can emit zero-column empty blocks
        # that Acero's join rejects next round — repartition coalesces
        # them away (the queries._pairs_norm convention); O(N) int64
        # rows, small next to the round's join+groupby
        labels = (
            res.drop_columns(["changed"]).repartition(num_partitions).materialize()
        )
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds "
        "(graph diameter exceeds the cap — raise max_iters or use a "
        "pointer-jumping variant)"
    )

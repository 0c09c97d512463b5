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
per-round changed-count scalar.  Rounds needed = graph diameter for
this Dataset loop.  Near-dup components are pairs/triples in practice
(diameter ≤ ~3, two or three rounds to fixpoint), so the cheaper
propagation is kept here; the BSP implementation below additionally
POINTER-JUMPS every round (label ← label[label], one query/answer
exchange), bounding rounds at O(log diameter) for adversarial chains.
"""

from __future__ import annotations

import os

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


# --------------------------------------------------------------------------
# BSP actor implementation — for LARGE / high-diameter graphs
# --------------------------------------------------------------------------
#
# The Dataset loop above re-plans a join + groupby EVERY round; Ray
# Data's per-operator overhead (~10-30 s/round at any size) multiplies
# by graph diameter — measured 366 s for 250k nodes / 500k edges /
# 16 rounds (BASELINE.md).  Iterative algorithms want state that
# PERSISTS across rounds, which the Dataset API cannot express — this
# is the documented "raw actors as a last resort" case (SURVEY.md §2A):
# P stateful actors each own one hash partition of nodes+edges (sorted
# numpy arrays, loaded once from a parquet exchange directory); a
# round is one vectorized message pass per actor — candidate labels
# pre-reduced to ONE min per destination node before they enter the
# object store — and the driver moves only object refs and per-round
# changed counts.  Partition assumption: hash(node) % P places a
# node's label and all its in-edges on one actor; message volume per
# round ≤ min(E, touched dst nodes), all fixed-width int64.

import numpy as np  # noqa: E402  (used by the BSP path only)

from ..functions.hashing import mix64  # noqa: E402


def _node_part(ids: np.ndarray, P: int) -> np.ndarray:
    return (mix64(ids.astype(np.uint64)) % np.uint64(P)).astype(np.int64)


@ray.remote
class _CCShard:
    """One hash partition of the graph: sorted node ids, their labels,
    and every OUT-edge whose source lives here, grouped by destination
    partition so outgoing messages batch into one ref per dest."""

    def __init__(self, p: int, P: int, part_dir: str):
        import glob

        import pyarrow.parquet as pq

        self.p, self.P = p, P
        nodes = []
        src, dst = [], []
        for f in sorted(glob.glob(f"{part_dir}/nodes-{p:05d}-*.parquet")):
            nodes.append(pq.read_table(f)["node"].to_numpy(zero_copy_only=False))
        for f in sorted(glob.glob(f"{part_dir}/edges-{p:05d}-*.parquet")):
            t = pq.read_table(f)
            src.append(t["src"].to_numpy(zero_copy_only=False))
            dst.append(t["dst"].to_numpy(zero_copy_only=False))
        self.node = np.unique(
            np.concatenate(nodes + [np.array([], dtype=np.int64)])
        )
        self.label = self.node.copy()
        s = np.concatenate(src + [np.array([], dtype=np.int64)])
        d = np.concatenate(dst + [np.array([], dtype=np.int64)])
        # out-edges FROM this partition: src lives here; route by dst part
        self.src_idx = np.searchsorted(self.node, s)
        if len(s) and (
            (self.src_idx >= len(self.node)).any()
            or (self.node[np.minimum(self.src_idx, len(self.node) - 1)] != s).any()
        ):
            raise ValueError(
                "edge endpoints missing from the nodes dataset (the CC "
                "contract: nodes must cover every edge endpoint)"
            )
        self.dst = d
        self.dst_part = _node_part(d, self.P)
        order = np.argsort(self.dst_part, kind="stable")
        self.src_idx, self.dst, self.dst_part = (
            self.src_idx[order],
            self.dst[order],
            self.dst_part[order],
        )
        self.part_bounds = np.searchsorted(self.dst_part, np.arange(self.P + 1))

    def compute_msgs(self) -> list:
        """Per destination partition: (dst, cand) pre-reduced to the
        local min candidate per dst — one ref each, or None."""
        cand = self.label[self.src_idx]
        out = []
        for q in range(self.P):
            lo, hi = self.part_bounds[q], self.part_bounds[q + 1]
            if hi == lo:
                out.append(None)
                continue
            d, c = self.dst[lo:hi], cand[lo:hi]
            o = np.lexsort((c, d))
            d, c = d[o], c[o]
            first = np.r_[True, d[1:] != d[:-1]]
            out.append(ray.put((d[first], c[first])))
        return out

    def apply_msgs(self, refs: list) -> int:
        new = self.label.copy()
        for r in refs:
            if r is None:
                continue
            d, c = ray.get(r)
            idx = np.searchsorted(self.node, d)
            np.minimum.at(new, idx, c)
        changed = int((new < self.label).sum())
        self.label = new
        return changed

    # --- pointer jumping (path doubling) -----------------------------
    # label values are always node ids, so the owner of label L is
    # shard hash(L) % P; one query/answer exchange per round lets every
    # node shortcut label[v] <- label[label[v]], doubling the distance
    # covered per round: rounds drop from graph diameter to
    # O(log diameter) (round-4 verdict item #3).  Exchange volume is
    # O(distinct labels) int64s per shard — strictly less than the
    # message pass itself.

    def compute_jump_queries(self) -> list:
        """Distinct label values grouped by owning partition — one ref
        per owner, or None."""
        lab = np.unique(self.label)
        owner = _node_part(lab, self.P)
        order = np.argsort(owner, kind="stable")
        lab, owner = lab[order], owner[order]
        bounds = np.searchsorted(owner, np.arange(self.P + 1))
        return [
            ray.put(lab[bounds[q] : bounds[q + 1]])
            if bounds[q + 1] > bounds[q]
            else None
            for q in range(self.P)
        ]

    def answer_jump(self, query_refs: list) -> list:
        """For each requester's queried node ids (all owned here),
        return (ids, their current labels)."""
        out = []
        for r in query_refs:
            if r is None:
                out.append(None)
                continue
            ids = ray.get(r)
            idx = np.searchsorted(self.node, ids)
            out.append(ray.put((ids, self.label[idx])))
        return out

    def apply_jump(self, answer_refs: list) -> int:
        """label[v] <- min(label[v], label[label[v]]) via the answers."""
        ids_all, lab_all = [], []
        for r in answer_refs:
            if r is None:
                continue
            ids, labs = ray.get(r)
            ids_all.append(ids)
            lab_all.append(labs)
        if not ids_all:
            return 0
        ids = np.concatenate(ids_all)
        labs = np.concatenate(lab_all)
        order = np.argsort(ids)  # owners partition the id space: disjoint
        ids, labs = ids[order], labs[order]
        pos = np.searchsorted(ids, self.label)
        new = np.minimum(self.label, labs[pos])
        changed = int((new < self.label).sum())
        self.label = new
        return changed

    def labels_table(self) -> pa.Table:
        return pa.table({"node": pa.array(self.node), "label": pa.array(self.label)})


def connected_components_bsp(
    edges: ray.data.Dataset,
    nodes: ray.data.Dataset,
    *,
    num_partitions: int = 8,
    max_iters: int = 10_000,
    scratch_dir: str | None = None,
    stats: dict | None = None,
    jump: bool = True,
) -> ray.data.Dataset:
    """Min-label connected components for int64 node ids via BSP
    actors (see block comment above).  Semantics identical to
    ``connected_components``; rounds cost actor RPCs instead of fresh
    Dataset operators, so high-diameter graphs converge ~20× faster
    (BASELINE.md), and each round also POINTER-JUMPS
    (label[v] <- label[label[v]]), so even adversarial long chains
    converge in O(log diameter) rounds.  One Dataset pass
    hash-partitions nodes + symmetric edges to a parquet exchange
    directory (the house SplitApplier pattern); each actor loads its
    partition once.  Pass ``stats={}`` to receive {"rounds": n}."""
    import shutil
    import tempfile
    import uuid

    import pyarrow.parquet as pq

    P = num_partitions
    part_dir = scratch_dir or os.path.join(
        tempfile.gettempdir(), "tartare_ray", "cc", uuid.uuid4().hex
    )
    os.makedirs(part_dir, exist_ok=True)

    def write_part(kind: str):
        def fn(b: pa.Table) -> pa.Table:
            import hashlib

            if kind == "nodes":
                ids = b["node"].to_numpy(zero_copy_only=False).astype(np.int64)
                parts = _node_part(ids, P)
                cols = {"node": ids}
            else:
                u = b["u"].to_numpy(zero_copy_only=False).astype(np.int64)
                v = b["v"].to_numpy(zero_copy_only=False).astype(np.int64)
                s = np.concatenate([u, v])
                d = np.concatenate([v, u])
                parts = _node_part(s, P)  # route by SOURCE partition
                cols = {"src": s, "dst": d}
            sig = hashlib.blake2b(
                np.ascontiguousarray(next(iter(cols.values()))).tobytes(),
                digest_size=8,
            ).hexdigest()
            for q in np.unique(parts):
                m = parts == q
                pq.write_table(
                    pa.table({k: pa.array(c[m]) for k, c in cols.items()}),
                    os.path.join(part_dir, f"{kind}-{q:05d}-{sig}.parquet"),
                )
            return pa.table({"n": pa.array([len(b)], pa.int64())})

        return fn

    # two streaming passes; content-hash names make task retries idempotent
    nodes.map_batches(write_part("nodes"), batch_format="pyarrow").sum("n")
    edges.map_batches(write_part("edges"), batch_format="pyarrow").sum("n")

    shards = [_CCShard.remote(p, P, part_dir) for p in range(P)]
    rounds = 0
    try:
        for _ in range(max_iters):
            rounds += 1
            # (1) neighbor-min message pass
            msgs = ray.get([s.compute_msgs.remote() for s in shards])
            changed = sum(
                ray.get(
                    [
                        s.apply_msgs.remote([msgs[src_p][q] for src_p in range(P)])
                        for q, s in enumerate(shards)
                    ]
                )
            )
            # (2) pointer jump: label[v] <- label[label[v]] — shortcut
            # distance doubles per round, so long chains converge in
            # O(log diameter) rounds instead of diameter
            if changed == 0:
                break  # already at fixpoint: a jump can't change anything
            if not jump:
                continue
            queries = ray.get([s.compute_jump_queries.remote() for s in shards])
            answers = ray.get(
                [
                    s.answer_jump.remote([queries[p][q] for p in range(P)])
                    for q, s in enumerate(shards)
                ]
            )
            changed += sum(
                ray.get(
                    [
                        s.apply_jump.remote([answers[q][p] for q in range(P)])
                        for p, s in enumerate(shards)
                    ]
                )
            )
            if changed == 0:
                break
        else:
            raise RuntimeError(
                f"connected_components_bsp did not converge in {max_iters} rounds"
            )
        tables = ray.get([s.labels_table.remote() for s in shards])
    finally:
        for s in shards:
            ray.kill(s)
        shutil.rmtree(part_dir, ignore_errors=True)
    if stats is not None:
        stats["rounds"] = rounds
    return ray.data.from_arrow(tables)


# --------------------------------------------------------------------------
# Type-generic front-end: dictionary-encode non-int64 node ids so EVERY
# graph takes the fast BSP path (round-4: the Dataset loop used to be
# the mandatory fallback for string doc_ids — the one remaining
# diameter-bound CC path).
# --------------------------------------------------------------------------


def dense_rank_encode(
    nodes: ray.data.Dataset, *, num_partitions: int = 8
) -> ray.data.Dataset:
    """ORDER-PRESERVING dense-rank dictionary over DISTINCT ``node``
    values: returns (node, code:int64) with code = the node's rank in
    the global sort order, assigned distributed — sampled range
    boundaries (O(P) driver rows), per-range local sort + offset from
    a P-row count prefix sum (the ``corpus_shuffle`` rank pattern).
    Order preservation is what keeps min-label semantics exact: the
    min CODE in a component is the code of the min NODE, so decoded
    survivors are identical to running CC on the raw ids."""
    n = nodes.count()
    if n == 0:
        return nodes.map_batches(
            lambda b: pa.table(
                {"node": b["node"], "code": pa.array([], pa.int64())}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    P = max(1, num_partitions)
    frac = min(1.0, (128.0 * P) / n)
    sample = sorted(r["node"] for r in nodes.random_sample(frac, seed=42).take_all())
    step = max(1, len(sample) // P)
    bounds = sample[step::step][: P - 1]  # ≤ P-1 monotone boundaries
    bounds_arr = np.array(bounds, dtype=object)

    def tag(b: pa.Table) -> pa.Table:
        vals = b["node"].to_numpy(zero_copy_only=False)
        bkt = (
            np.searchsorted(bounds_arr, vals, side="right").astype(np.int64)
            if len(bounds_arr)
            else np.zeros(len(vals), np.int64)
        )
        return b.append_column("bucket", pa.array(bkt))

    tagged = nodes.map_batches(
        tag, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    from ray.data.aggregate import Count

    counts = {
        int(r["bucket"]): int(r["n"])
        for r in tagged.groupby("bucket").aggregate(Count(alias_name="n")).take_all()
    }  # ≤ P rows on the driver
    offsets: dict[int, int] = {}
    acc = 0
    for bkt in sorted(counts):
        offsets[bkt] = acc
        acc += counts[bkt]

    def rank_group(g: pa.Table) -> pa.Table:
        t = g.sort_by([("node", "ascending")])
        off = offsets[int(t["bucket"][0].as_py())]
        return pa.table(
            {
                "node": t["node"],
                "code": pa.array(off + np.arange(len(t), dtype=np.int64)),
            }
        )

    return tagged.groupby("bucket").map_groups(rank_group, batch_format="pyarrow")


def connected_components_auto(
    edges: ray.data.Dataset,
    nodes: ray.data.Dataset,
    *,
    num_partitions: int = 8,
    stats: dict | None = None,
) -> ray.data.Dataset:
    """Min-label connected components for ANY orderable node type via
    the BSP engine: int64 ids go straight in; other types (string
    doc_ids) are dense-rank dictionary-encoded first (order-preserving,
    so the decoded survivor is exactly the min original id), CC runs
    on int64 codes, and labels decode back through the dictionary.
    ``nodes`` must be DISTINCT and cover every edge endpoint (the CC
    contract).  Encode/decode cost: one count aggregate + two
    edge-side joins + one label-side join, all O(N + E) fixed-width
    rows — paid once, vs the Dataset loop's join+groupby PER ROUND."""
    node_type = nodes.schema().base_schema.field("node").type
    if pa.types.is_integer(node_type):
        return connected_components_bsp(
            edges, nodes, num_partitions=num_partitions, stats=stats
        )
    P = max(2, num_partitions)
    dict_ds = dense_rank_encode(nodes, num_partitions=P).materialize()
    code_nodes = dict_ds.map_batches(
        lambda b: pa.table({"node": b["code"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    u_side = dict_ds.map_batches(
        lambda b: pa.table({"u_id": b["node"], "u_code": b["code"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    v_side = dict_ds.map_batches(
        lambda b: pa.table({"v_id": b["node"], "v_code": b["code"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    code_edges = (
        edges.join(
            u_side,
            join_type="inner",
            num_partitions=P,
            on=("u",),
            right_on=("u_id",),
        )
        .join(
            v_side,
            join_type="inner",
            num_partitions=P,
            on=("v",),
            right_on=("v_id",),
        )
        .map_batches(
            lambda b: pa.table({"u": b["u_code"], "v": b["v_code"]}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    labels = connected_components_bsp(
        code_edges, code_nodes, num_partitions=num_partitions, stats=stats
    )
    # decode BOTH columns with one dictionary pass: join node codes
    # back to ids; the label column decodes via the same dict keyed on
    # the label code (order preservation ⇒ decoded label = min id).
    lab_side = dict_ds.map_batches(
        lambda b: pa.table({"l_code": b["code"], "l_id": b["node"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return (
        labels.join(
            dict_ds.map_batches(
                lambda b: pa.table({"n_code": b["code"], "n_id": b["node"]}),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ),
            join_type="inner",
            num_partitions=P,
            on=("node",),
            right_on=("n_code",),
        )
        .join(
            lab_side,
            join_type="inner",
            num_partitions=P,
            on=("label",),
            right_on=("l_code",),
        )
        .map_batches(
            lambda b: pa.table({"node": b["n_id"], "label": b["l_id"]}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )

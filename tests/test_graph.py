"""Connected-components primitive (stages/graph.py) vs a reference
union-find, plus the dedup_clusters survivor semantics."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data


def _uf_labels(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    # canonical label = min node id of the component
    comp = {}
    for x in range(n_nodes):
        comp.setdefault(find(x), []).append(x)
    out = {}
    for members in comp.values():
        m = min(members)
        for x in members:
            out[x] = m
    return out


def _run_cc(nodes, edges, **kw):
    from tartare_ray.stages.graph import connected_components

    e = ray.data.from_arrow(
        pa.table(
            {
                "u": pa.array([u for u, _ in edges], pa.int64()),
                "v": pa.array([v for _, v in edges], pa.int64()),
            }
        )
    )
    n = ray.data.from_arrow(pa.table({"node": pa.array(nodes, pa.int64())}))
    res = connected_components(e, n, **kw)
    t = pa.concat_tables(res.iter_batches(batch_format="pyarrow"))
    return dict(zip(t["node"].to_pylist(), t["label"].to_pylist()))


def test_cc_random_graph_matches_union_find(ray_session):
    rng = np.random.default_rng(7)
    n = 60
    edges = [tuple(sorted(p)) for p in rng.integers(0, n, size=(45, 2)) if p[0] != p[1]]
    got = _run_cc(list(range(n)), edges)
    assert got == _uf_labels(n, edges)


def test_cc_chain_star_isolated_and_duplicates(ray_session):
    # a 7-chain (diameter stress), a star, reversed + duplicate edges,
    # and isolated nodes 100/101
    edges = [(1, 2), (3, 2), (3, 4), (5, 4), (5, 6), (7, 6), (7, 8)]
    edges += [(20, 21), (20, 22), (22, 20), (20, 21)]
    nodes = [1, 2, 3, 4, 5, 6, 7, 8, 20, 21, 22, 100, 101]
    got = _run_cc(nodes, edges)
    assert {k: v for k, v in got.items() if k <= 8} == {i: 1 for i in range(1, 9)}
    assert got[20] == got[21] == got[22] == 20
    assert got[100] == 100 and got[101] == 101


def test_cc_no_edges_is_identity(ray_session):
    got = _run_cc([4, 9, 2], [])
    assert got == {4: 4, 9: 9, 2: 2}


def test_cc_nonconvergence_raises(ray_session):
    from tartare_ray.stages.graph import connected_components

    e = ray.data.from_arrow(
        pa.table({"u": pa.array([0, 1, 2], pa.int64()), "v": pa.array([1, 2, 3], pa.int64())})
    )
    n = ray.data.from_arrow(pa.table({"node": pa.array([0, 1, 2, 3], pa.int64())}))
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(e, n, max_iters=1)


def test_dedup_clusters_survivor_is_component_min(ray_session):
    from tartare_ray.pipelines.queries import dedup_clusters

    res = dedup_clusters("/root/testdata/sf0.001")
    t = pa.concat_tables(res.iter_batches(batch_format="pyarrow"))
    ids = t["doc_id"].to_pylist()
    labels = t["cluster_id"].to_pylist()
    assert sorted(ids) == sorted(set(ids))  # one row per doc
    by_label = {}
    for i, l in zip(ids, labels):
        by_label.setdefault(l, []).append(i)
    for l, members in by_label.items():
        assert l == min(members)  # survivor = component min


def test_cc_string_nodes(ray_session):
    """Node type is generic: string doc_ids, survivor = lexicographic min."""
    from tartare_ray.stages.graph import connected_components

    e = ray.data.from_arrow(
        pa.table(
            {
                "u": pa.array(["b", "c", "x"], pa.string()),
                "v": pa.array(["a", "b", "y"], pa.string()),
            }
        )
    )
    n = ray.data.from_arrow(
        pa.table({"node": pa.array(["a", "b", "c", "x", "y", "lone"], pa.string())})
    )
    res = connected_components(e, n)
    t = pa.concat_tables(res.iter_batches(batch_format="pyarrow"))
    got = dict(zip(t["node"].to_pylist(), t["label"].to_pylist()))
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x", "lone": "lone"}


def test_cc_auto_string_nodes_via_bsp_dictionary(ray_session):
    """connected_components_auto dictionary-encodes string doc_ids
    (order-preserving dense rank) and runs the BSP engine: survivors
    are the exact lexicographic-min ids, including on a 60-node chain
    that needs pointer jumping (the case the Dataset loop is
    diameter-bound on)."""
    from tartare_ray.stages.graph import connected_components_auto

    # chain d000-d001-...-d059 (one component, min = d000), plus a
    # triangle and an isolated node
    chain = [f"d{i:03d}" for i in range(60)]
    edges_u = chain[1:] + ["t2", "t3", "t3"]
    edges_v = chain[:-1] + ["t1", "t1", "t2"]
    nodes = chain + ["t1", "t2", "t3", "lone"]
    e = ray.data.from_arrow(
        pa.table(
            {
                "u": pa.array(edges_u, pa.string()),
                "v": pa.array(edges_v, pa.string()),
            }
        )
    )
    n = ray.data.from_arrow(pa.table({"node": pa.array(nodes, pa.string())}))
    stats = {}
    res = connected_components_auto(e, n, num_partitions=4, stats=stats)
    t = pa.concat_tables(res.iter_batches(batch_format="pyarrow"))
    got = dict(zip(t["node"].to_pylist(), t["label"].to_pylist()))
    want = {c: "d000" for c in chain}
    want.update({"t1": "t1", "t2": "t1", "t3": "t1", "lone": "lone"})
    assert got == want
    # pointer jumping must have kicked in: far fewer rounds than the
    # 60-node chain diameter
    assert stats["rounds"] <= 12


def test_cc_auto_int_nodes_take_bsp_directly(ray_session):
    """int64 graphs skip the dictionary: auto == union-find labels."""
    from tartare_ray.stages.graph import connected_components_auto

    rng = np.random.default_rng(7)
    n_nodes = 300
    edges = [tuple(map(int, e)) for e in rng.integers(0, n_nodes, (400, 2))]
    e = ray.data.from_arrow(
        pa.table(
            {
                "u": pa.array([u for u, _ in edges], pa.int64()),
                "v": pa.array([v for _, v in edges], pa.int64()),
            }
        )
    )
    n = ray.data.from_arrow(
        pa.table({"node": pa.array(list(range(n_nodes)), pa.int64())})
    )
    res = connected_components_auto(e, n, num_partitions=4)
    t = pa.concat_tables(res.iter_batches(batch_format="pyarrow"))
    got = dict(zip(t["node"].to_pylist(), t["label"].to_pylist()))
    assert got == _uf_labels(n_nodes, edges)


def test_dense_rank_encode_is_order_isomorphic(ray_session):
    """codes are 0..N-1 and sorted(code) order == sorted(node) order."""
    from tartare_ray.stages.graph import dense_rank_encode

    vals = [f"k{i:04d}" for i in range(500)]
    rng = np.random.default_rng(3)
    rng.shuffle(vals)
    ds = ray.data.from_arrow(pa.table({"node": pa.array(vals, pa.string())}))
    t = pa.concat_tables(
        dense_rank_encode(ds, num_partitions=6).iter_batches(batch_format="pyarrow")
    )
    m = dict(zip(t["node"].to_pylist(), t["code"].to_pylist()))
    assert sorted(m.values()) == list(range(500))
    ordered = sorted(m)
    assert [m[k] for k in ordered] == list(range(500))


def test_cc_bsp_matches_dataset_loop_and_union_find(ray_session):
    """BSP actor implementation (persistent partition state, message
    passing) is semantically identical to the Dataset loop."""
    from tartare_ray.stages.graph import connected_components_bsp

    rng = np.random.default_rng(13)
    n = 80
    edges = [tuple(p) for p in rng.integers(0, n, size=(60, 2)) if p[0] != p[1]]
    e = ray.data.from_arrow(
        pa.table(
            {
                "u": pa.array([u for u, _ in edges], pa.int64()),
                "v": pa.array([v for _, v in edges], pa.int64()),
            }
        )
    )
    nd = ray.data.from_arrow(pa.table({"node": pa.array(range(n), pa.int64())}))
    res = connected_components_bsp(e, nd, num_partitions=3)
    t = pa.concat_tables(res.iter_batches(batch_format="pyarrow"))
    got = dict(zip(t["node"].to_pylist(), t["label"].to_pylist()))
    assert got == _uf_labels(n, edges)


def test_cc_bsp_chain_and_no_edges(ray_session):
    from tartare_ray.stages.graph import connected_components_bsp

    # 9-chain: diameter stress for the round loop
    e = ray.data.from_arrow(
        pa.table(
            {
                "u": pa.array(list(range(10, 18)), pa.int64()),
                "v": pa.array(list(range(11, 19)), pa.int64()),
            }
        )
    )
    nd = ray.data.from_arrow(pa.table({"node": pa.array(list(range(10, 19)) + [99], pa.int64())}))
    t = pa.concat_tables(
        connected_components_bsp(e, nd, num_partitions=2).iter_batches(batch_format="pyarrow")
    )
    got = dict(zip(t["node"].to_pylist(), t["label"].to_pylist()))
    assert got == {**{i: 10 for i in range(10, 19)}, 99: 99}


def test_cc_bsp_pointer_jump_long_chain(ray_session):
    """Adversarial chains (round-4 verdict item #3): pointer jumping
    bounds rounds at O(log diameter).  A 129-node path (diameter 128)
    must converge in <= ~log2(128)+2 rounds and a diameter-16 chain in
    <= 5, both union-find-exact."""
    from tartare_ray.stages.graph import connected_components_bsp

    for n, max_rounds in [(17, 5), (129, 10)]:
        e = ray.data.from_arrow(
            pa.table(
                {
                    "u": pa.array(list(range(n - 1)), pa.int64()),
                    "v": pa.array(list(range(1, n)), pa.int64()),
                }
            )
        )
        nd = ray.data.from_arrow(pa.table({"node": pa.array(range(n), pa.int64())}))
        stats = {}
        res = connected_components_bsp(e, nd, num_partitions=3, stats=stats)
        t = pa.concat_tables(res.iter_batches(batch_format="pyarrow"))
        got = dict(zip(t["node"].to_pylist(), t["label"].to_pylist()))
        assert got == {i: 0 for i in range(n)}
        assert stats["rounds"] <= max_rounds, (n, stats)


def test_cc_bsp_rejects_uncovered_endpoints(ray_session):
    from tartare_ray.stages.graph import connected_components_bsp

    e = ray.data.from_arrow(
        pa.table({"u": pa.array([1], pa.int64()), "v": pa.array([2], pa.int64())})
    )
    nd = ray.data.from_arrow(pa.table({"node": pa.array([1], pa.int64())}))
    with pytest.raises(Exception, match="missing from the nodes"):
        connected_components_bsp(e, nd, num_partitions=2)


from hypothesis import given, settings
from hypothesis import strategies as st


@pytest.mark.slow
@settings(max_examples=5, deadline=None)
@given(
    n=st.integers(min_value=2, max_value=40),
    edges=st.lists(
        st.tuples(st.integers(0, 39), st.integers(0, 39)), max_size=40
    ),
)
def test_cc_property_matches_union_find(ray_session, n, edges):
    """Property: for ANY graph, both CC implementations equal the
    union-find fold (nodes clamped into range, self-loops dropped)."""
    from tartare_ray.stages.graph import connected_components_bsp

    edges = [(u % n, v % n) for u, v in edges if u % n != v % n]
    got = _run_cc(list(range(n)), edges)
    exp = _uf_labels(n, edges)
    assert got == exp
    e = ray.data.from_arrow(
        pa.table(
            {
                "u": pa.array([u for u, _ in edges], pa.int64()),
                "v": pa.array([v for _, v in edges], pa.int64()),
            }
        )
    )
    nd = ray.data.from_arrow(pa.table({"node": pa.array(range(n), pa.int64())}))
    t = pa.concat_tables(
        connected_components_bsp(e, nd, num_partitions=2).iter_batches(
            batch_format="pyarrow"
        )
    )
    assert dict(zip(t["node"].to_pylist(), t["label"].to_pylist())) == exp

"""Transform-step registry: declared-order chaining over a Dataset
(tartare's preprocess-chain contract, SURVEY.md §2A extension surface)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def test_registry_pipeline_order(ray_session):
    import ray.data

    from tartare_ray.functions.registry import StepSpec, build_pipeline, get_step, register_step

    @register_step("add_one")
    def add_one(b: pa.Table) -> pa.Table:
        return b.set_column(0, "x", pc.add(b["x"], 1))

    @register_step("scale")
    class Scale:
        def __init__(self, factor: int):
            self.factor = factor

        def __call__(self, b: pa.Table) -> pa.Table:
            return b.set_column(0, "x", pc.multiply(b["x"], self.factor))

    assert not get_step("add_one").stateful
    assert get_step("scale").stateful

    ds = ray.data.from_arrow(pa.table({"x": pa.array([1, 2, 3], pa.int64())}))
    out = build_pipeline(
        ds,
        [StepSpec("add_one"), StepSpec("scale", kwargs={"factor": 10}, concurrency=1)],
    )
    assert sorted(r["x"] for r in out.take_all()) == [20, 30, 40]  # (x+1)*10, order matters

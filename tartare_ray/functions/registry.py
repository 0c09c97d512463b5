"""Transform-step registry — the user-extension surface.

Reference analogue: tartare's preprocess registry
(`tartare/processes/processes.py::PreProcessManager`, processes named
in contributor/coverage JSON and dispatched by name `[UNVERIFIED —
empty checkout, SURVEY.md §0 / §2A "User-extension surface"]`).

Here a *step* is either a pure function ``fn(batch: pa.Table) ->
pa.Table`` (stateless → one ``map_batches`` task stage) or a callable
class (stateful → actor-pool stage; constructor kwargs come from the
pipeline config).  ``build_pipeline`` strings registered steps over a
``ray.data.Dataset`` in declared order, mirroring tartare's
"preprocesses run in declared order" contract.
"""

from __future__ import annotations

import inspect
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

import ray.data

_REGISTRY: dict[str, "Step"] = {}


@dataclass(frozen=True)
class Step:
    name: str
    fn: Callable
    stateful: bool
    batch_format: str = "pyarrow"
    zero_copy_batch: bool = True
    # Row-dropping steps need special placement on the CDC ingest
    # path: they must run BEFORE the validate stage's per-batch
    # latest-per-key pre-reduce, or whether an older event resurfaces
    # for a filtered-out winner would depend on batch boundaries
    # (batch-layout-dependent committed state).  Flagged steps are
    # hoisted into the validate stage; they must be stateless and
    # pyarrow-format.
    row_filter: bool = False


def register_step(name: str, *, batch_format: str = "pyarrow", row_filter: bool = False):
    """Decorator: ``@register_step("my_step")`` over a function or a
    callable class.  Classes are stateful (actor pool); functions are
    stateless (tasks).  Pass ``row_filter=True`` for steps that DROP
    rows (see ``Step.row_filter``)."""

    def deco(obj):
        if row_filter and inspect.isclass(obj):
            raise ValueError(f"row_filter step {name!r} must be a function")
        _REGISTRY[name] = Step(
            name=name,
            fn=obj,
            stateful=inspect.isclass(obj),
            batch_format=batch_format,
            zero_copy_batch=batch_format == "pyarrow",
            row_filter=row_filter,
        )
        return obj

    return deco


def get_step(name: str) -> Step:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown step {name!r}; registered: {sorted(_REGISTRY)}"
        ) from None


def registered_steps() -> list[str]:
    return sorted(_REGISTRY)


@dataclass(frozen=True)
class StepSpec:
    """One entry of a pipeline config: a registered step name plus its
    kwargs (constructor kwargs for stateful steps, ignored extras for
    stateless) and stage sizing."""

    name: str
    kwargs: dict[str, Any] = field(default_factory=dict)
    concurrency: int | tuple[int, int] | None = None
    batch_size: int | None = None
    num_cpus: float | None = None


def build_pipeline(ds: ray.data.Dataset, steps: list[StepSpec]) -> ray.data.Dataset:
    """Apply registered steps in declared order (tartare's preprocess
    chain, Ray-Data-first: each step is one streaming stage)."""
    for spec in steps:
        step = get_step(spec.name)
        common = dict(
            batch_format=step.batch_format,
            zero_copy_batch=step.zero_copy_batch,
            batch_size=spec.batch_size,
        )
        if spec.num_cpus is not None:
            common["num_cpus"] = spec.num_cpus
        if step.stateful:
            conc = spec.concurrency if spec.concurrency is not None else 2
            ds = ds.map_batches(
                step.fn,
                fn_constructor_kwargs=spec.kwargs,
                concurrency=conc,
                **common,
            )
        else:
            fn = step.fn if not spec.kwargs else (
                lambda b, _f=step.fn, _kw=spec.kwargs: _f(b, **_kw)
            )
            if spec.concurrency is not None:
                common["concurrency"] = spec.concurrency
            ds = ds.map_batches(fn, **common)
    return ds

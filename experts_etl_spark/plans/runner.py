"""Dependency-ordered pipeline runner (SURVEY.md §3.1).

The reference's orchestrator is a daemon that forks one OS process per
module every 4 hours, with the dependency topology hand-encoded as a
module list — orgs before persons before pubs (runner.py:15-47,97-112).

Spark-first, the "plan" stops being a process list: each module is a
function producing named datasets from named datasets, and the runner
topologically sorts the declared dependencies.  Parallelism inside a
stage comes from Spark itself; the runner only sequences *stages*.
There is deliberately no daemon here — scheduling is an external
concern (cron/Airflow/`availableNow`), per SURVEY.md §2.10 C7.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Module:
    """One pipeline stage: consumes ``inputs`` datasets, produces
    ``outputs`` datasets via ``fn(spark, datasets) -> {name: DataFrame}``."""

    name: str
    inputs: Sequence[str]
    outputs: Sequence[str]
    fn: Callable[[SparkSession, Mapping[str, DataFrame]], Mapping[str, DataFrame]]


class CycleError(ValueError):
    pass


def topo_order(modules: Sequence[Module]) -> list[Module]:
    """Kahn's algorithm over dataset dependencies.  A module runs after
    every module that produces one of its inputs; inputs nobody produces
    are sources (pre-seeded datasets)."""
    producers: dict[str, Module] = {}
    for m in modules:
        for out in m.outputs:
            if out in producers:
                raise ValueError(f"dataset {out!r} produced twice")
            producers[out] = m
    deps: dict[str, set[str]] = {
        m.name: {producers[i].name for i in m.inputs if i in producers}
        for m in modules
    }
    ordered: list[Module] = []
    ready = sorted(name for name, d in deps.items() if not d)
    by_name = {m.name: m for m in modules}
    while ready:
        cur = ready.pop(0)
        ordered.append(by_name[cur])
        for name in sorted(deps):
            if cur in deps[name]:
                deps[name].discard(cur)
                if not deps[name] and by_name[name] not in ordered and name not in ready:
                    ready.append(name)
        ready.sort()
    if len(ordered) != len(modules):
        remaining = sorted(set(by_name) - {m.name for m in ordered})
        raise CycleError(f"dependency cycle among {remaining}")
    return ordered


def run_modules(
    spark: SparkSession,
    modules: Sequence[Module],
    sources: Mapping[str, DataFrame],
) -> dict[str, DataFrame]:
    """Execute modules in dependency order against a shared dataset
    namespace; returns every dataset produced.  Lazy throughout — the
    caller decides what to materialize (write/collect), so independent
    sinks still share scan/shuffle work via Spark's own plan reuse."""
    datasets: dict[str, DataFrame] = dict(sources)
    for m in topo_order(modules):
        missing = [i for i in m.inputs if i not in datasets]
        if missing:
            raise KeyError(f"module {m.name!r}: missing inputs {missing}")
        produced = m.fn(spark, datasets)
        for out in m.outputs:
            if out not in produced:
                raise KeyError(f"module {m.name!r} did not produce {out!r}")
        datasets.update(produced)
    return datasets

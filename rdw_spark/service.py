"""Query service layer: concurrency pools + timeouts (SURVEY §4 X5/X11).

The reference manages concurrent reporting load with Redshift WLM queues
and per-service query pools (`query-pool-size: 6`,
config/rdw-reporting-aggregate-service.yml:27;
docs/PerformanceTuning.Redshift.md:28-59) and bounds runaway queries with
JDBC timeout interceptors (30 s default, 240 s admin,
config/application.yml:164, config/rdw-reporting-admin-service.yml:31).

Spark-first mapping:

- **Pools** → the FAIR scheduler: each request class (interactive
  individual reports, heavy aggregate reports, admin) runs its jobs in a
  named scheduler pool with its own weight/minShare, so one tenant's
  aggregate sweep can't starve interactive traffic. Pool assignment is a
  thread-local Spark property — exactly how a multi-user Spark service
  (Thrift server) isolates sessions.
- **Timeouts** → job groups + ``cancelJobGroup``: the query runs under a
  per-request job group; a watchdog cancels the whole group at the
  deadline. Cancellation is cooperative at task boundaries — the Spark
  analog of the reference's statement-interceptor timeout.

At 100 TB these are the controls that keep a shared cluster responsive;
in local tests they exercise the same code paths on small jobs.
"""

from __future__ import annotations

import os
import tempfile
import threading
import uuid
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession


class QueryTimeout(Exception):
    """Raised when a query exceeds its pool's deadline and was cancelled."""


@dataclass(frozen=True)
class Pool:
    """One request class: scheduling weight + default deadline."""

    name: str
    weight: int = 1
    min_share: int = 0
    timeout_s: float = 30.0  # reference default JDBC timeout


# the reference's three request classes (individual / aggregate / admin)
DEFAULT_POOLS = (
    Pool("interactive", weight=4, min_share=2, timeout_s=30.0),
    Pool("aggregate", weight=2, min_share=1, timeout_s=30.0),
    Pool("admin", weight=1, min_share=0, timeout_s=240.0),
)


def allocation_file(pools: tuple[Pool, ...]) -> str:
    """Write a FAIR-scheduler allocation XML for ``pools`` and return its
    path — pass as ``spark.scheduler.allocation.file`` with
    ``spark.scheduler.mode=FAIR`` at session build."""
    rows = "\n".join(
        f'  <pool name="{p.name}">\n'
        f"    <schedulingMode>FAIR</schedulingMode>\n"
        f"    <weight>{p.weight}</weight>\n"
        f"    <minShare>{p.min_share}</minShare>\n"
        f"  </pool>"
        for p in pools
    )
    fd, path = tempfile.mkstemp(suffix=".xml", prefix="rdw_pools_")
    with os.fdopen(fd, "w") as fh:
        fh.write(f"<?xml version=\"1.0\"?>\n<allocations>\n{rows}\n</allocations>\n")
    return path


@dataclass
class QueryService:
    """Runs request callables inside a named pool with a deadline."""

    spark: SparkSession
    pools: dict[str, Pool] = field(
        default_factory=lambda: {p.name: p for p in DEFAULT_POOLS}
    )

    def run(
        self,
        fn: Callable[[], Any],
        pool: str = "interactive",
        timeout_s: float | None = None,
        description: str = "",
    ) -> Any:
        """Execute ``fn`` (which should trigger Spark actions) in ``pool``,
        cancelling every job it started if the deadline passes. Raises
        QueryTimeout on cancellation, re-raises ``fn``'s own errors."""
        p = self.pools[pool]
        deadline = timeout_s if timeout_s is not None else p.timeout_s
        sc = self.spark.sparkContext
        group = f"{pool}-{uuid.uuid4().hex[:12]}"
        result: dict[str, Any] = {}
        error: list[BaseException] = []

        def work() -> None:
            # job group + pool are THREAD-local Spark properties: they must
            # be set on the thread that triggers the actions
            sc.setLocalProperty("spark.scheduler.pool", p.name)
            sc.setJobGroup(group, description or f"{pool} query", True)
            try:
                result["value"] = fn()
            except BaseException as exc:  # noqa: BLE001 — reported to caller
                error.append(exc)
            finally:
                sc.setLocalProperty("spark.scheduler.pool", None)
                if hasattr(sc, "clearJobGroup"):
                    sc.clearJobGroup()
                else:
                    # PySpark 4 dropped clearJobGroup; resetting the
                    # thread-local properties is exactly what it did
                    sc.setLocalProperty("spark.jobGroup.id", None)
                    sc.setLocalProperty("spark.job.interruptOnCancel", None)

        t = threading.Thread(target=work, daemon=True)
        t.start()
        t.join(deadline)
        if t.is_alive():
            sc.cancelJobGroup(group)
            t.join(10.0)  # cancellation is cooperative at task boundaries
            raise QueryTimeout(
                f"{pool} query exceeded {deadline:.0f}s and was cancelled"
                + (f": {description}" if description else "")
            )
        if error:
            raise error[0]
        return result.get("value")

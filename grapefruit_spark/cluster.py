"""Cluster introspection — the reference's membership CLI surface.

Reference (/root/reference/src/main/java/edu/cs425/mp3/MembershipServer.java):
``info`` prints node id / heartbeat / timestamps / status; ``ls`` prints
the membership list; ``join``/``leave``/``switch`` manage membership.
On Spark, membership is the cluster manager's job — joins/leaves are
executor add/remove events — so this module exposes the equivalent
read-only views. The mutation commands intentionally do not exist.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass(frozen=True)
class NodeInfo:
    """Reference ``info`` equivalent for the driver 'node'."""

    app_id: str
    app_name: str
    master: str
    spark_version: str
    started_at_ms: int
    uptime_s: float
    default_parallelism: int
    status: str


def info(spark: SparkSession) -> NodeInfo:
    sc = spark.sparkContext
    start = sc.startTime
    return NodeInfo(
        app_id=sc.applicationId,
        app_name=sc.appName,
        master=sc.master,
        spark_version=spark.version,
        started_at_ms=start,
        uptime_s=round(time.time() - start / 1000.0, 3),
        default_parallelism=sc.defaultParallelism,
        status="ALIVE",
    )


def members(spark: SparkSession) -> list[dict]:
    """Reference ``ls`` (membership list) equivalent: one row per executor
    as tracked by the scheduler (driver included in local mode)."""
    sc = spark.sparkContext
    tracker = sc._jsc.sc().statusTracker()
    ids = list(tracker.getExecutorInfos())
    out = []
    for e in ids:
        out.append(
            {
                "executor": e.host(),
                "n_running_tasks": e.numRunningTasks(),
                "status": "ALIVE",
            }
        )
    return out


def conf_dump(spark: SparkSession) -> dict[str, str]:
    """Engine-relevant runtime confs (the knobs SURVEY §6 relies on)."""
    keys = (
        "spark.sql.shuffle.partitions",
        "spark.sql.adaptive.enabled",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.files.maxPartitionBytes",
        "spark.sql.session.timeZone",
    )
    return {k: spark.conf.get(k, "<unset>") for k in keys}

"""Per-tag cost attribution (G4): the Snowflake RESOURCE_MONITOR /
ACCOUNT_USAGE.QUERY_HISTORY reporting analog (reference README.md:63,
76,129-133 — per-workload credit tracking via QUERY_TAG).

Workloads are tagged with :func:`..session.query_tag`, which maps the
tag onto the Spark job group. Spark's own ``AppStatusListener``
already aggregates task metrics per stage into the driver's
``AppStatusStore`` (the store the UI serves, populated whether or not
the UI is enabled); :func:`cost_report` reads that store, joins stages
to their owning job's group, and emits one row per tag — no custom
listener thread, no event-log parsing, works on any deployment.

On a real cluster the same report prices workloads: task_time_ms is
the executor-core-time a tag consumed (the direct FinOps unit),
shuffle/input bytes show who moves the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

UNTAGGED = "(untagged)"

_SCHEMA = (
    "query_tag string, n_jobs long, n_stages long, n_tasks long, "
    "task_time_ms long, input_bytes long, output_bytes long, "
    "shuffle_read_bytes long, shuffle_write_bytes long"
)


def cost_report(spark: SparkSession,
                include_untagged: bool = True) -> DataFrame:
    """Aggregate task metrics per query_tag job group for every job
    this application has run so far. Returns a DataFrame
    ``(query_tag, n_jobs, n_stages, n_tasks, task_time_ms,
    input_bytes, output_bytes, shuffle_read_bytes,
    shuffle_write_bytes)`` sorted by task_time_ms descending.

    A stage shared by jobs in different groups (cached exchange reuse)
    is attributed to the first group that submitted it; metric totals
    are never double-counted.
    """
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    gw = sc._gateway

    # stage -> owning tag, first-submitter wins (jobsList is newest-
    # first; walk it reversed so the earliest job claims the stage)
    jobs = store.jobsList(None)
    job_rows: list[tuple[str, int, list[int]]] = []
    for i in range(jobs.size()):
        j = jobs.apply(i)
        grp = j.jobGroup()
        tag = grp.get() if grp.isDefined() and grp.get() else UNTAGGED
        sids = [j.stageIds().apply(k) for k in range(j.stageIds().size())]
        job_rows.append((tag, j.jobId(), sids))
    stage_owner: dict[int, str] = {}
    n_jobs: dict[str, int] = {}
    for tag, _jid, sids in sorted(job_rows, key=lambda r: r[1]):
        n_jobs[tag] = n_jobs.get(tag, 0) + 1
        for sid in sids:
            stage_owner.setdefault(sid, tag)

    # stageList(statuses, details, withSummaries, unsortedQuantiles,
    # taskStatus) — the v1 API signature; we want summary rows only
    stages = store.stageList(None, False, False, gw.new_array(gw.jvm.double, 0), None)
    agg: dict[str, list[int]] = {}
    for i in range(stages.size()):
        s = stages.apply(i)
        tag = stage_owner.get(s.stageId())
        if tag is None:  # stage not owned by any recorded job
            continue
        a = agg.setdefault(tag, [0] * 7)
        a[0] += 1
        a[1] += s.numTasks()
        a[2] += s.executorRunTime()
        a[3] += s.inputBytes()
        a[4] += s.outputBytes()
        a[5] += s.shuffleReadBytes()
        a[6] += s.shuffleWriteBytes()

    rows = [
        (tag, n_jobs.get(tag, 0), a[0], a[1], a[2], a[3], a[4], a[5], a[6])
        for tag, a in agg.items()
        if include_untagged or tag != UNTAGGED
    ]
    out = spark.createDataFrame(rows, _SCHEMA)
    return out.orderBy(out.task_time_ms.desc(), out.query_tag)

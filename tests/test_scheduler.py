"""Task scheduler (SURVEY.md M7, docs/10-maintenance-operations.md:
174-183): deterministic-clock tests for both public schedule forms,
RESUME/SUSPEND gating, AFTER task graphs, failure isolation, and an
end-to-end maintenance tick that actually compacts a table.
"""

from __future__ import annotations

import datetime as dt

import pytest

from icepack.scheduler import Schedule, ScheduleError, TaskScheduler
from icepack.sql import IceSQL


def ms(*args) -> int:
    return int(dt.datetime(*args, tzinfo=dt.timezone.utc).timestamp() * 1000)


def test_schedule_parsing_and_next_fire():
    s = Schedule("5 MINUTES")
    assert s.next_after(ms(2024, 1, 1, 0, 0)) == ms(2024, 1, 1, 0, 5)
    c = Schedule("USING CRON 0 2 * * * UTC")  # daily 02:00
    assert c.next_after(ms(2024, 1, 1, 0, 0)) == ms(2024, 1, 1, 2, 0)
    assert c.next_after(ms(2024, 1, 1, 2, 0)) == ms(2024, 1, 2, 2, 0)
    q = Schedule("USING CRON */15 * * * * UTC")
    assert q.next_after(ms(2024, 1, 1, 0, 7)) == ms(2024, 1, 1, 0, 15)
    wk = Schedule("USING CRON 30 3 * * 1 UTC")  # Mondays 03:30
    # 2024-01-01 is a Monday
    assert wk.next_after(ms(2024, 1, 1, 3, 30)) == ms(2024, 1, 8, 3, 30)
    # IANA timezone: 02:00 LA = 09:00 UTC in summer (DST), 10:00 in winter
    la = Schedule("USING CRON 0 2 * * * America/Los_Angeles")
    assert la.next_after(ms(2024, 6, 1, 0, 0)) == ms(2024, 6, 1, 9, 0)
    assert la.next_after(ms(2024, 1, 1, 0, 0)) == ms(2024, 1, 1, 10, 0)
    with pytest.raises(ScheduleError):
        Schedule("USING CRON 0 2 * * * Mars/Olympus_Mons")
    with pytest.raises(ScheduleError):
        Schedule("whenever")


@pytest.fixture()
def engine(spark, tmp_path):
    return IceSQL(spark, str(tmp_path / "wh"))


def _mk_table(engine, name="t1"):
    engine.sql(
        f"CREATE ICEBERG TABLE {name} (id BIGINT, v DOUBLE)"
    )
    engine.sql(f"INSERT INTO {name} VALUES (1, 1.0), (2, 2.0)")
    return name


def test_interval_task_runs_and_reschedules(engine):
    _mk_table(engine)
    engine.sql(
        "CREATE TASK tick SCHEDULE = '10 MINUTE' AS INSERT INTO t1 VALUES (99, 9.9)"
    )
    sch = TaskScheduler(engine)
    t0 = ms(2024, 6, 1, 12, 0)
    assert sch.run_due(t0) == []  # suspended: never runs
    engine.sql("ALTER TASK tick RESUME")
    assert sch.run_due(t0) == ["tick"]  # first tick after resume: due
    assert sch.run_due(t0 + 60_000) == []  # not due again yet
    assert sch.run_due(t0 + 600_000) == ["tick"]  # interval elapsed
    n = engine.sql("SELECT COUNT(*) AS n FROM t1").collect()[0].n
    assert n == 4  # 2 seed rows + 2 scheduled inserts
    task = engine.catalog._get_object("tasks", "tick")
    assert task["last_run_ms"] == t0 + 600_000
    assert task["next_run_ms"] == t0 + 1_200_000
    engine.sql("ALTER TASK tick SUSPEND")
    assert sch.run_due(t0 + 1_300_000) == []


def test_cron_task_waits_for_matching_instant(engine):
    _mk_table(engine)
    engine.sql(
        "CREATE TASK nightly SCHEDULE = 'USING CRON 0 2 * * * UTC' "
        "AS INSERT INTO t1 VALUES (7, 7.0)"
    )
    engine.sql("ALTER TASK nightly RESUME")
    sch = TaskScheduler(engine)
    assert sch.run_due(ms(2024, 6, 1, 1, 59)) == []  # resumed but not 02:00
    assert sch.run_due(ms(2024, 6, 1, 2, 0)) == ["nightly"]
    assert sch.run_due(ms(2024, 6, 1, 2, 5)) == []  # fired; next is tomorrow
    assert sch.run_due(ms(2024, 6, 2, 2, 0)) == ["nightly"]


def test_cron_dom_dow_or_semantics():
    """Standard cron (and Snowflake) OR the day-of-month and day-of-week
    fields when BOTH are restricted: '0 0 1 * 1' fires on the 1st AND on
    every Monday — not only when the 1st falls on a Monday."""
    s = Schedule("USING CRON 0 0 1 * 1 UTC")
    # 2024-01-29 is a Monday; the next match is Feb 1st (a Thursday) via
    # the dom leg.  AND semantics would skip to 2024-04-01 (Monday the
    # 1st) — three months late.
    assert s.next_after(ms(2024, 1, 29, 0, 0)) == ms(2024, 2, 1, 0, 0)
    # ...and the dow leg still fires on a plain Monday mid-month
    assert s.next_after(ms(2024, 2, 1, 0, 0)) == ms(2024, 2, 5, 0, 0)
    # single-restricted fields keep AND semantics
    only_dom = Schedule("USING CRON 0 0 15 * * UTC")
    assert only_dom.next_after(ms(2024, 1, 1, 0, 0)) == ms(2024, 1, 15, 0, 0)


def test_cron_first_fire_persisted_for_coarse_ticks(engine):
    """A 'USING CRON' task resumed between fires must persist its
    next_run_ms on the FIRST tick after RESUME, so an outer loop coarser
    than one minute (e.g. a 5-min k8s CronJob) still catches the fire on
    a later tick — instead of recomputing next_after(now-60s) forever
    and only firing if a tick lands within a minute of the instant."""
    _mk_table(engine)
    engine.sql(
        "CREATE TASK nightly SCHEDULE = 'USING CRON 0 2 * * * UTC' "
        "AS INSERT INTO t1 VALUES (7, 7.0)"
    )
    engine.sql("ALTER TASK nightly RESUME")
    sch = TaskScheduler(engine)
    # first tick lands at 01:03 — not due, but 02:00 gets persisted
    assert sch.run_due(ms(2024, 6, 1, 1, 3)) == []
    task = engine.catalog._get_object("tasks", "nightly")
    assert task["next_run_ms"] == ms(2024, 6, 1, 2, 0)
    # next tick is COARSE: 02:04, four minutes past the instant — with
    # the old recompute-each-tick logic this would be missed forever
    assert sch.run_due(ms(2024, 6, 1, 2, 4)) == ["nightly"]
    # and the fire rescheduled to tomorrow from the executed tick
    task = engine.catalog._get_object("tasks", "nightly")
    assert task["next_run_ms"] == ms(2024, 6, 2, 2, 0)


def test_after_child_halts_when_parent_fails(engine):
    """Snowflake task graphs halt at a failed predecessor: a child whose
    AFTER parent errored must NOT run, and the parent records the
    error."""
    _mk_table(engine)
    engine.sql(
        "CREATE TASK badroot SCHEDULE = '1 MINUTE' AS INSERT INTO missing VALUES (1)"
    )
    engine.sql("CREATE TASK kid AFTER badroot AS INSERT INTO t1 VALUES (50, 5.0)")
    engine.sql("ALTER TASK badroot RESUME")
    engine.sql("ALTER TASK kid RESUME")
    sch = TaskScheduler(engine)
    assert sch.run_due(ms(2024, 6, 1, 0, 0)) == ["badroot"]
    assert "last_error" in engine.catalog._get_object("tasks", "badroot")
    # the child never executed: no row 50, no last_run_ms
    n = engine.sql("SELECT COUNT(*) AS n FROM t1 WHERE id = 50").collect()[0].n
    assert n == 0
    assert "last_run_ms" not in engine.catalog._get_object("tasks", "kid")


def test_after_graph_cascades_in_order(engine):
    _mk_table(engine)
    engine.sql(
        "CREATE TASK root SCHEDULE = '1 MINUTE' AS INSERT INTO t1 VALUES (10, 1.0)"
    )
    engine.sql("CREATE TASK child AFTER root AS INSERT INTO t1 VALUES (11, 1.1)")
    engine.sql(
        "CREATE TASK grandchild AFTER child AS INSERT INTO t1 VALUES (12, 1.2)"
    )
    for t in ("root", "child", "grandchild"):
        engine.sql(f"ALTER TASK {t} RESUME")
    sch = TaskScheduler(engine)
    assert sch.run_due(ms(2024, 6, 1, 0, 0)) == ["root", "child", "grandchild"]
    # suspend the middle: the chain stops there (Snowflake graph rule)
    engine.sql("ALTER TASK child SUSPEND")
    assert sch.run_due(ms(2024, 6, 1, 0, 1)) == ["root"]


def test_failing_task_records_error_and_does_not_block(engine):
    _mk_table(engine)
    engine.sql("CREATE TASK bad SCHEDULE = '1 MINUTE' AS INSERT INTO missing VALUES (1)")
    engine.sql("CREATE TASK good SCHEDULE = '1 MINUTE' AS INSERT INTO t1 VALUES (5, 5.0)")
    engine.sql("ALTER TASK bad RESUME")
    engine.sql("ALTER TASK good RESUME")
    sch = TaskScheduler(engine)
    ran = sch.run_due(ms(2024, 6, 1, 0, 0))
    assert set(ran) == {"bad", "good"}
    assert "last_error" in engine.catalog._get_object("tasks", "bad")
    assert "last_error" not in engine.catalog._get_object("tasks", "good")
    # the bad task is rescheduled, not hot-looped: not due 1 s later
    assert sch.run_due(ms(2024, 6, 1, 0, 0) + 1000) == []


def test_maintenance_tick_compacts_for_real(engine, spark):
    """The docs/10 auto-maintenance story end to end: many small
    appends, a nightly OPTIMIZE task, one scheduler tick — file count
    drops and row content is unchanged."""
    engine.sql("CREATE ICEBERG TABLE m (id BIGINT, v DOUBLE)")
    for i in range(5):
        engine.sql(f"INSERT INTO m VALUES ({i}, {i}.5)")
    t = engine.catalog.load_table("m")
    before = len(t.live_files())
    assert before >= 5
    engine.sql(
        "CREATE TASK opt SCHEDULE = 'USING CRON 0 3 * * * UTC' AS ALTER ICEBERG TABLE m COMPACT DATA"
    )
    engine.sql("ALTER TASK opt RESUME")
    ran = TaskScheduler(engine).run_due(ms(2024, 6, 1, 3, 0))
    assert ran == ["opt"]
    t.refresh()
    assert len(t.live_files()) < before
    got = sorted((r.id, r.v) for r in t.toDF().collect())
    assert got == [(i, i + 0.5) for i in range(5)]


def test_cron_next_fire_properties():
    """Property check (hypothesis): for random cron subsets and random
    instants, next_after is strictly in the future, lands on a matching
    instant in the schedule's timezone, and there is no EARLIER
    matching minute after the input — i.e. it is the true infimum."""
    import datetime as dtm

    from hypothesis import given, settings
    from hypothesis import strategies as st

    def field(lo, hi):
        return st.one_of(
            st.just("*"),
            st.sampled_from([f"*/{s}" for s in (2, 5, 15)]),
            st.lists(
                st.integers(lo, hi), min_size=1, max_size=3, unique=True
            ).map(lambda xs: ",".join(map(str, sorted(xs)))),
        )

    @settings(max_examples=60, deadline=None)
    @given(
        mi=field(0, 59),
        hr=field(0, 23),
        tz=st.sampled_from(["UTC", "America/Los_Angeles", "Asia/Tokyo"]),
        t0=st.integers(
            int(dtm.datetime(2024, 1, 1, tzinfo=dtm.timezone.utc).timestamp()),
            int(dtm.datetime(2025, 12, 31, tzinfo=dtm.timezone.utc).timestamp()),
        ),
    )
    def check(mi, hr, tz, t0):
        s = Schedule(f"USING CRON {mi} {hr} * * * {tz}")
        t0_ms = t0 * 1000
        nxt = s.next_after(t0_ms)
        assert nxt > t0_ms
        local = dtm.datetime.fromtimestamp(nxt / 1000, tz=s.tz)
        assert local.second == 0 and local.microsecond == 0
        assert s.minute is None or local.minute in s.minute
        assert s.hour is None or local.hour in s.hour
        # infimum: every whole minute strictly between t0 and nxt fails
        t = dtm.datetime.fromtimestamp(t0_ms / 1000, tz=s.tz).replace(
            second=0, microsecond=0
        ) + dtm.timedelta(minutes=1)
        probes = 0
        while int(t.timestamp() * 1000) < nxt and probes < 2000:
            assert not (
                (s.minute is None or t.minute in s.minute)
                and (s.hour is None or t.hour in s.hour)
            )
            t += dtm.timedelta(minutes=1)
            probes += 1

    check()


def test_show_tasks_surfaces_scheduler_state(engine):
    _mk_table(engine)
    engine.sql("CREATE TASK a SCHEDULE = '5 MINUTE' AS INSERT INTO t1 VALUES (1, 1.0)")
    engine.sql("CREATE TASK b AFTER a AS INSERT INTO t1 VALUES (2, 2.0)")
    engine.sql("ALTER TASK a RESUME")
    TaskScheduler(engine).run_due(ms(2024, 6, 1, 0, 0))
    rows = {r.name: r for r in engine.sql("SHOW TASKS").collect()}
    assert rows["a"].state == "started" and rows["a"].schedule == "5 MINUTE"
    assert rows["a"].last_run_ms == ms(2024, 6, 1, 0, 0)
    assert rows["a"].next_run_ms == ms(2024, 6, 1, 0, 5)
    assert rows["b"].after == "a" and rows["b"].state == "suspended"


def test_background_loop_ticks_and_stops(engine):
    """The optional in-process wall-clock loop: a short-interval task
    executes without any explicit run_due calls, and stop() joins the
    thread.  The deterministic run_due core stays the tested surface —
    this only proves the thread adds a working clock."""
    import time

    _mk_table(engine)
    engine.sql(
        "CREATE TASK bg SCHEDULE = '1 MINUTE' AS INSERT INTO t1 VALUES (7, 7.0)"
    )
    engine.sql("ALTER TASK bg RESUME")
    sch = TaskScheduler(engine)

    def _count():
        return engine.sql("SELECT COUNT(*) AS n FROM t1").collect()[0].n

    with sch.start_background(interval_s=0.2) as loop:
        deadline = time.time() + 30
        while _count() < 3 and time.time() < deadline:
            time.sleep(0.2)
        assert _count() >= 3  # at least one background fire landed
        assert loop.last_tick_error is None
    assert not loop._thread.is_alive()


def test_scheduled_iceberg_export_follows_commits(engine, tmp_path):
    """CREATE TASK driving the [ext] export verb: each due run writes a
    new versioned spec export, so an external engine following the
    version hint tracks the table on a schedule (r5)."""
    from icepack.iceberg_import import read_iceberg

    _mk_table(engine)
    dest = str(tmp_path / "mirror")
    engine.sql(
        "CREATE TASK mirror SCHEDULE = '10 MINUTE' AS "
        f"ALTER ICEBERG TABLE t1 EXPORT ICEBERG METADATA TO '{dest}'"
    )
    engine.sql("ALTER TASK mirror RESUME")
    sch = TaskScheduler(engine)
    t0 = ms(2024, 6, 1, 12, 0)
    assert sch.run_due(t0) == ["mirror"]
    assert read_iceberg(engine.spark, dest).count() == 2
    engine.sql("INSERT INTO t1 VALUES (3, 3.0)")
    assert sch.run_due(t0 + 600_000) == ["mirror"]
    assert read_iceberg(engine.spark, dest).count() == 3

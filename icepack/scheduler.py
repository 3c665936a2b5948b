"""Task scheduler for CREATE TASK objects (SURVEY.md M7,
docs/10-maintenance-operations.md:174-183).

The reference frames scheduled maintenance as "Snowflake runs this for
you" — a managed service ticking CRON schedules and running task
bodies.  This module is that service's engine-side core, deterministic
and daemon-free: :meth:`TaskScheduler.run_due` takes an EXPLICIT clock
value, executes every resumed task whose schedule has come due, cascades
``AFTER`` children (Snowflake task graphs), and persists run state back
into the task objects.  A deployment wraps it in whatever loop it likes
(cron, k8s CronJob, Airflow);  :meth:`run_pending` is the one-liner
wall-clock convenience.  Tests drive a simulated clock through DST-free
UTC arithmetic — scheduling logic is fully verifiable offline.

Schedule syntax (the two public Snowflake forms):
- ``'<N> MINUTE[S]'`` — fixed interval from the last run (first run:
  immediately due once resumed).
- ``'USING CRON <min> <hour> <dom> <mon> <dow> <TZ>'`` — standard
  5-field cron evaluated in the named IANA timezone (stdlib zoneinfo,
  so "02:00 America/Los_Angeles" tracks DST exactly as the managed
  service would); fields support ``*``, ``*/n``, single ints and comma
  lists (the subset real maintenance schedules use).
"""

from __future__ import annotations

import datetime as _dt
import re
import time as _time


class ScheduleError(ValueError):
    pass


def _parse_cron_field(field: str, lo: int, hi: int) -> set[int] | None:
    """None = wildcard (*)."""
    if field == "*":
        return None
    m = re.fullmatch(r"\*/(\d+)", field)
    if m:
        step = int(m.group(1))
        if step <= 0:
            raise ScheduleError(f"bad cron step {field!r}")
        return set(range(lo, hi + 1, step))
    out: set[int] = set()
    for part in field.split(","):
        if not re.fullmatch(r"\d+", part):
            raise ScheduleError(f"unsupported cron field {field!r}")
        v = int(part)
        if not lo <= v <= hi:
            raise ScheduleError(f"cron value {v} out of range [{lo},{hi}]")
        out.add(v)
    return out


class Schedule:
    """Parsed schedule with ``next_after(ms) -> ms``."""

    def __init__(self, spec: str):
        self.spec = spec
        cron = re.fullmatch(
            r"(?i)USING\s+CRON\s+(\S+)\s+(\S+)\s+(\S+)\s+(\S+)\s+(\S+)\s+(\S+)",
            spec.strip(),
        )
        interval = re.fullmatch(r"(?i)(\d+)\s+MINUTES?", spec.strip())
        if cron:
            mi, hr, dom, mon, dow, tz = cron.groups()
            if tz.upper() == "UTC":
                self.tz = _dt.timezone.utc
            else:
                from zoneinfo import ZoneInfo, ZoneInfoNotFoundError

                try:
                    self.tz = ZoneInfo(tz)
                except (ZoneInfoNotFoundError, KeyError) as e:
                    raise ScheduleError(f"unknown timezone {tz!r}") from e
            self.kind = "cron"
            self.minute = _parse_cron_field(mi, 0, 59)
            self.hour = _parse_cron_field(hr, 0, 23)
            self.dom = _parse_cron_field(dom, 1, 31)
            self.mon = _parse_cron_field(mon, 1, 12)
            self.dow = _parse_cron_field(dow, 0, 6)  # 0 = Sunday
        elif interval:
            self.kind = "interval"
            self.interval_ms = int(interval.group(1)) * 60_000
            if self.interval_ms <= 0:
                raise ScheduleError("interval must be positive")
        else:
            raise ScheduleError(f"unparseable SCHEDULE {spec!r}")

    def next_after(self, after_ms: int) -> int:
        if self.kind == "interval":
            return after_ms + self.interval_ms
        # cron: scan forward minute by minute from the next whole minute
        # in the schedule's OWN timezone (bounded: any satisfiable cron
        # subset fires within 366 days)
        t = _dt.datetime.fromtimestamp(after_ms / 1000, tz=self.tz).replace(
            second=0, microsecond=0
        ) + _dt.timedelta(minutes=1)
        for _ in range(366 * 24 * 60):
            dom_ok = self.dom is None or t.day in self.dom
            dow_ok = self.dow is None or (t.weekday() + 1) % 7 in self.dow
            if self.dom is not None and self.dow is not None:
                # standard cron (and Snowflake's scheduler) OR the two
                # day fields when BOTH are restricted: "0 0 1 * 1" fires
                # on the 1st AND on every Monday, not only Monday-the-1st
                day_ok = dom_ok or dow_ok
            else:
                day_ok = dom_ok and dow_ok
            if (
                (self.minute is None or t.minute in self.minute)
                and (self.hour is None or t.hour in self.hour)
                and day_ok
                and (self.mon is None or t.month in self.mon)
            ):
                return int(t.timestamp() * 1000)
            t += _dt.timedelta(minutes=1)
        raise ScheduleError(f"cron {self.spec!r} never fires")


class TaskScheduler:
    """Drives the task objects a :class:`icepack.sql.SqlEngine` catalog
    holds.  All state (``state``, ``last_run_ms``, ``next_run_ms``,
    ``last_error``) lives IN the persisted task objects, so SHOW TASKS
    reflects scheduler activity and a restarted scheduler resumes where
    the objects say — the scheduler itself is stateless."""

    def __init__(self, engine):
        self.engine = engine
        self.catalog = engine.catalog

    def _tasks(self) -> dict[str, dict]:
        return {
            name: self.catalog._get_object("tasks", name)
            for name in self.catalog._list_objects("tasks")
        }

    def run_due(self, now_ms: int) -> list[str]:
        """Execute every resumed task due at ``now_ms``; then cascade
        AFTER-children of tasks that ran SUCCESSFULLY (depth-first
        through the task graph, each child at most once — Snowflake task
        graphs halt at a failed predecessor).  Returns executed names in
        execution order.  A failing body records ``last_error`` and
        does not block siblings (matching managed-service behavior);
        its next run is still advanced so one bad task can't hot-loop."""
        tasks = self._tasks()
        ran: list[str] = []

        def _execute(name: str, task: dict) -> bool:
            task["last_run_ms"] = now_ms
            sched = task.get("schedule")
            if sched:
                task["next_run_ms"] = Schedule(sched).next_after(now_ms)
            ok = True
            try:
                self.engine._execute_task(name)
                task.pop("last_error", None)
            except Exception as e:  # noqa: BLE001 — recorded, not raised
                task["last_error"] = f"{type(e).__name__}: {e}"
                ok = False
            self.catalog._put_object("tasks", name, task, replace=True)
            ran.append(name)
            if ok:
                for child, ct in tasks.items():
                    if (
                        child not in ran
                        and ct.get("state") == "started"
                        and ct.get("after") == name
                    ):
                        _execute(child, ct)
            return ok

        for name, task in tasks.items():
            if task.get("state") != "started" or task.get("after"):
                continue  # suspended, or a child (runs via cascade)
            sched = task.get("schedule")
            if sched is None:
                continue  # EXECUTE TASK only
            nxt = task.get("next_run_ms")
            if nxt is None:
                # First tick after RESUME: interval tasks are due now;
                # cron tasks get their next matching instant computed
                # from THIS tick and PERSISTED even when not yet due, so
                # a coarse outer loop (a 5-min k8s CronJob, the module
                # docstring's own example) catches the fire on a later
                # tick via the nxt <= now_ms comparison instead of
                # having to land within a minute of the cron instant.
                s = Schedule(sched)
                nxt = now_ms if s.kind == "interval" else s.next_after(now_ms - 60_000)
                if nxt > now_ms:
                    task["next_run_ms"] = nxt
                    self.catalog._put_object("tasks", name, task, replace=True)
            if name not in ran and nxt <= now_ms:
                _execute(name, task)
        return ran

    def run_pending(self) -> list[str]:
        """Wall-clock convenience: ``run_due(now)``."""
        return self.run_due(int(_time.time() * 1000))

    def start_background(self, interval_s: float = 60.0) -> "BackgroundLoop":
        """OPTIONAL in-process wall-clock loop (docs/10:174-183 frames
        this as service-owned — "Snowflake runs this for you"; a
        deployment that has no outer cron can run this instead).  A
        daemon thread ticks :meth:`run_pending` every ``interval_s``;
        the deterministic ``run_due`` core stays the tested surface —
        the thread adds nothing but a clock.  Returns a handle whose
        ``stop()`` joins the thread (also a context manager)."""
        return BackgroundLoop(self, interval_s)


class BackgroundLoop:
    """Stoppable daemon-thread ticker around ``TaskScheduler.run_pending``.

    Tick errors are recorded per task by ``run_due`` itself; an error
    OUTSIDE a task body (e.g. catalog I/O) is kept in ``last_tick_error``
    and the loop keeps ticking — a maintenance loop must not die because
    one tick hit a transient failure."""

    def __init__(self, scheduler: TaskScheduler, interval_s: float):
        import threading

        self._sched = scheduler
        self._interval = interval_s
        self._stop = threading.Event()
        self.last_tick_error: str | None = None
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _loop(self) -> None:
        while not self._stop.is_set():
            try:
                self._sched.run_pending()
                self.last_tick_error = None
            except Exception as e:  # noqa: BLE001 — loop must survive
                self.last_tick_error = f"{type(e).__name__}: {e}"
            self._stop.wait(self._interval)

    def stop(self) -> None:
        self._stop.set()
        self._thread.join(timeout=30)

    def __enter__(self) -> "BackgroundLoop":
        return self

    def __exit__(self, *exc) -> None:
        self.stop()

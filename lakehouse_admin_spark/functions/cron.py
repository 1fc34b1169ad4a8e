"""Standard 5-field cron: parser, next-fire computation, scheduler.

The reference drives its cache refresh and nightly maintenance cycle
from 5-field cron expressions parsed with the standard cron grammar
(reference: backend/internal/scheduler_cron.go:12-50 — minute, hour,
day-of-month, month, day-of-week; schedules in
backend/config.dist.yml:39-49, e.g. refresh "0 * * * *", maintenance
"0 2 * * *"). This module reimplements those semantics:

- fields: minute 0-59, hour 0-23, dom 1-31, month 1-12 (JAN-DEC),
  dow 0-6 (SUN-SAT, 7 ≡ Sunday);
- syntax per field: ``*``/``?``, ``a``, ``a-b``, lists ``a,b,c``,
  steps ``*/n``, ``a-b/n``, ``a/n`` (a to max, step n);
- the classic DOM/DOW rule: when BOTH day fields are restricted, a day
  matches if EITHER matches; otherwise the restricted one governs;
- next-fire is strictly-after, minute granularity, field-wise advance
  (month → day → hour → minute), bounded at 5 years.

All computation is naive-datetime in the caller's chosen clock (the
reference schedules in UTC; tests use fixed naive datetimes).
"""

from __future__ import annotations

import datetime as dt
import threading
from collections.abc import Callable
from dataclasses import dataclass, field

_MONTHS = {m: i + 1 for i, m in enumerate(
    ["jan", "feb", "mar", "apr", "may", "jun", "jul", "aug", "sep", "oct", "nov", "dec"]
)}
_DOWS = {d: i for i, d in enumerate(["sun", "mon", "tue", "wed", "thu", "fri", "sat"])}


@dataclass(frozen=True)
class CronSchedule:
    minutes: frozenset[int]
    hours: frozenset[int]
    dom: frozenset[int]
    months: frozenset[int]
    dow: frozenset[int]
    dom_star: bool
    dow_star: bool
    spec: str

    def _day_matches(self, t: dt.datetime) -> bool:
        dom_ok = t.day in self.dom
        dow_ok = ((t.weekday() + 1) % 7) in self.dow  # cron: Sunday = 0
        if self.dom_star and self.dow_star:
            return True
        if self.dom_star:
            return dow_ok
        if self.dow_star:
            return dom_ok
        return dom_ok or dow_ok  # both restricted → OR (standard cron)

    def next_fire(self, after: dt.datetime) -> dt.datetime:
        """First matching minute STRICTLY after ``after``."""
        t = after.replace(second=0, microsecond=0) + dt.timedelta(minutes=1)
        limit = after + dt.timedelta(days=5 * 366)
        while t <= limit:
            if t.month not in self.months:
                if t.month == 12:
                    t = t.replace(year=t.year + 1, month=1, day=1, hour=0, minute=0)
                else:
                    t = t.replace(month=t.month + 1, day=1, hour=0, minute=0)
                continue
            if not self._day_matches(t):
                t = (t + dt.timedelta(days=1)).replace(hour=0, minute=0)
                continue
            if t.hour not in self.hours:
                t = (t + dt.timedelta(hours=1)).replace(minute=0)
                continue
            if t.minute not in self.minutes:
                t += dt.timedelta(minutes=1)
                continue
            return t
        raise ValueError(f"cron {self.spec!r}: no fire time within 5 years of {after}")


def _parse_value(tok: str, names: dict[str, int] | None, lo: int, hi: int, spec: str) -> int:
    tok_l = tok.lower()
    if names and tok_l in names:
        return names[tok_l]
    try:
        v = int(tok)
    except ValueError:
        raise ValueError(f"invalid cron expression {spec!r}: bad value {tok!r}") from None
    return v


def _parse_field(
    expr: str, lo: int, hi: int, spec: str, names: dict[str, int] | None = None
) -> tuple[frozenset[int], bool]:
    """One field → (allowed values, had-a-star)."""
    out: set[int] = set()
    star = False
    for part in expr.split(","):
        step = 1
        body = part
        if "/" in part:
            body, step_s = part.split("/", 1)
            step = _parse_value(step_s, None, 1, hi - lo + 1, spec)
            if step < 1:
                raise ValueError(f"invalid cron expression {spec!r}: step {step}")
        if body in ("*", "?"):
            a, b = lo, hi
            star = True
        elif "-" in body:
            a_s, b_s = body.split("-", 1)
            a = _parse_value(a_s, names, lo, hi, spec)
            b = _parse_value(b_s, names, lo, hi, spec)
        else:
            a = _parse_value(body, names, lo, hi, spec)
            b = hi if "/" in part else a  # bare value + step → a..max
        if a < lo or b > hi or a > b:
            raise ValueError(
                f"invalid cron expression {spec!r}: {part!r} outside [{lo},{hi}]"
            )
        out.update(range(a, b + 1, step))
    return frozenset(out), star


def parse_cron(spec: str) -> CronSchedule:
    """Parse a standard 5-field cron expression
    (reference grammar: scheduler_cron.go:12-21)."""
    fields = spec.split()
    if len(fields) != 5:
        raise ValueError(
            f"invalid 5-field cron expression {spec!r}: got {len(fields)} fields"
        )
    f_min, f_hour, f_dom, f_month, f_dow = fields
    minutes, _ = _parse_field(f_min, 0, 59, spec)
    hours, _ = _parse_field(f_hour, 0, 23, spec)
    dom, dom_star = _parse_field(f_dom, 1, 31, spec)
    months, _ = _parse_field(f_month, 1, 12, spec, _MONTHS)
    # dow parses over 0..7 (7 ≡ Sunday, standard cron), folded mod 7
    dow_raw, dow_star = _parse_field(f_dow, 0, 7, spec, _DOWS)
    dow = frozenset(v % 7 for v in dow_raw)
    return CronSchedule(minutes, hours, dom, months, dow, dom_star, dow_star, spec)


@dataclass
class CronJob:
    name: str
    schedule: CronSchedule
    fn: Callable[[], object]
    next_at: dt.datetime
    fired: int = 0


@dataclass
class CronScheduler:
    """The runCronLoop equivalent (scheduler_cron.go:23-50): each job
    sleeps to its schedule's next fire, runs, recomputes. Testable by
    driving :meth:`tick` with a simulated clock; :meth:`run` is the
    wall-clock loop."""

    now_fn: Callable[[], dt.datetime] = dt.datetime.now
    jobs: dict[str, CronJob] = field(default_factory=dict)

    def add(self, name: str, spec: str, fn: Callable[[], object]) -> CronJob:
        sched = parse_cron(spec)
        job = CronJob(name, sched, fn, sched.next_fire(self.now_fn()))
        self.jobs[name] = job
        return job

    def next_wake(self) -> dt.datetime | None:
        return min((j.next_at for j in self.jobs.values()), default=None)

    def tick(self, now: dt.datetime | None = None) -> list[str]:
        """Fire every job due at ``now``; returns fired job names. A
        job that is overdue by several periods fires ONCE and reanchors
        (cron semantics: missed runs are not replayed)."""
        now = now or self.now_fn()
        fired = []
        for job in self.jobs.values():
            if job.next_at <= now:
                job.fn()
                job.fired += 1
                job.next_at = job.schedule.next_fire(now)
                fired.append(job.name)
        return fired

    def run(self, stop: threading.Event, max_sleep_s: float = 60.0) -> None:
        """Wall-clock loop: sleep to the earliest next_at, fire, repeat
        until ``stop`` is set."""
        while not stop.is_set():
            wake = self.next_wake()
            if wake is None:
                return
            delay = (wake - self.now_fn()).total_seconds()
            if delay > 0:
                stop.wait(min(delay, max_sleep_s))
                continue
            self.tick()

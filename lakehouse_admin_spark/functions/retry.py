"""Retry with exponential backoff for procedure execution.

The reference wraps its Trino procedure calls in an exponential-backoff
retrier (initial 3 s, max interval 10 s, max elapsed 5 m — reference:
backend/internal/trino_client.go:37-51, config.dist.yml:11-17) and its
queue claim in a 3-attempt retry on transient conflicts
(service_task_queue.go:234-247). This is the engine-side equivalent for
transient failures of maintenance jobs (e.g. storage hiccups)."""

from __future__ import annotations

# (no wall-clock dependency: elapsed is cumulative planned backoff)
import time
from collections.abc import Callable
from dataclasses import dataclass
from typing import TypeVar

T = TypeVar("T")


@dataclass(frozen=True)
class BackoffPolicy:
    initial_s: float = 3.0
    max_interval_s: float = 10.0
    max_elapsed_s: float = 300.0
    multiplier: float = 2.0


def with_backoff(
    fn: Callable[[], T],
    policy: BackoffPolicy = BackoffPolicy(),
    retryable: Callable[[Exception], bool] = lambda _e: True,
    sleep: Callable[[float], None] = time.sleep,
) -> T:
    """Run ``fn`` retrying retryable exceptions under the policy.

    The final attempt's exception propagates once max_elapsed is
    exhausted (matching the reference's give-up-and-record behavior —
    the task queue then marks the task error and retry-once applies at
    the task level).

    Elapsed time is tracked as the CUMULATIVE planned backoff, not
    wall clock — deterministic, testable with an injected sleep, and
    immune to slow fn() calls eating the retry budget twice."""
    interval = policy.initial_s
    slept = 0.0
    while True:
        try:
            return fn()
        except Exception as ex:  # noqa: BLE001 — policy decides
            if not retryable(ex) or slept + interval > policy.max_elapsed_s:
                raise
            sleep(interval)
            slept += interval
            interval = min(interval * policy.multiplier, policy.max_interval_s)

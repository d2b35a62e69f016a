"""Live run counters — the reference's periodic ``log_status``
(/root/reference/src/agrcgeocoding/geocode.py:136-163) for a streaming
pipeline.

The reference mutates closure counters per row and logs every 10k rows.
Here a single named counter ACTOR accumulates per-batch partial counts
(one fire-and-forget message per batch, not per row) while the Dataset
streams; ``report()`` renders the same fields — total, failure rate,
average score, elapsed — with the same rounding and ZeroDivision
semantics ('n/a' average when no successes, 100% failure rate on zero
rows) and ``_format_time``'s exact formatting.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.timefmt import format_time


def _make_actor_class():
    import ray

    @ray.remote(num_cpus=0)
    class _RunCounters:
        def __init__(self):
            self.success = 0
            self.fail = 0
            self.score_sum = 0
            self.start = time.perf_counter()

        def add(self, success: int, fail: int, score_sum: int) -> None:
            self.success += success
            self.fail += fail
            self.score_sum += score_sum

        def snapshot(self) -> dict:
            return {
                "success": self.success,
                "fail": self.fail,
                "score_sum": self.score_sum,
                "elapsed": time.perf_counter() - self.start,
            }

    return _RunCounters


def start_counters():
    """Create the counter actor (one per run)."""
    return _make_actor_class().remote()


def count_batch(batch: pa.Table, actor) -> pa.Table:
    """map_batches body: forward per-batch partial counts, pass rows through."""
    matched = pc.is_null(batch["message"]).to_numpy(zero_copy_only=False)
    success = int(matched.sum())
    fail = int(len(matched) - success)
    scores = np.asarray(batch["score"].to_numpy(zero_copy_only=False), np.int64)
    score_sum = int(scores[matched].sum())
    actor.add.remote(success, fail, score_sum)
    return batch


def report(actor, expect_total: int | None = None, timeout: float = 10.0) -> dict:
    """Reference log_status fields with identical rounding/fallbacks.

    ``add`` messages are fire-and-forget from workers and may still be in
    flight when the pipeline's consuming call returns; pass
    ``expect_total`` to wait (bounded) until that many rows are counted.
    """
    import ray

    snap = ray.get(actor.snapshot.remote())
    if expect_total is not None:
        deadline = time.perf_counter() + timeout
        while (
            snap["success"] + snap["fail"] < expect_total
            and time.perf_counter() < deadline
        ):
            time.sleep(0.05)
            snap = ray.get(actor.snapshot.remote())
    total = snap["success"] + snap["fail"]
    try:
        failure_rate = round(100 * snap["fail"] / total)
    except ZeroDivisionError:
        failure_rate = 100
    try:
        average_score = round(snap["score_sum"] / snap["success"])
    except ZeroDivisionError:
        average_score = "n/a"
    return {
        "total": total,
        "failure_rate": failure_rate,
        "average_score": average_score,
        "time_taken": format_time(snap["elapsed"]),
    }

"""Streaming-shaped ingestion with incremental keyed state.

Ray Data has no event-time runtime (SURVEY.md §2.9); the pattern for
stream-shaped inputs is: treat the events table as an ordered, partitioned
log — hash keys into B buckets, feed each bucket's rows to a stateful
actor IN TIMESTAMP ORDER, and keep incremental per-key state in the actor
between batches (ray_guide "Streaming-shaped workloads").

``run_incremental`` demonstrates the full pattern with running per-user
aggregates (event count, value cents, last-seen ts).  The incremental
result after any number of feed steps equals a batch recompute over the
rows fed so far — the invariant the test checks.  At 10^12 events the
same shape runs with B = O(cluster cores) bucket actors and
micro-batched feeds.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _make_bucket_actor():
    import ray

    @ray.remote(num_cpus=0)
    class _BucketState:
        """Incremental per-key state for one key-hash bucket."""

        def __init__(self):
            self.n: dict[int, int] = {}
            self.cents: dict[int, int] = {}
            self.last_ts: dict[int, int] = {}

        def feed(self, user_ids, cents, ts_us) -> int:
            """Consume one micro-batch (already ts-ordered)."""
            for u, c, t in zip(user_ids, cents, ts_us):
                self.n[u] = self.n.get(u, 0) + 1
                self.cents[u] = self.cents.get(u, 0) + c
                self.last_ts[u] = t  # ordered feed -> last write wins
            return len(user_ids)

        def state(self) -> dict:
            return {
                "user_id": list(self.n),
                "n_events": [self.n[u] for u in self.n],
                "value_cents": [self.cents[u] for u in self.n],
                "last_ts_us": [self.last_ts[u] for u in self.n],
            }

    return _BucketState


class IncrementalUserState:
    """B bucket actors fed in timestamp order; queryable merged state."""

    def __init__(self, n_buckets: int = 4):
        cls = _make_bucket_actor()
        self.n_buckets = n_buckets
        self.actors = [cls.remote() for _ in range(n_buckets)]

    def feed_batch(self, batch: pa.Table) -> None:
        """Route one ts-ordered micro-batch to its bucket actors."""
        import ray

        users = np.asarray(batch["user_id"].to_numpy(zero_copy_only=False), np.int64)
        cents = np.floor(
            np.asarray(batch["value"].to_numpy(zero_copy_only=False), np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        ts = np.asarray(batch["ts"].to_numpy(zero_copy_only=False)).astype("datetime64[us]")
        ts_us = ts.astype(np.int64)
        bucket = (users * 2654435761 % 4294967296) % self.n_buckets
        refs = []
        for b in range(self.n_buckets):
            m = bucket == b
            if m.any():
                refs.append(
                    self.actors[b].feed.remote(
                        users[m].tolist(), cents[m].tolist(), ts_us[m].tolist()
                    )
                )
        import ray as _ray

        _ray.get(refs)  # per-bucket ordering: wait before the next micro-batch

    def state_table(self) -> pa.Table:
        import ray

        parts = ray.get([a.state.remote() for a in self.actors])
        cols = {"user_id": [], "n_events": [], "value_cents": [], "last_ts_us": []}
        for p in parts:
            for k in cols:
                cols[k].extend(p[k])
        return pa.table({k: pa.array(v, pa.int64()) for k, v in cols.items()})


def run_incremental(events_ds, n_buckets: int = 4, batch_size: int = 4096) -> pa.Table:
    """Feed the (ts-sorted) events Dataset through bucket actors as a
    sequence of ordered micro-batches; return the final merged state."""
    state = IncrementalUserState(n_buckets)
    ordered = events_ds.sort("ts")
    for batch in ordered.iter_batches(batch_size=batch_size, batch_format="pyarrow"):
        state.feed_batch(batch)
    return state.state_table()


# ----------------------------------------------- watermark / late data

#: default allowed lateness: 1 hour in microseconds
WATERMARK_LATENESS_US = 3_600_000_000


def arrival_key(event_id: np.ndarray) -> np.ndarray:
    """Deterministic out-of-order ARRIVAL permutation: reverse every
    16-event block, so events arrive slightly scrambled (displacement
    bounded by one block's time span) — the fixture for late-data
    semantics, reproduced verbatim in the oracle's window ORDER BY."""
    i = np.asarray(event_id, np.int64)
    return (i // 16) * 16 + 15 - (i % 16)


def _make_watermark_actor():
    import ray

    @ray.remote(num_cpus=0)
    class _WatermarkState:
        """Per-user event-time watermark state for one key-hash bucket:
        an event whose ts is older than the user's max-seen ts minus the
        allowed lateness is LATE — counted but excluded from aggregates
        (the classic event-time watermark drop rule)."""

        def __init__(self, lateness_us: int):
            self.lateness = int(lateness_us)
            self.max_ts: dict[int, int] = {}
            self.n_kept: dict[int, int] = {}
            self.cents: dict[int, int] = {}
            self.n_late: dict[int, int] = {}

        def feed(self, user_ids, cents, ts_us) -> int:
            for u, c, t in zip(user_ids, cents, ts_us):
                prev = self.max_ts.get(u)
                if prev is not None and t < prev - self.lateness:
                    self.n_late[u] = self.n_late.get(u, 0) + 1
                else:
                    self.n_kept[u] = self.n_kept.get(u, 0) + 1
                    self.cents[u] = self.cents.get(u, 0) + c
                if prev is None or t > prev:
                    self.max_ts[u] = t
            return len(user_ids)

        def state(self) -> dict:
            users = sorted(set(self.n_kept) | set(self.n_late))
            return {
                "user_id": users,
                "n_kept": [self.n_kept.get(u, 0) for u in users],
                "kept_cents": [self.cents.get(u, 0) for u in users],
                "n_late": [self.n_late.get(u, 0) for u in users],
            }

    return _WatermarkState


def run_incremental_watermark(
    events_ds,
    lateness_us: int = WATERMARK_LATENESS_US,
    n_buckets: int = 4,
    batch_size: int = 4096,
) -> pa.Table:
    """Event-time watermark over an out-of-order arrival stream: events
    are fed in the deterministic scrambled ARRIVAL order (``arrival_key``)
    and each user's rows pass through the per-user watermark drop rule.
    Per-user state lives in hash-bucket actors (the run_incremental
    pattern); the per-user watermark makes the rule bucket-local, so no
    cross-actor coordination is needed.  Oracle:
    ``oracle.streaming_watermark_sql`` replicates arrival order and the
    drop rule with one window function."""
    import ray

    cls = _make_watermark_actor()
    actors = [cls.remote(lateness_us) for _ in range(n_buckets)]

    def _with_ak(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["event_id"].to_numpy(zero_copy_only=False), np.int64)
        return t.append_column("__ak", pa.array(arrival_key(ids), pa.int64()))

    ordered = events_ds.map_batches(_with_ak, batch_format="pyarrow").sort("__ak")
    for batch in ordered.iter_batches(batch_size=batch_size, batch_format="pyarrow"):
        users = np.asarray(batch["user_id"].to_numpy(zero_copy_only=False), np.int64)
        cents = np.floor(
            np.asarray(batch["value"].to_numpy(zero_copy_only=False), np.float64)
            * 100.0
            + 0.5
        ).astype(np.int64)
        ts = np.asarray(batch["ts"].to_numpy(zero_copy_only=False)).astype(
            "datetime64[us]"
        )
        ts_us = ts.astype(np.int64)
        bucket = (users * 2654435761 % 4294967296) % n_buckets
        refs = []
        for b in range(n_buckets):
            m = bucket == b
            if m.any():
                refs.append(
                    actors[b].feed.remote(
                        users[m].tolist(), cents[m].tolist(), ts_us[m].tolist()
                    )
                )
        ray.get(refs)  # per-bucket ordering barrier between micro-batches

    parts = ray.get([a.state.remote() for a in actors])
    cols = {"user_id": [], "n_kept": [], "kept_cents": [], "n_late": []}
    for p in parts:
        for k in cols:
            cols[k].extend(p[k])
    return pa.table({k: pa.array(v, pa.int64()) for k, v in cols.items()})

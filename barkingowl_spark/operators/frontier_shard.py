"""Consistent-hash frontier sharding: host -> crawler-worker assignment
on a virtual-node hash ring (Karger et al. STOC'97; the UbiCrawler /
Boldi et al. 2004 host-assignment design: fully decentralized,
balanced, and contravariant — adding a worker only moves hosts TO the
new worker, never between survivors).

Why the frontier needs it: BarkingOwl dispatches per-host breadth-first
waves (SURVEY.md §2 O18/O20); a multi-node deployment must give every
host exactly one owner (politeness state, robots cache, seen-set salt
all live with the owner) and must not reshuffle the world when the
fleet resizes. The ring IS the partitioner the north_star's "N vs 4N
executors" criterion resizes across.

Scale shape: the ring is CONFIG-sized (workers x vnodes points), built
driver-side and inlined as a sorted literal array — assignment is a
pure map (two array expressions inside whole-stage codegen): no join,
no shuffle, no broadcast table. Rebalance computes both generations'
owners in ONE projection over the host table, so the diff is also
map-only; only the per-worker rollup aggregates (O(workers^2) rows).

Hashing contract (shared with the DuckDB oracle): a point/host hash is
the first 15 hex chars of md5 as a 60-bit integer — the same
md5-prefix integer draw used across the repo (mix.py, politeness.py).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def ring_points(workers: list[str], vnodes: int = 64) -> list[tuple[int, str]]:
    """Sorted (point, worker) virtual nodes: point = h60(worker + '#' + i).
    Deterministic; ties (60-bit collisions) broken by worker name."""
    pts = sorted(
        (_h60(f"{w}#{i}"), w) for w in workers for i in range(vnodes)
    )
    return pts


def _owner_expr(pts: list[tuple[int, str]], h_col: str) -> F.Column:
    """Successor lookup over the literal ring: the owner is the first
    point clockwise at-or-after h, wrapping to the smallest point."""
    points = "array(" + ", ".join(f"{p}L" for p, _ in pts) + ")"
    owners = "array(" + ", ".join(
        "'" + w.replace("'", "''") + "'" for _, w in pts
    ) + ")"
    n = len(pts)
    return F.expr(
        f"element_at({owners},"
        f" CAST(size(filter({points}, p -> p < {h_col})) % {n} + 1"
        f" AS INT))"
    )


def host_hash(host_col: str = "host") -> F.Column:
    return F.conv(
        F.substring(F.md5(F.col(host_col).cast("binary")), 1, 15), 16, 10
    ).cast("long")


def assign_hosts(
    hosts: DataFrame,
    workers: list[str],
    vnodes: int = 64,
    host_col: str = "host",
) -> DataFrame:
    """(host, owner): each host's crawler worker. Map-only — the ring
    rides into the plan as a sorted literal array."""
    pts = ring_points(workers, vnodes)
    return (
        hosts.withColumn("_h", host_hash(host_col))
        .select(
            F.col(host_col).alias("host"),
            _owner_expr(pts, "_h").alias("owner"),
        )
    )


def rebalance(
    hosts: DataFrame,
    workers_before: list[str],
    workers_after: list[str],
    vnodes: int = 64,
    host_col: str = "host",
) -> DataFrame:
    """(host, owner_before, owner_after, moved): both generations'
    assignments in one map-only projection."""
    pb = ring_points(workers_before, vnodes)
    pa = ring_points(workers_after, vnodes)
    return (
        hosts.withColumn("_h", host_hash(host_col))
        .select(
            F.col(host_col).alias("host"),
            _owner_expr(pb, "_h").alias("owner_before"),
            _owner_expr(pa, "_h").alias("owner_after"),
        )
        .withColumn(
            "moved", F.col("owner_before") != F.col("owner_after")
        )
    )


def rebalance_summary(
    hosts: DataFrame,
    workers_before: list[str],
    workers_after: list[str],
    vnodes: int = 64,
    host_col: str = "host",
) -> DataFrame:
    """(owner_before, owner_after, n_hosts): the migration matrix —
    one map-side-combined shuffle on an O(workers^2)-key space. Under
    consistent hashing, off-diagonal rows only ever point INTO newly
    added workers (or out of removed ones)."""
    return (
        rebalance(hosts, workers_before, workers_after, vnodes, host_col)
        .groupBy("owner_before", "owner_after")
        .agg(F.count(F.lit(1)).alias("n_hosts"))
    )


def hrw_assign(
    hosts: DataFrame,
    workers: list[str],
    host_col: str = "host",
) -> DataFrame:
    """(host, owner): highest-random-weight / rendezvous hashing
    (Thaler & Ravishankar, IEEE/ACM ToN 1998) — owner = argmax over
    workers of md5(host || '|' || worker). The join-free sibling of
    the ring: same minimal-disruption property (adding a worker moves
    ONLY the keys the new worker wins — test-pinned), but shares are
    uniform without vnode tuning and the per-key work is exactly
    |workers| hashes.

    The score is the md5 HEX STRING itself — lexicographic max over
    fixed-width hex equals numeric max, is engine-portable, and needs
    no 128-bit arithmetic. Map-only: the candidate list is a literal
    struct array, the argmax one array_max.

    Scale trade vs the ring: O(|workers|) hashes per key vs O(log
    vnodes) — at fleet sizes (10^2-10^3) both are noise next to the
    shuffle the assignment feeds."""
    if not workers:
        raise ValueError("workers must be non-empty")
    cands = F.array(*[
        F.struct(
            F.md5(F.concat(F.col(host_col), F.lit("|" + w))
                  .cast("binary")).alias("s"),
            F.lit(w).alias("w"),
        )
        for w in workers
    ])
    return hosts.select(
        F.col(host_col).alias("host"),
        F.array_max(cands)["w"].alias("owner"),
    )

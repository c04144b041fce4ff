"""Exact bucket→shuffle-partition placement for the merge exchange.

``repartition(col)`` always places rows by ``pmod(murmur3(col), n)``;
with ~num_buckets distinct bucket ids the balls-into-bins collisions
leave some reduce tasks with several buckets and others empty, and AQE's
size-based coalescing (tuned for MB-scale partitions) re-cuts the stage
to a task count with no relation to the core count — measured on the
2 M×8 apply: 10–36 tasks on 32 cores with a 5-task second wave
(guide §2.5: synthetic partitioning keys with too few distinct values).

Fix: repartition on a PROXY column instead. For ``n`` shards,
``shard_proxies(n)[i]`` is the smallest non-negative int ``v`` with
``pmod(murmur3_32(v, seed=42), n) == i`` — exactly Spark's
``HashPartitioning`` placement expression — so

    _shard = element_at(array(<proxies>), pmod(_p, n) + 1)

puts bucket ``p`` in shuffle partition ``p mod n``, giving perfectly
uniform one-wave stages whose width derives from ``defaultParallelism``
at runtime (cluster-adaptive, not a local core constant). The proxy
values are pure murmur3 preimages — data-independent, deterministic,
and pinned against Spark's own ``hash()`` in tests.
"""

from __future__ import annotations

from functools import lru_cache

_C1 = 0xCC9E2D51
_C2 = 0x1B873593
_M32 = 0xFFFFFFFF


def murmur3_int(x: int, seed: int = 42) -> int:
    """Murmur3_x86_32 of a 32-bit int block — bit-identical to Spark's
    ``Murmur3HashFunction.hashInt`` (the expression behind ``F.hash`` and
    ``HashPartitioning`` for int inputs). Returns a SIGNED int32."""
    k1 = (x & _M32) * _C1 & _M32
    k1 = ((k1 << 15) | (k1 >> 17)) & _M32
    k1 = k1 * _C2 & _M32
    h1 = (seed & _M32) ^ k1
    h1 = ((h1 << 13) | (h1 >> 19)) & _M32
    h1 = (h1 * 5 + 0xE6546B64) & _M32
    # fmix(h1, len=4)
    h1 ^= 4
    h1 ^= h1 >> 16
    h1 = h1 * 0x85EBCA6B & _M32
    h1 ^= h1 >> 13
    h1 = h1 * 0xC2B2AE35 & _M32
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= 1 << 31 else h1


@lru_cache(maxsize=32)
def shard_proxies(n: int) -> tuple[int, ...]:
    """Smallest int preimage per residue class: pmod(murmur3(v), n) == i
    for every i < n. Expected search cost ~n·ln n probes (coupon
    collector); n is a partition count, so this is driver-trivial."""
    out: list[int | None] = [None] * n
    found = 0
    v = 0
    while found < n:
        r = murmur3_int(v) % n  # python % is already non-negative == pmod
        if out[r] is None:
            out[r] = v
            found += 1
        v += 1
    return tuple(out)  # type: ignore[arg-type]


def shard_expr_sql(part_col: str, n: int) -> str:
    """SQL text for the proxy shard column (single driver round-trip;
    the literal array constant-folds, lookup is O(1) per row)."""
    arr = ", ".join(str(v) for v in shard_proxies(n))
    return f"element_at(array({arr}), pmod({part_col}, {n}) + 1)"

"""ns→µs conversion discipline (r11 verdict directive #1).

Float division on epoch-nanosecond columns — `(ts / F.lit(1000)).cast("long")`
— runs in IEEE double. At 2024 epoch-ns magnitude (~1.7e18, in the
[2^60, 2^61) binade) the 53-bit mantissa gives an ulp of 256 ns, so the
division truncates ~1.6% of µs-aligned ns values (those ≡ 128 mod 512)
one full microsecond LOW — exactly the window/session/range-boundary
tie streaming queries split on. The pinned idiom is integer division:
`F.expr("ts div 1000")`.

Two layers keep the class dead:
  1. a source lint banning the float idiom anywhere in river_spark/,
  2. a Spark regression proving the divergence on the exact sentinel
     values the streaming fixtures plant (river_ops._SENTINEL_EVENT_NS),
     so the ban is evidence-backed, not cargo cult.
The live fixtures in river_ops.py / river_ops2.py additionally carry a
ghost event + boundary promo pair that turns any regression into a
driver-oracle red (see _SENTINEL_EVENT_NS module comment).
"""

from __future__ import annotations

import pathlib
import re

import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent / "river_spark"

# the banned shapes: float division feeding a long cast / timestamp
# conversion. `div` (SQL integer division) is the allowed idiom.
_BANNED = [
    re.compile(r"/\s*F\.lit\(1000"),
    re.compile(r"/\s*1000(\.0)?\s*\)\s*\.cast\(\s*[\"']long"),
    re.compile(r"timestamp_micros\([^)\n]*/"),
    re.compile(r"timestamp_millis\([^)\n]*/"),
]


def test_no_float_ns_division_in_source():
    hits = []
    for path in sorted(ROOT.rglob("*.py")):
        for i, line in enumerate(path.read_text().splitlines(), 1):
            code = line.split("#", 1)[0]
            for pat in _BANNED:
                if pat.search(code):
                    hits.append(f"{path.relative_to(ROOT.parent)}:{i}: {line.strip()}")
    assert not hits, (
        "float ns->us division is banned (double mantissa exhaustion at "
        "epoch-ns magnitude; use F.expr('ts div 1000')):\n" + "\n".join(hits)
    )


def test_div_idiom_exact_and_float_idiom_diverges(spark):
    """The evidence behind the lint: on the planted sentinel (and a
    sweep of µs-aligned ns values ≡ 128 mod 512), integer `div 1000`
    matches exact integer division while the banned float idiom lands
    1µs low."""
    from pyspark.sql import functions as F

    from river_spark.queries.river_ops import (
        _SENTINEL_EVENT_NS,
        _SENTINEL_PROMO_NS,
    )

    base = 1_705_276_800_000_000_000  # 2024-01-15T00:00:00 in ns
    vals = [_SENTINEL_EVENT_NS, _SENTINEL_PROMO_NS] + [
        base + k * 1000 for k in range(0, 4096, 37)
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    out = (
        df.select(
            "v",
            F.expr("v div 1000").alias("exact"),
            (F.col("v") / F.lit(1000)).cast("long").alias("banned"),
        )
        .collect()
    )
    n_diverged = 0
    for r in out:
        assert r.exact == r.v // 1000, f"div idiom wrong for {r.v}"
        if r.banned != r.exact:
            n_diverged += 1
            assert r.banned == r.exact - 1  # the 1µs-low failure mode
    sentinel = next(r for r in out if r.v == _SENTINEL_EVENT_NS)
    assert sentinel.banned == sentinel.exact - 1, (
        "the planted sentinel must diverge under the banned idiom — if "
        "this ever passes, the anti-vacuous fixture guard is dead"
    )
    promo = next(r for r in out if r.v == _SENTINEL_PROMO_NS)
    assert promo.banned == promo.exact  # promo side stays float-exact
    assert n_diverged >= 2  # the class is real, not a one-off


def test_memory_sink_prefixes_unique():
    """Same-session memory-sink names are global: two query harnesses
    sharing a _memory_table_name prefix silently resolve each other's
    views (round 12 caught river_ss_ used by both river_stream_stateful
    and the Space-Saving drain). Every call site must own a distinct
    prefix."""
    import collections
    import re

    pat = re.compile(r"_memory_table_name\(\s*\"([a-z0-9_]+)\"")
    owners = collections.defaultdict(set)
    for path in sorted((ROOT / "queries").glob("*.py")):
        for m in pat.finditer(path.read_text()):
            owners[m.group(1)].add(path.name)
    dupes = {p: sorted(fs) for p, fs in owners.items() if len(fs) > 1}
    # same-file reuse is fine (one harness, several sf_dirs); cross-file
    # reuse is the collision class
    assert not dupes, f"memory-sink prefix shared across files: {dupes}"
    # and no prefix may be a strict prefix of another (name-space bleed)
    names = sorted(owners)
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            assert not b.startswith(a) and not a.startswith(b), (a, b)

"""Registry ordering contract (r6 order #7): a prefix sample of
all_queries() must always verify (a) every never-proven query first,
then (b) the proven queries whose last green driver row is OLDEST — so
no query's evidence can silently age across rounds."""

from __future__ import annotations

from grapefruit_spark.operators import (
    _last_green_rounds,
    _never_green,
    all_queries,
)


def test_never_green_head_then_staleness_order():
    names = list(all_queries())
    unproven = _never_green()
    lg = _last_green_rounds()

    # (a) every never-proven query precedes every proven one
    if unproven:
        last_unproven = max(i for i, n in enumerate(names) if n in unproven)
        first_proven = min(
            (i for i, n in enumerate(names) if n not in unproven),
            default=len(names),
        )
        assert last_unproven < first_proven, (
            "never-green queries must form the registry prefix"
        )

    # (b) the proven tail is non-decreasing in last-green round, so ANY
    # prefix of it covers the stalest entries
    proven = [n for n in names if n not in unproven]
    rounds = [lg.get(n, 0) for n in proven]
    assert rounds == sorted(rounds), (
        "proven queries must be ordered oldest-green first"
    )


def test_prefix_covers_stalest_fifty():
    """The driver samples ~50 entries; the first 50 must include every
    query among the 50 stalest (never-green counts as infinitely stale)."""
    names = list(all_queries())
    unproven = _never_green()
    lg = _last_green_rounds()
    by_staleness = sorted(
        names, key=lambda n: (-1 if n in unproven else lg.get(n, 0))
    )
    k = min(50, len(names))
    stalest = set(by_staleness[:k])
    prefix = set(names[:k])
    # ties at the boundary may swap freely; everything STRICTLY staler
    # than the boundary round must be inside the prefix
    if k < len(names):
        boundary = (
            -1
            if by_staleness[k - 1] in unproven
            else lg.get(by_staleness[k - 1], 0)
        )
        strictly_stale = {
            n
            for n in stalest
            if (-1 if n in unproven else lg.get(n, 0)) < boundary
        }
        assert strictly_stale <= prefix
    else:
        assert stalest == prefix

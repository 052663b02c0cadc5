"""Registry-wide physical-plan lint: no unpartitioned WindowExec over an
unbounded frame.

An unpartitioned window (``Window.orderBy`` with no ``partitionBy``)
forces Spark to move ALL input rows to a single partition and sort them
there ("No Partition Defined for Window operation" warning) — fine over
a frame already bounded by a limit (the TakeOrdered top-k convention,
e.g. ``bm25_topk``), a single-row aggregate, or a tiny local relation,
but a scale bug over anything corpus- or vocabulary-sized.

This walks every registered query's executed plan, finds Window nodes
whose partition spec is empty (the node prints TWO top-level bracket
groups instead of three), and requires a bounding node in the window's
subtree: TakeOrderedAndProject / GlobalLimit / CollectLimit, or a
global (groupless) HashAggregate/SortAggregate final step (1-row
frame), or a LocalTableScan / OneRowRelation.

Usage: ``python scripts/lint_plans.py [prefix ...]`` — lints all
registered queries (or just those matching the given name prefixes) at
$SF_DIR (default sf0.001) and prints ``PLAN-LINT FAILS: []`` on
success. Also importable: ``unbounded_global_windows(plan_str)``.
"""

from __future__ import annotations

import re


def _top_level_groups(s: str) -> list[str]:
    """Split a plan-node argument string into its top-level [...]
    groups (bracket depth tracking; parens inside windowspecdefinition
    don't open bracket groups)."""
    groups, depth, start = [], 0, -1
    for i, ch in enumerate(s):
        if ch == "[":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0 and start >= 0:
                groups.append(s[start : i + 1])
                start = -1
    return groups


_CONNECTOR = re.compile(r"[+:]- ")

# A node that bounds the number of rows flowing up through it, making a
# single-partition sort above it safe.
_BOUNDING = (
    "TakeOrderedAndProject",
    "GlobalLimit",
    "CollectLimit",
    "LocalTableScan",
    "OneRowRelation",
)
# A final global aggregate with NO grouping keys produces exactly 1 row:
# `HashAggregate(keys=[], ...)` / `SortAggregate(key=[], ...)`.
_GLOBAL_AGG = re.compile(r"(?:Hash|Sort|ObjectHash)Aggregate\(keys?=\[\]")


def _node_depth(line: str):
    """Column of the tree connector for this line, or None for
    non-node lines (headers, subquery banners)."""
    m = _CONNECTOR.search(line)
    if m:
        return m.start()
    # root nodes print with no connector at column 0
    if line and not line[0] in " :+*(=" and "Window" in line.split("[")[0]:
        return -1
    return None


def unbounded_global_windows(plan: str) -> list[str]:
    """Return the offending Window node lines: unpartitioned windows
    with no bounding node in their subtree."""
    lines = plan.splitlines()
    bad = []
    for i, line in enumerate(lines):
        stripped = _CONNECTOR.split(line, 1)[-1]
        if not stripped.startswith("Window "):
            continue
        groups = _top_level_groups(stripped)
        if len(groups) >= 3:
            continue  # partitioned window ([exprs], [part], [order])
        # two groups is ambiguous: [exprs],[order] (UNpartitioned) vs
        # [exprs],[part] (partitioned, no ordering). An order spec
        # carries sort directions; a partition spec is bare attributes.
        if len(groups) == 2 and not re.search(
            r"\b(ASC|DESC) NULLS", groups[1]
        ):
            continue  # partitioned window with empty order spec
        d = _node_depth(line)
        if d is None:
            d = -1
        # subtree: following lines until connector column <= this one
        bounded = False
        for nxt in lines[i + 1 :]:
            nd = _node_depth(nxt)
            if nd is not None and nd <= d:
                break
            body = _CONNECTOR.split(nxt, 1)[-1]
            if body.startswith(_BOUNDING) or _GLOBAL_AGG.match(body):
                bounded = True
                break
        if not bounded:
            bad.append(stripped[:160])
    return bad

"""Workflow DAG helpers — Kahn topological sort, no external deps.

Reference builds a Loom digraph and topsorts it (utils.clj:29-30,
core.clj:122-133); a plain adjacency dict does the same here.
"""

from __future__ import annotations


class CycleError(ValueError):
    pass


def topological_sort(workflow: list[tuple[str, str]]) -> list[str]:
    """Kahn's algorithm over the edge list. Deterministic: ties broken by
    first-seen order so builds are reproducible run to run."""
    order: list[str] = []
    nodes: list[str] = []
    seen = set()
    for src, dst in workflow:
        for n in (src, dst):
            if n not in seen:
                seen.add(n)
                nodes.append(n)
    indeg = {n: 0 for n in nodes}
    adj: dict[str, list[str]] = {n: [] for n in nodes}
    for src, dst in workflow:
        adj[src].append(dst)
        indeg[dst] += 1
    queue = [n for n in nodes if indeg[n] == 0]
    while queue:
        n = queue.pop(0)
        order.append(n)
        for m in adj[n]:
            indeg[m] -= 1
            if indeg[m] == 0:
                queue.append(m)
    if len(order) != len(nodes):
        remaining = [n for n in nodes if n not in set(order)]
        raise CycleError(f"workflow contains a cycle involving: {remaining}")
    return order


def roots(workflow: list[tuple[str, str]]) -> set[str]:
    dsts = {d for _, d in workflow}
    return {s for s, _ in workflow if s not in dsts}


def leaves(workflow: list[tuple[str, str]]) -> set[str]:
    srcs = {s for s, _ in workflow}
    return {d for _, d in workflow if d not in srcs}

"""Cycle detection over the service call graph (reference:
internal/graph/cycle.go).

The edge *list* is tiny by construction (≤ #distinct (src,dst,op)
pairs, i.e. the service topology, not the event volume), so the honest
Spark design matches the reference's: aggregate distributed events down
to the edge DataFrame, then run a driver-side 3-color DFS over the
collected adjacency — global, small state, O(V+E) per batch. Unlike
the reference (Go map iteration order is random), traversal order is
pinned by sorting, so results are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

WHITE, GRAY, BLACK = 0, 1, 2


def cycle_key(cycle: list[str]) -> str:
    """Canonical cycle key: rotate to the minimal node, join with '|'
    (reference: cycle.go:81-105). A trailing repeat of the head node is
    dropped first."""
    if not cycle:
        return ""
    nodes = cycle
    if len(nodes) > 1 and nodes[0] == nodes[-1]:
        nodes = nodes[:-1]
    min_idx = min(range(len(nodes)), key=lambda i: nodes[i])
    return "|".join(nodes[(min_idx + i) % len(nodes)] for i in range(len(nodes)))


def find_cycles(adjacency: dict[str, list[str]], known: set[str] | None = None) -> list[list[str]]:
    """3-color DFS cycle extraction (reference: cycle.go:21-79). ``known``
    carries previously reported canonical keys so each cycle is emitted
    exactly once across calls (types_test.go:363-369); it is mutated.
    Iterative DFS (the reference recurses; service graphs are shallow
    but we avoid Python recursion limits)."""
    known = known if known is not None else set()
    colors: dict[str, int] = {}
    parent: dict[str, str] = {}
    result: list[list[str]] = []

    def extract(back_src: str, back_dst: str) -> list[str]:
        path = [back_src]
        cur = back_src
        while cur != back_dst:
            p = parent.get(cur)
            if p is None:
                break
            path.append(p)
            cur = p
        path.reverse()
        path.append(back_dst)
        return path

    for start in sorted(adjacency):
        if colors.get(start, WHITE) != WHITE:
            continue
        # iterative DFS with an explicit neighbor cursor
        stack: list[tuple[str, int]] = [(start, 0)]
        colors[start] = GRAY
        while stack:
            v, i = stack[-1]
            neighbors = sorted(adjacency.get(v, []))
            if i < len(neighbors):
                stack[-1] = (v, i + 1)
                u = neighbors[i]
                cu = colors.get(u, WHITE)
                if cu == GRAY:
                    cycle = extract(v, u)
                    key = cycle_key(cycle)
                    if key not in known:
                        known.add(key)
                        result.append(cycle)
                elif cu == WHITE:
                    parent[u] = v
                    colors[u] = GRAY
                    stack.append((u, 0))
            else:
                colors[v] = BLACK
                stack.pop()
    return result


def adjacency_from_edges(edges: DataFrame) -> dict[str, list[str]]:
    """Collect the (small) edge aggregate into an adjacency map
    (reference: graph.go:156-165 — nodes with no out-edges included)."""
    adj: dict[str, list[str]] = {}
    for row in edges.select("src", "dst").distinct().collect():
        adj.setdefault(row["src"], []).append(row["dst"])
        adj.setdefault(row["dst"], [])
    return adj


def find_new_cycles(edges: DataFrame, known: set[str] | None = None) -> list[list[str]]:
    """End-to-end: edge DataFrame → new cycles this batch."""
    return find_cycles(adjacency_from_edges(edges), known)

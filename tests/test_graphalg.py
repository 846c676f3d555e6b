"""Cycle-detection tests (reference: internal/graph/types_test.go:259-375)."""

from __future__ import annotations

from logshipper_spark.graphalg import cycle_key, find_cycles, find_new_cycles


def test_two_node_cycle():
    adj = {"a": ["b"], "b": ["a"]}
    cycles = find_cycles(adj)
    assert len(cycles) == 1
    assert cycle_key(cycles[0]) == "a|b"


def test_triangle():
    adj = {"a": ["b"], "b": ["c"], "c": ["a"]}
    cycles = find_cycles(adj)
    assert len(cycles) == 1
    assert cycle_key(cycles[0]) == "a|b|c"


def test_dag_negative():
    adj = {"a": ["b", "c"], "b": ["d"], "c": ["d"], "d": []}
    assert find_cycles(adj) == []


def test_self_loop():
    adj = {"a": ["a"]}
    cycles = find_cycles(adj)
    assert len(cycles) == 1
    assert cycle_key(cycles[0]) == "a"


# ── types_test.go:363-369 canonical key rotation ──
def test_cycle_key_canonicalization():
    assert cycle_key(["b", "c", "a", "b"]) == "a|b|c"
    assert cycle_key(["c", "a", "b"]) == "a|b|c"
    assert cycle_key([]) == ""


# ── once-only reporting across calls ──
def test_known_cycles_reported_once():
    known: set[str] = set()
    adj = {"a": ["b"], "b": ["a"]}
    assert len(find_cycles(adj, known)) == 1
    assert find_cycles(adj, known) == []  # second call: already known


def test_find_new_cycles_from_edges(spark):
    df = spark.createDataFrame(
        [("billing", "payment", "op"), ("payment", "billing", "op2"),
         ("api-gw", "billing", "op3")],
        "src string, dst string, op string",
    )
    cycles = find_new_cycles(df)
    assert [cycle_key(c) for c in cycles] == ["billing|payment"]

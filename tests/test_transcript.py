"""Conversation-level transcript analytics vs pure-Python references.

Every test generates a deterministic transcript frame (gen.transcripts)
or a hand-built corpus, computes the operator in Spark, and checks it
row-for-row against an independent Python reimplementation of the
semantics (not the Spark code path).
"""

from __future__ import annotations

from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from logshipper_spark import gen, transcript

MICROS = 1_000_000


@pytest.fixture(scope="module")
def turns_df(spark):
    df = gen.transcripts(spark, 3_000).cache()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def turns_py(turns_df):
    rows = [r.asDict() for r in turns_df.collect()]
    rows.sort(key=lambda r: (r["conv_id"], r["turn_idx"]))
    return rows


def _by_conv(rows):
    convs = defaultdict(list)
    for r in rows:
        convs[r["conv_id"]].append(r)
    return convs


def test_conv_stats_matches_python(turns_df, turns_py):
    got = {r["conv_id"]: r.asDict() for r in transcript.conv_stats(turns_df).collect()}
    convs = _by_conv(turns_py)
    assert set(got) == set(convs)
    for cid, rows in convs.items():
        g = got[cid]
        assert g["n_turns"] == len(rows)
        assert g["max_turn_idx"] == max(r["turn_idx"] for r in rows)
        for role in ("user", "assistant", "system", "tool"):
            assert g[f"{role}_turns"] == sum(1 for r in rows if r["role"] == role)
        assert g["tool_calls"] == sum(1 for r in rows if r["tool"] != "")
        assert g["distinct_tools"] == len({r["tool"] for r in rows if r["tool"] != ""})
        first = min(r["ts"] for r in rows)
        last = max(r["ts"] for r in rows)
        assert g["first_ts"] == first and g["last_ts"] == last
        assert g["duration_s"] == int((last - first).total_seconds())


def test_step_transitions_matches_python(turns_df, turns_py):
    got = {
        (r["prev_step"], r["step"]): (r["n_transitions"], r["prob_micros"])
        for r in transcript.step_transitions(turns_df).collect()
    }
    counts: Counter = Counter()
    for rows in _by_conv(turns_py).values():
        prev = "START"
        for r in rows:
            step = r["role"] if r["tool"] == "" else f"{r['role']}:{r['tool']}"
            counts[(prev, step)] += 1
            prev = step
    assert set(got) == set(counts)
    outgoing: Counter = Counter()
    for (prev, _), n in counts.items():
        outgoing[prev] += n
    for key, n in counts.items():
        assert got[key][0] == n
        assert got[key][1] == n * MICROS // outgoing[key[0]]
    # probabilities out of each prev_step sum to ~1 (integer floor)
    by_prev: dict = defaultdict(int)
    for (prev, _), (_, p) in got.items():
        by_prev[prev] += p
    for prev, total_p in by_prev.items():
        assert total_p <= MICROS
        assert total_p > MICROS - len([k for k in got if k[0] == prev])


def test_conv_funnel_matches_python(turns_df, turns_py):
    got = {r["depth"]: r.asDict() for r in transcript.conv_funnel(turns_df).collect()}
    sizes = Counter(len(rows) for rows in _by_conv(turns_py).values())
    total = sum(sizes.values())
    assert set(got) == set(sizes)
    for depth, n_exact in sizes.items():
        g = got[depth]
        at_least = sum(n for d, n in sizes.items() if d >= depth)
        assert g["n_convs_exact"] == n_exact
        assert g["n_convs_at_least"] == at_least
        assert g["retention_micros"] == at_least * MICROS // total
    # monotone: deeper depth → fewer conversations
    depths = sorted(got)
    for a, b in zip(depths, depths[1:]):
        assert got[a]["n_convs_at_least"] >= got[b]["n_convs_at_least"]


def test_render_conversations_matches_python(turns_df, turns_py):
    got = {
        r["conv_id"]: r.asDict()
        for r in transcript.render_conversations(turns_df).collect()
    }
    for cid, rows in _by_conv(turns_py).items():
        lines = []
        for r in rows:  # already sorted by turn_idx
            tag = f"[{r['tool']}]" if r["tool"] != "" else ""
            lines.append(f"{r['role']}{tag}: {r['text']}")
        doc = "\n".join(lines)
        assert got[cid]["doc"] == doc
        assert got[cid]["n_turns"] == len(rows)
        assert got[cid]["n_chars"] == len(doc)


def test_render_deterministic_under_repartition(turns_df):
    a = transcript.render_conversations(turns_df)
    b = transcript.render_conversations(turns_df.repartition(7, "turn_idx"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_sft_pairs_matches_python(turns_df, turns_py):
    got = {
        (r["conv_id"], r["response_turn_idx"]): r.asDict()
        for r in transcript.sft_pairs(turns_df).collect()
    }
    expected = {}
    for cid, rows in _by_conv(turns_py).items():
        last_user = None
        for r in rows:
            if r["role"] == "assistant" and last_user is not None:
                expected[(cid, r["turn_idx"])] = (
                    last_user["turn_idx"],
                    last_user["text"],
                    r["text"],
                )
            if r["role"] == "user":
                last_user = r
    assert set(got) == set(expected)
    for key, (p_idx, p_text, resp) in expected.items():
        g = got[key]
        assert g["prompt_turn_idx"] == p_idx
        assert g["prompt"] == p_text
        assert g["response"] == resp


def test_sft_pairs_edge_cases(spark):
    rows = [
        # conv with assistant before any user: opener dropped
        ("c1", 0, "assistant", "a0", "", "2024-01-01 00:00:00"),
        ("c1", 1, "user", "u1", "", "2024-01-01 00:00:02"),
        ("c1", 2, "tool", "t2", "search", "2024-01-01 00:00:04"),
        ("c1", 3, "assistant", "a3", "", "2024-01-01 00:00:06"),
        ("c1", 4, "assistant", "a4", "", "2024-01-01 00:00:08"),
        # conv with no user turns at all: no pairs
        ("c2", 0, "system", "s0", "", "2024-01-01 00:00:00"),
        ("c2", 1, "assistant", "a1", "", "2024-01-01 00:00:02"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = sorted(
        (r["conv_id"], r["response_turn_idx"], r["prompt_turn_idx"], r["prompt"])
        for r in transcript.sft_pairs(df).collect()
    )
    # both assistant turns after u1 pair with it (nearest preceding user)
    assert got == [("c1", 3, 1, "u1"), ("c1", 4, 1, "u1")]


# ── integrity report ──

_IT = __import__("datetime").datetime(2024, 5, 1, 12, 0, 0)


def _its(s):
    import datetime as dt

    return None if s is None else _IT + dt.timedelta(seconds=s)


# adversarial corpus: c1 clean; c2 inversion (non-adjacent too) + dup idx;
# c3 holes + starts at 2; c4 NULL ts/idx/text + blank role; c5 single row
_INTEG_ROWS = [
    ("c1", 0, "user", "hi", "", _its(0)),
    ("c1", 1, "assistant", "yo", "", _its(2)),
    ("c2", 0, "user", "a", "", _its(0)),
    ("c2", 1, "assistant", "b", "", _its(50)),
    ("c2", 2, "user", "c", "", _its(10)),   # < max so far → inversion
    ("c2", 3, "tool", "d", "grep", _its(20)),  # still < 50 → inversion
    ("c2", 3, "tool", "e", "grep", _its(60)),  # dup idx 3
    ("c3", 2, "user", "x", "", _its(0)),
    ("c3", 5, "assistant", "y", "", _its(1)),  # holes 3,4
    ("c4", 0, "user", None, "", None),       # null text + null ts
    ("c4", None, "", "z", "", _its(5)),      # null idx + blank role
    ("c5", 0, "system", "s", "", _its(0)),
]


def test_integrity_report_adversarial(spark):
    df = spark.createDataFrame(
        _INTEG_ROWS,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp_ntz",
    )
    got = {r["conv_id"]: r.asDict() for r in
           transcript.integrity_report(df).collect()}
    assert set(got) == {"c1", "c2", "c3", "c4", "c5"}

    def chk(cid, **want):
        g = got[cid]
        for k, v in want.items():
            assert g[k] == v, (cid, k, g[k], v)

    chk("c1", n_turns=2, ts_inversions=0, dup_turn_idx=0, missing_turn_idx=0,
        starts_at_zero=True, null_turn_idx=0, null_ts=0, blank_role=0,
        null_text=0, conv_ok=True)
    chk("c2", n_turns=5, ts_inversions=2, dup_turn_idx=1, missing_turn_idx=0,
        starts_at_zero=True, conv_ok=False)
    chk("c3", n_turns=2, ts_inversions=0, dup_turn_idx=0, missing_turn_idx=2,
        starts_at_zero=False, conv_ok=False)
    chk("c4", n_turns=2, ts_inversions=0, dup_turn_idx=0, missing_turn_idx=0,
        starts_at_zero=True, null_turn_idx=1, null_ts=1, blank_role=1,
        null_text=1, conv_ok=False)
    chk("c5", n_turns=1, ts_inversions=0, dup_turn_idx=0, missing_turn_idx=0,
        starts_at_zero=True, conv_ok=True)


def test_integrity_report_clean_corpus(turns_df):
    """gen.transcripts is in-order by construction: every conversation
    must report conv_ok."""
    rep = transcript.integrity_report(turns_df)
    assert rep.filter("NOT conv_ok").count() == 0
    assert rep.count() == turns_df.select("conv_id").distinct().count()


def test_render_null_lanes_keep_turns(spark):
    """A NULL text/role turn renders as an empty lane instead of
    silently vanishing from the doc (n_turns == rendered line count)."""
    turns = spark.createDataFrame(
        [("c1", 0, "user", "hi", "", None),
         ("c1", 1, "assistant", None, "", None),
         ("c1", 2, None, "bye", "", None)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    r = transcript.render_conversations(turns).collect()[0]
    assert r["n_turns"] == 3
    assert r["doc"].split("\n") == ["user: hi", "assistant: ", ": bye"]


def test_step_transitions_null_prev_not_start(spark):
    """A genuinely NULL previous step label stays a distinct group —
    only each conversation's FIRST turn transitions from START."""
    turns = spark.createDataFrame(
        [("c1", 0, None, "t", "", None),
         ("c1", 1, "assistant", "t", "", None)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    got = {(r["prev_step"], r["step"]): r["n_transitions"]
           for r in transcript.step_transitions(turns).collect()}
    # first turn (NULL role) transitions FROM START; the second
    # transitions from the NULL label, not from START
    assert got == {("START", None): 1, (None, "assistant"): 1}

"""Nested-JSON flattening + parse-warning layer (reference:
docs/normalization-spec.md — the last spec-only parser family).

Three documented behaviors, all pure column expressions (one
``from_json`` per nesting level, no UDFs):

* top-level nested objects flatten to dot-notation Attrs at max depth 5
  (docs/normalization-spec.md:91);
* a string-valued ``message``/``msg``/``log``/``body`` field whose
  content is itself JSON is unmarshalled and merged into Attrs under
  the parent key at max depth 3, and ``Message`` is cleared
  (docs/normalization-spec.md:355-385);
* failed coercions append to the ``Attrs["_parse_warn"]`` array
  (docs/normalization-spec.md:250-258, 278-291) — surfaced here as a
  first-class ``parse_warn`` array<string> column.

The decode uses Spark's VARIANT type (``map<string,variant>``) so a
*real nested object* and a *string that merely contains JSON text* are
distinguishable — the spec flattens the former for every key but the
latter only for the message-scope keys ("not applied to arbitrary
Attrs fields to avoid unbounded recursion", spec §5.4).

Documented deltas (mirroring the engine's standing policy):
* missing/unparseable timestamps pin to the run's ``ingest_ts`` instead
  of ``time.Now()`` (determinism; same delta as parse.py);
* a message-scope string holding a JSON *array* stays verbatim (an
  array has no fields to merge) and does not clear ``Message``;
* duplicate flattened keys (``{"a.b":1,"a":{"b":2}}``) keep the first
  occurrence — Go map-merge order is undefined, so a deterministic rule
  is required; first-win is pinned and tested.

This layer is opt-in on top of ``parse.parse_normalized`` — the hot
parse path stays unchanged (CLAUDE.md: per-row additions to the parse
chain cost real throughput; flattening runs only where a pipeline asks
for spec-style Attrs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .parse import _INT_RE, _ts_candidate
from .schemas import DEFAULT_INGEST_TS

VMAP = "map<string,variant>"

# spec §1.5 alias groups (first present *string* value wins)
SPEC_TS_KEYS = ["@timestamp", "timestamp", "time", "ts", "datetime"]
SPEC_LEVEL_KEYS = ["level", "severity", "loglevel", "lvl"]
SPEC_MSG_KEYS = ["message", "msg", "text", "body"]
SPEC_SERVICE_KEYS = ["service", "service_name", "app", "application", "logger"]
# spec §5.4 scope for JSON-inside-a-string merging
MERGE_SCOPE_KEYS = ["message", "msg", "log", "body"]

_ENTRY = "struct<key:string,value:variant>"


def _is_obj(v: Column) -> Column:
    return F.schema_of_variant(v).startswith("OBJECT")


def _ventries(v: Column) -> Column:
    """Entries of an OBJECT variant as array<struct<key,value:variant>>
    (variant has no map_entries; round-trip through its JSON text)."""
    return F.map_entries(F.from_json(F.to_json(v), VMAP))


def _prefixed(entries: Column, prefix: Column) -> Column:
    return F.transform(
        entries,
        lambda i: F.struct(
            F.concat(prefix, F.lit("."), i["key"]).alias("key"),
            i["value"].alias("value"),
        ),
    )


def _flatten_once(entries: Column) -> Column:
    """One flattening level: OBJECT-valued entries are replaced by their
    children with dotted keys; everything else passes through."""
    return F.flatten(
        F.transform(
            entries,
            lambda e: F.when(
                _is_obj(e["value"]), _prefixed(_ventries(e["value"]), e["key"])
            ).otherwise(
                F.array(
                    F.struct(e["key"].alias("key"), e["value"].alias("value"))
                )
            ),
        )
    )


def _dedup_first_win(entries: Column) -> Column:
    """Keep the first occurrence of each key (pinned merge order; the
    session's map_from_entries runs under EXCEPTION dedup policy, so
    duplicates must be resolved before map construction)."""
    return F.filter(
        entries,
        lambda e, i: F.size(
            F.filter(F.slice(entries, 1, i), lambda p: p["key"] == e["key"])
        )
        == 0,
    )


def _stringify(entries: Column) -> Column:
    """variant values → strings: scalars take their raw form, residual
    objects/arrays (beyond the depth cap) keep their JSON text."""
    return F.map_from_entries(
        F.transform(
            entries,
            lambda e: F.struct(
                e["key"].alias("key"),
                e["value"].try_cast("string").alias("value"),
            ),
        )
    )


def flatten_entries(entries: Column, max_depth: int = 5) -> Column:
    """Flatten nested-object entries to dotted keys, ``max_depth`` path
    segments deep (spec §1.5: 5). Level-(max_depth+1) objects stay as
    raw JSON text values."""
    out = entries
    for _ in range(max_depth - 1):
        out = _flatten_once(out)
    return out


def _str_value(v: Column) -> Column:
    """Variant → non-empty string when the variant IS a string, else
    NULL (the spec's firstString over string-typed values)."""
    s = F.when(F.schema_of_variant(v) == "STRING", v.try_cast("string"))
    return F.nullif(s, F.lit(""))


def _first_string_key(m: Column, keys: list[str]) -> Column:
    """The winning alias key name (not value): first key present with a
    non-empty string value."""
    return F.coalesce(
        *[
            F.when(
                _str_value(F.try_element_at(m, F.lit(k))).isNotNull(), F.lit(k)
            )
            for k in keys
        ]
    )


def parse_nested(
    df: DataFrame,
    text_col: str = "text",
    ingest_ts: str = DEFAULT_INGEST_TS,
    max_depth: int = 5,
    message_depth: int = 3,
) -> DataFrame:
    """Append the spec-family nested columns: ``event_ts``, ``level``,
    ``message``, ``service``, ``attrs`` (flattened map<string,string>),
    ``parse_warn`` (array<string>).

    Resolution: each §1.5 alias group consumes its winning key; all
    remaining top-level keys land in ``attrs`` with nested objects
    flattened to dotted keys (depth ``max_depth``). A message-scope key
    whose *string* value is a JSON object is replaced by its fields
    merged under the parent key (depth ``message_depth``); when that
    key is also the resolved Message, ``message`` comes out empty
    (spec §5.4 step 4)."""
    s = F.trim(F.col(text_col))
    out = df.withColumn(
        "_vm",
        F.when(F.substring(s, 1, 1) == "{", F.from_json(s, VMAP)),
    )
    m = F.col("_vm")

    ts_key = _first_string_key(m, SPEC_TS_KEYS)
    level_key = _first_string_key(m, SPEC_LEVEL_KEYS)
    msg_key = _first_string_key(m, SPEC_MSG_KEYS)
    svc_key = _first_string_key(m, SPEC_SERVICE_KEYS)
    out = (
        out.withColumn("_tsk", ts_key)
        .withColumn("_lvk", level_key)
        .withColumn("_mgk", msg_key)
        .withColumn("_svk", svc_key)
    )
    ts_key, level_key = F.col("_tsk"), F.col("_lvk")
    msg_key, svc_key = F.col("_mgk"), F.col("_svk")

    def val_of(key: Column) -> Column:
        return _str_value(F.try_element_at(m, key))

    ts_raw = val_of(ts_key)
    ts_parsed = _ts_candidate(ts_raw)

    # message-scope merge candidates: string value, JSON-object content
    def mergeable(e: Column) -> Column:
        sv = _str_value(e["value"])
        return (
            e["key"].isin(*MERGE_SCOPE_KEYS)
            & sv.isNotNull()
            & F.ltrim(sv).startswith("{")
            & F.from_json(sv, VMAP).isNotNull()
        )

    top = F.coalesce(F.map_entries(m), F.array().cast(f"array<{_ENTRY}>"))
    # NULL-safe membership, not a ''-coalesce sentinel: an unresolved
    # alias group would otherwise alias the legal empty-string JSON
    # key ('{"": "x"}') and silently drop it from attrs
    consumed = F.filter(
        F.array(ts_key, level_key, msg_key, svc_key), lambda k: k.isNotNull()
    )
    rest = F.filter(
        top,
        lambda e: ~F.array_contains(consumed, e["key"]) & ~mergeable(e),
    )
    flat_rest = flatten_entries(rest, max_depth)

    merged = F.flatten(
        F.transform(
            F.filter(top, mergeable),
            lambda e: flatten_entries(
                _prefixed(
                    F.map_entries(F.from_json(_str_value(e["value"]), VMAP)),
                    e["key"],
                ),
                message_depth,
            ),
        )
    )
    all_entries = _dedup_first_win(F.concat(flat_rest, merged))
    out = out.withColumn("attrs", _stringify(all_entries))

    # message: the resolved message key's value — cleared when that key
    # merged as JSON (spec §5.4 step 4: "the original string was not a
    # human-readable message")
    msg_val = val_of(msg_key)
    msg_merged = (
        msg_key.isin(*MERGE_SCOPE_KEYS)
        & F.ltrim(msg_val).startswith("{")
        & F.from_json(msg_val, VMAP).isNotNull()
    )
    out = out.withColumn(
        "message",
        F.when(m.isNull(), F.col(text_col)).otherwise(
            F.coalesce(F.when(~msg_merged, msg_val), F.lit(""))
        ),
    )

    # warnings (spec §4.3 array form)
    status_attr = F.try_element_at(F.col("attrs"), F.lit("http.response.status_code"))
    warns = F.filter(
        F.array(
            F.when(
                ts_key.isNotNull() & ts_parsed.isNull(),
                F.concat(F.lit("timestamp parse failed: '"), ts_raw, F.lit("'")),
            ),
            F.when(
                status_attr.isNotNull() & ~status_attr.rlike(_INT_RE),
                F.concat(
                    F.lit("int coercion failed: http.response.status_code = '"),
                    status_attr,
                    F.lit("'"),
                ),
            ),
        ),
        lambda w: w.isNotNull(),
    )
    out = out.withColumn("parse_warn", warns)
    out = (
        out.withColumn("event_ts", F.coalesce(ts_parsed, F.lit(ingest_ts).cast("timestamp")))
        .withColumn("level", F.coalesce(F.lower(val_of(level_key)), F.lit("")))
        .withColumn("service", F.coalesce(val_of(svc_key), F.lit("")))
    )
    return out.drop("_vm", "_tsk", "_lvk", "_mgk", "_svk")

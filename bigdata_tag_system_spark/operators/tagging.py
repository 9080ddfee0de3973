"""One-pass multi-tag evaluation over fact tables.

The reference evaluates tags with one ``filter`` + ``count`` + ``union``
job **per rule** (``src/engine/tag_computer.py:99-151``,
``src/merger/tag_merger.py:31-56``) — N scans, N actions, then a
union → dropDuplicates → groupBy(collect_list) shuffle to rebuild per-user
arrays. Here all rules compile to ``when()`` branches evaluated in a single
projection over one scan:

    select(user_id, array_compact(array(when(pred_i, tag_i)...)))

so "parallel tags" is real columnar parallelism inside whole-stage codegen,
with **zero shuffles** for the core profile build (the reference's shuffle
chain is gone entirely). At 100 TB this is the difference between one pass
over the facts and 50 passes.

Outputs:
- :func:`tag_profiles` — wide per-user profile
  ``(user_id, tag_ids array<int>, tag_details map, computed_date)``
  (reference shape: ``src/merger/tag_merger.py:160-165``).
- :func:`tag_assignments` — narrow ``(user_id, tag_id, tag_detail)``
  relation via ``explode`` (reference shape: ``tag_computer.py:67``),
  derived from the same single pass.

Tag detail JSON is built natively with ``to_json(struct(...))`` /
``map_from_entries`` — replacing the reference's 4 duplicated Python UDFs
(SURVEY §2.10: ``generate_tag_detail``, ``build_tag_details``).
"""

from __future__ import annotations

import datetime as _dt
from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdata_tag_system_spark.rules.compiler import RuleCompiler
from bigdata_tag_system_spark.rules.model import Rule, ordered_fields, required_fields

# presentation text for the human-readable hit reason; comparison ops keep
# their symbol, everything else reads as "<field>=<live> <op> <threshold>"
_REASON_OP = {"==": "=", "<>": "!="}


def _fmt_threshold(v) -> str:
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(str(x) for x in v) + "]"
    return str(v)


def _leaf_reason(node) -> Column:
    """``field=<live value> <op> <threshold>`` as a native Column.

    The reference builds this string row-at-a-time in a Python UDF
    (``src/engine/tag_computer.py:197-233``, ``_generate_hit_reason`` /
    ``_format_single_reason``); here it is ``concat`` over literals plus
    one cast of the live column — stays inside whole-stage codegen.
    """
    field = str(node.get("field", ""))
    op = str(node.get("operator", ""))
    live = F.coalesce(F.col(field).cast("string"), F.lit("null"))
    if op in ("is_null", "is_not_null"):
        return F.lit(f"{field} {op.replace('_', ' ')}")
    shown = _REASON_OP.get(op, op)
    return F.concat(
        F.lit(f"{field}="), live,
        F.lit(f" {shown} {_fmt_threshold(node.get('value'))}"))


def _reason_col(node) -> Column:
    """Recursive reason over the whole condition tree (AND/OR/NOT joins).

    The reference formats only the top-level condition list and falls back
    to a constant on nested groups; the recursion here mirrors the
    compiler's, so every rule the engine can evaluate gets a full reason.
    """
    if not node:
        return F.lit("always")
    if "conditions" in node or "logic" in node:
        logic = str(node.get("logic", "AND")).upper()
        children = [_reason_col(c) for c in node.get("conditions", []) or []]
        if not children:
            return F.lit("always")
        joined = children[0] if len(children) == 1 else F.concat_ws(
            f" {'OR' if logic == 'OR' else 'AND'} ", *children)
        if logic == "NOT":
            return F.concat(F.lit("NOT("), joined, F.lit(")"))
        if len(children) == 1:
            return joined
        return F.concat(F.lit("("), joined, F.lit(")"))
    return _leaf_reason(node)


class TagEngine:
    """Compile a rule set once, evaluate many ways.

    Parameters mirror the determinism requirements of SURVEY §7.3: pin
    ``as_of`` (relative-date anchor) and ``run_ts`` (the hit timestamp
    stamped into tag details — the reference calls ``datetime.now()``
    per row inside a UDF, ``tag_computer.py:172``, which is
    nondeterministic; we stamp one literal per run).
    """

    def __init__(
        self,
        rules: Sequence[Rule],
        user_col: str = "user_id",
        as_of: _dt.date | str | None = None,
        run_ts: _dt.datetime | str | None = None,
    ):
        self.rules = [r for r in rules if r.is_active]
        self.user_col = user_col
        self.compiler = RuleCompiler(as_of=as_of)
        if isinstance(run_ts, str):
            run_ts = _dt.datetime.fromisoformat(run_ts)
        self.run_ts = run_ts
        self._compiled: list[tuple[Rule, Column]] = [
            (r, self.compiler.compile(r.conditions)) for r in self.rules
        ]

    # -- helpers ------------------------------------------------------------

    def fields(self) -> set[str]:
        """Union of fact columns any rule touches (column pruning)."""
        out: set[str] = set()
        for r in self.rules:
            out |= required_fields(r.conditions)
        return out

    def validate(self, facts: DataFrame) -> dict:
        """Pre-compute rule-vs-schema check with a readable report.

        The reference validates each rule's fields against the fact
        schema before computing and logs the missing ones
        (``src/engine/tag_computer.py:286-302``); without this an engine
        surfaces a raw Spark analysis error mid-plan. Returns::

            {"ok": bool, "user_col_present": bool,
             "rules": [{"rule_id", "tag_id", "tag_name", "ok",
                        "missing_fields": [...]}, ...]}

        Pure schema work — touches ``facts.columns`` only, runs no job.
        """
        cols = set(facts.columns)
        rules_report = []
        for r in self.rules:
            missing = sorted(required_fields(r.conditions) - cols)
            rules_report.append({
                "rule_id": int(r.rule_id),
                "tag_id": int(r.tag_id),
                "tag_name": r.tag_name,
                "ok": not missing,
                "missing_fields": missing,
            })
        user_ok = self.user_col in cols
        return {
            "ok": user_ok and all(rr["ok"] for rr in rules_report),
            "user_col_present": user_ok,
            "rules": rules_report,
        }

    def coverage(self, facts: DataFrame) -> DataFrame:
        """One-scan rule coverage report: per rule, how many fact rows
        its predicate matches, the fact total, and coverage in basis
        points (exact integer math — no float ties).

        The ops question behind it: "is rule 7 dead / matching
        everything?" before a production run. Every rule becomes ONE
        conditional aggregate in a single ``facts.agg(...)`` pass —
        N rules cost one scan and zero shuffles beyond the final 1-row
        reduce (vs the reference's one-query-per-rule stats loop) —
        then the wide row unpivots to (rule, counts) through a literal
        struct array. Returns
        ``(rule_id, tag_id, tag_name, matched, total, coverage_bp)``.
        """
        aggs = [F.count(F.lit(1)).alias("_total")] + [
            F.sum(F.when(pred, 1).otherwise(0)).cast("long")
            .alias(f"_m{i}")
            for i, (_, pred) in enumerate(self._compiled)
        ]
        wide = facts.agg(*aggs)
        rows = F.array(*[
            F.struct(
                F.lit(int(r.rule_id)).alias("rule_id"),
                F.lit(int(r.tag_id)).alias("tag_id"),
                F.lit(r.tag_name).alias("tag_name"),
                F.col(f"_m{i}").alias("matched"),
            )
            for i, (r, _) in enumerate(self._compiled)
        ])
        return (
            wide.select(F.explode(rows).alias("s"), "_total")
            .select(
                "s.*",
                F.col("_total").alias("total"),
                F.expr("(s.matched * 10000) DIV _total")
                .alias("coverage_bp"),
            )
        )

    def _hit_tag_col(self) -> Column:
        """array<int> of tag_ids whose predicate hit, sorted+distinct."""
        branches = [
            F.when(pred, F.lit(int(rule.tag_id))) for rule, pred in self._compiled
        ]
        if not branches:
            return F.array().cast("array<int>")
        return F.array_sort(
            F.array_distinct(F.array_compact(F.array(*branches)))
        ).cast("array<int>")

    def _detail_entries_col(self) -> Column:
        """array<struct<key,value>> for map_from_entries, hit rules only.

        Detail fields match the reference's per-hit JSON
        (``src/engine/tag_computer.py:160-284``): ``value`` is the live
        value of the rule's first condition field, ``reason`` a
        human-readable rendering of the matched conditions with live
        values, ``rule_version`` the catalog version stamp — all built
        from native expressions, where the reference runs a Python UDF
        per row.
        """
        ts = F.lit(self.run_ts) if self.run_ts else F.current_timestamp()
        entries = []
        for rule, pred in self._compiled:
            fields = ordered_fields(rule.conditions)
            hit_value = (
                F.coalesce(F.col(fields[0]).cast("string"), F.lit(""))
                if fields else F.lit("")
            )
            detail = F.struct(
                F.lit(rule.tag_name).alias("tag_name"),
                F.lit(rule.tag_category).alias("tag_category"),
                F.lit(int(rule.rule_id)).alias("rule_id"),
                F.lit(rule.rule_version).alias("rule_version"),
                hit_value.alias("value"),
                _reason_col(rule.conditions).alias("reason"),
                ts.alias("hit_time"),
            )
            entries.append(
                F.when(pred, F.struct(F.lit(str(rule.tag_id)).alias("key"), detail.alias("value")))
            )
        if not entries:
            # typed empty so map_from_entries/explode still resolve
            return F.array().cast(
                "array<struct<key:string,value:struct<tag_name:string,"
                "tag_category:string,rule_id:int,rule_version:string,"
                "value:string,reason:string,hit_time:timestamp>>>"
            )
        return F.array_compact(F.array(*entries))

    # -- public operators ----------------------------------------------------

    def profiles(
        self,
        facts: DataFrame,
        computed_date: _dt.date | str | None = None,
        keep_empty: bool = False,
        with_details: bool = True,
    ) -> DataFrame:
        """Wide per-user profile in ONE pass, no shuffle.

        Returns ``(user_id, tag_ids array<int>, tag_details map<string,
        struct>, computed_date date)``. Users with no hits are dropped
        unless ``keep_empty``.
        """
        if computed_date is None:
            cd = F.current_date()
        else:
            cd = F.to_date(F.lit(str(computed_date)))
        cols = [
            F.col(self.user_col),
            self._hit_tag_col().alias("tag_ids"),
        ]
        if with_details:
            cols.append(F.map_from_entries(self._detail_entries_col()).alias("tag_details"))
        cols.append(cd.alias("computed_date"))
        out = facts.select(*cols)
        if not keep_empty:
            out = out.where(F.size("tag_ids") > 0)
        return out

    def observed_profiles(
        self,
        facts: DataFrame,
        computed_date: _dt.date | str | None = None,
        keep_empty: bool = False,
        with_details: bool = True,
        per_tag: bool = True,
    ):
        """(profiles, Observation) — run stats without extra jobs.

        The reference fires 40+ eager ``count()`` actions for run stats
        (SURVEY §4 anti-pattern); an ``Observation`` rides the single
        write action instead: after the caller's action completes,
        ``observation.get`` yields ``profiles`` (row count), ``tag_hits``
        (total assignments), and per-tag hit counts — zero extra passes.
        """
        from pyspark.sql import Observation

        prof = self.profiles(
            facts, computed_date=computed_date, keep_empty=keep_empty,
            with_details=with_details)
        metrics = [
            F.count(F.lit(1)).alias("profiles"),
            F.coalesce(F.sum(F.size("tag_ids")), F.lit(0)).alias("tag_hits"),
        ]
        if per_tag:
            metrics += [
                F.coalesce(
                    F.sum(F.array_contains("tag_ids", int(r.tag_id)).cast("int")),
                    F.lit(0),
                ).alias(f"tag_{r.tag_id}_hits")
                for r in self.rules
            ]
        obs = Observation("tag_metrics")
        return prof.observe(obs, *metrics), obs

    def assignments(self, facts: DataFrame) -> DataFrame:
        """Narrow ``(user_id, tag_id, tag_detail json-string)`` relation.

        Same single pass; ``explode`` fans hit structs out to one row per
        (user, tag) — the reference's intermediate shape
        (``tag_computer.py:67``) without its per-rule jobs.
        """
        entries = self._detail_entries_col()
        exploded = (
            facts.select(F.col(self.user_col), F.explode(entries).alias("e"))
            .select(
                self.user_col,
                F.col("e.key").cast("int").alias("tag_id"),
                F.to_json(F.col("e.value")).alias("tag_detail"),
            )
        )
        return exploded

    def enriched_assignments(self, facts: DataFrame, definitions: DataFrame) -> DataFrame:
        """Assignments left-joined to a tag-definition dim (broadcast).

        Reference: ``tag_merger._enrich_with_tag_info``
        (``src/merger/tag_merger.py:228-238``) — dim is tag-catalog sized
        (tens of rows), so broadcast explicitly; never shuffle facts for it.
        """
        return self.assignments(facts).join(F.broadcast(definitions), "tag_id", "left")


def tag_profiles(
    facts: DataFrame,
    rules: Iterable[Rule],
    user_col: str = "user_id",
    as_of: _dt.date | str | None = None,
    computed_date: _dt.date | str | None = None,
) -> DataFrame:
    """Functional convenience wrapper over :class:`TagEngine.profiles`."""
    return TagEngine(list(rules), user_col=user_col, as_of=as_of).profiles(
        facts, computed_date=computed_date
    )


def tag_assignments(
    facts: DataFrame,
    rules: Iterable[Rule],
    user_col: str = "user_id",
    as_of: _dt.date | str | None = None,
) -> DataFrame:
    """Functional convenience wrapper over :class:`TagEngine.assignments`."""
    return TagEngine(list(rules), user_col=user_col, as_of=as_of).assignments(facts)

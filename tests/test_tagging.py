"""One-pass tag pipeline tests against the golden fixture (FIXTURES.md §4)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from bigdata_tag_system_spark.operators.merge import MergeStrategy, merge_profiles
from bigdata_tag_system_spark.operators.tagging import TagEngine

from .conftest import AS_OF, EXPECTED


def test_golden_profiles(spark, users_df, golden_rules):
    eng = TagEngine(golden_rules, as_of=AS_OF, run_ts="2024-07-13T00:00:00")
    prof = eng.profiles(users_df, computed_date=AS_OF)
    rows = {r["user_id"]: r for r in prof.collect()}

    # invert EXPECTED into per-user tag sets
    per_user: dict[str, set[int]] = {}
    for tag, users in EXPECTED.items():
        for u in users:
            per_user.setdefault(u, set()).add(tag)

    assert set(rows) == set(per_user)
    for u, tags in per_user.items():
        assert rows[u]["tag_ids"] == sorted(tags), u
        # details keyed by str(tag_id), carrying name/category
        assert set(rows[u]["tag_details"].keys()) == {str(t) for t in tags}
        assert str(rows[u]["computed_date"]) == AS_OF


def test_golden_assignments(spark, users_df, golden_rules):
    eng = TagEngine(golden_rules, as_of=AS_OF, run_ts="2024-07-13T00:00:00")
    asg = eng.assignments(users_df)
    got: dict[int, set[str]] = {}
    for r in asg.collect():
        got.setdefault(r["tag_id"], set()).add(r["user_id"])
        detail = json.loads(r["tag_detail"])
        assert {"tag_name", "tag_category", "rule_id", "hit_time"} <= set(detail)
    assert got == EXPECTED


def test_single_pass_plan(spark, users_df, golden_rules):
    """profiles() must be a single projection — no shuffle/exchange at all."""
    eng = TagEngine(golden_rules, as_of=AS_OF)
    plan = eng.profiles(users_df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_enriched_assignments_broadcast(spark, users_df, golden_rules):
    defs = spark.createDataFrame(
        [(t, f"name_{t}") for t in range(1, 8)], "tag_id int, def_name string"
    )
    eng = TagEngine(golden_rules, as_of=AS_OF)
    enriched = eng.enriched_assignments(users_df, defs)
    plan = enriched._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    row = enriched.where("user_id='user_002'").collect()
    assert [r["def_name"] for r in row] == ["name_5"]


def test_merge_union(spark, users_df, golden_rules):
    eng = TagEngine(golden_rules, as_of=AS_OF)
    new = eng.profiles(users_df, computed_date=AS_OF)
    existing = spark.createDataFrame(
        [("user_001", [99]), ("user_999", [1])], "user_id string, tag_ids array<int>"
    )
    merged = {r["user_id"]: r["tag_ids"] for r in
              merge_profiles(new, existing, MergeStrategy.UNION).collect()}
    assert merged["user_001"] == [1, 2, 3, 6, 7, 99]
    assert "user_999" not in merged  # UNION keeps only new-batch users

    full = {r["user_id"]: r["tag_ids"] for r in
            merge_profiles(new, existing, MergeStrategy.FULL_OUTER_UNION).collect()}
    assert full["user_999"] == [1]
    assert full["user_001"] == [1, 2, 3, 6, 7, 99]

    over = {r["user_id"]: r["tag_ids"] for r in
            merge_profiles(new, existing, MergeStrategy.OVERWRITE).collect()}
    assert over["user_001"] == [1, 2, 3, 6, 7]


def test_column_pruning_fields(golden_rules):
    eng = TagEngine(golden_rules)
    assert "login_count_30d" in eng.fields()  # nested group field found
    assert eng.fields() <= {
        "total_asset_value", "user_level", "kyc_status", "trade_count_30d",
        "cash_balance", "age", "last_login_date", "login_count_30d",
    }


class TestObservedMetrics:
    def test_observation_rides_the_write(self, spark, tmp_path, golden_rules):
        from .conftest import AS_OF, EXPECTED, USERS, USER_SCHEMA
        from bigdata_tag_system_spark.operators.tagging import TagEngine

        facts = spark.createDataFrame(USERS, schema=USER_SCHEMA)
        eng = TagEngine(golden_rules, as_of=AS_OF)
        prof, obs = eng.observed_profiles(facts, computed_date=AS_OF)
        prof.write.mode("overwrite").parquet(str(tmp_path / "out"))  # ONE action
        m = obs.get
        want_hits = sum(len(v) for v in EXPECTED.values())
        want_users = len({u for v in EXPECTED.values() for u in v})
        assert m["profiles"] == want_users
        assert m["tag_hits"] == want_hits
        for tag, users in EXPECTED.items():
            assert m[f"tag_{tag}_hits"] == len(users)


class TestDecimalRules:
    def test_decimal_20_8_exact_comparison(self, spark):
        from decimal import Decimal

        from pyspark.sql.types import DecimalType, StructField, StructType, StringType
        from bigdata_tag_system_spark.rules.compiler import compile_rule

        schema = StructType([
            StructField("user_id", StringType()),
            StructField("bal", DecimalType(20, 8)),
        ])
        rows = [
            ("u1", Decimal("100000.00000001")),
            ("u2", Decimal("100000.00000000")),
            ("u3", Decimal("99999.99999999")),
        ]
        df = spark.createDataFrame(rows, schema)
        cond = {"field": "bal", "operator": ">", "value": "100000.00000000",
                "type": "decimal"}
        got = {r["user_id"] for r in df.where(compile_rule(cond)).collect()}
        # exact at 8 fractional digits — a double literal would collapse
        # u1/u2 onto the same value
        assert got == {"u1"}


class TestDetailParity:
    """Reference detail-JSON parity: reason / value / rule_version
    (``src/engine/tag_computer.py:160-284``) built natively, no UDF."""

    def test_detail_fields_present(self, spark, users_df, golden_rules):
        eng = TagEngine(golden_rules, as_of=AS_OF, run_ts="2024-07-13T00:00:00")
        row = eng.profiles(users_df, computed_date=AS_OF) \
            .where("user_id='user_001'").collect()[0]
        d = row["tag_details"]["1"].asDict()
        assert d["rule_version"] == "1.0"
        # live value of the rule's FIRST condition field (total_asset_value)
        assert d["value"] == "150000.0"
        assert d["reason"] == "total_asset_value=150000.0 >= 100000"

    def test_reason_logic_joins(self, spark, users_df, golden_rules):
        eng = TagEngine(golden_rules, as_of=AS_OF, run_ts="2024-07-13T00:00:00")
        row = eng.profiles(users_df, computed_date=AS_OF) \
            .where("user_id='user_005'").collect()[0]
        # rule 7: AND of two leaves plus a nested OR group
        r7 = row["tag_details"]["7"].asDict()["reason"]
        assert r7 == ("(total_asset_value=500000.0 >= 100000"
                      " AND user_level=VIP3 in [VIP2,VIP3]"
                      " AND (trade_count_30d=30 >= 10"
                      " OR login_count_30d=25 >= 20))")
        # rule 2: in + = leaves
        r2 = row["tag_details"]["2"].asDict()["reason"]
        assert r2 == ("(user_level=VIP3 in [VIP2,VIP3]"
                      " AND kyc_status=verified = verified)")

    def test_assignment_detail_json_carries_parity_fields(
            self, spark, users_df, golden_rules):
        eng = TagEngine(golden_rules, as_of=AS_OF, run_ts="2024-07-13T00:00:00")
        for r in eng.assignments(users_df).collect():
            d = json.loads(r["tag_detail"])
            assert {"tag_name", "tag_category", "rule_id", "rule_version",
                    "value", "reason", "hit_time"} <= set(d)

    def test_rule_version_from_catalog_row(self):
        from bigdata_tag_system_spark.rules.model import Rule

        r = Rule.from_row({"tag_id": 9, "rule_conditions": {},
                           "rule_version": "2.3"})
        assert r.rule_version == "2.3"

    def test_single_pass_plan_still_no_exchange(self, spark, users_df, golden_rules):
        eng = TagEngine(golden_rules, as_of=AS_OF)
        plan = eng.profiles(users_df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestValidate:
    def test_validate_ok(self, spark, users_df, golden_rules):
        eng = TagEngine(golden_rules, as_of=AS_OF)
        rep = eng.validate(users_df)
        assert rep["ok"] and rep["user_col_present"]
        assert all(r["ok"] and r["missing_fields"] == [] for r in rep["rules"])

    def test_validate_reports_missing_fields(self, spark, users_df, golden_rules):
        eng = TagEngine(golden_rules, as_of=AS_OF)
        rep = eng.validate(users_df.drop("total_asset_value", "kyc_status"))
        assert not rep["ok"] and rep["user_col_present"]
        by_rule = {r["rule_id"]: r for r in rep["rules"]}
        assert by_rule[1]["missing_fields"] == ["total_asset_value"]
        assert by_rule[2]["missing_fields"] == ["kyc_status"]
        # nested-group field resolution: rule 7 needs the dropped asset col
        assert "total_asset_value" in by_rule[7]["missing_fields"]
        assert by_rule[3]["ok"]  # untouched rule stays ok

    def test_validate_missing_user_col(self, spark, users_df, golden_rules):
        eng = TagEngine(golden_rules, as_of=AS_OF)
        rep = eng.validate(users_df.drop("user_id"))
        assert not rep["ok"] and not rep["user_col_present"]
        assert all(r["ok"] for r in rep["rules"])  # fields all present

    def test_validate_runs_no_job(self, spark, users_df, golden_rules):
        # schema-only: must not trigger a Spark action
        tracker = spark.sparkContext.statusTracker()
        before = tracker.getJobIdsForGroup(None)
        TagEngine(golden_rules, as_of=AS_OF).validate(users_df)
        assert tracker.getJobIdsForGroup(None) == before

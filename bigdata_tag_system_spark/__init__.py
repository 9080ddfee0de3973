"""bigdata_tag_system_spark — a PySpark-native rule-driven tagging/analytics engine.

A from-scratch, Spark-first rebuild of the capabilities of the reference
system ``ellicoo/bigdata_tag_system`` (studied read-only; see SURVEY.md):

- JSON boolean rule trees (18+ comparison/string/date/set/array operators,
  AND/OR/NOT combinators, recursive nested groups) compiled to Catalyst
  ``Column`` expressions — injection-safe, strictly validated, with a
  pluggable as-of date for determinism (vs. reference
  ``src/engine/rule_parser.py:35-168`` which concatenates SQL strings).
- One-pass multi-tag evaluation over columnar fact tables (vs. the
  reference's per-rule filter jobs, ``src/engine/tag_computer.py:99-151``).
- Native array/map/JSON expressions end-to-end — zero Python row UDFs on
  the hot path (vs. the reference's 3 Python UDFs, SURVEY §2.10).
- Six computation scenarios (user-selector × tag-selector × merge-strategy,
  vs. ``src/scheduler/scenario_scheduler.py:118-470``).
- Parquet/JDBC sources and sinks including an idempotent per-partition
  batched upsert (vs. ``src/writers/mysql_writer.py:191-290``).
- Large-scale training-data pipeline operators: exact/MinHash-LSH/SimHash/
  n-gram-Jaccard/embedding-cosine dedup, ANN similarity search, text
  analysis, multimodal column plumbing.
- Structured Streaming rule evaluation (design headroom in the reference,
  SURVEY §2.9).
"""

__version__ = "0.1.0"

from bigdata_tag_system_spark.session import get_spark  # noqa: F401

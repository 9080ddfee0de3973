from bigdata_tag_system_spark.sources.catalog import TableCatalog
from bigdata_tag_system_spark.sources.readers import (
    read_csv_corpus,
    read_fact_table,
    read_jsonl_corpus,
    read_rule_catalog,
)
from bigdata_tag_system_spark.sources.versioned import (
    history,
    read_version,
    vacuum,
    version_diff,
    write_version,
)
from bigdata_tag_system_spark.sources.writers import (
    apply_changeset,
    jdbc_upsert,
    write_parquet,
)

__all__ = [
    "TableCatalog",
    "read_fact_table",
    "read_rule_catalog",
    "read_jsonl_corpus",
    "read_csv_corpus",
    "write_parquet",
    "jdbc_upsert",
    "apply_changeset",
    "write_version",
    "read_version",
    "version_diff",
    "history",
    "vacuum",
]

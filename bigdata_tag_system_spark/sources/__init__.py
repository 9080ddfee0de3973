from bigdata_tag_system_spark.sources.catalog import TableCatalog
from bigdata_tag_system_spark.sources.readers import read_fact_table, read_rule_catalog
from bigdata_tag_system_spark.sources.writers import write_parquet, jdbc_upsert

__all__ = [
    "TableCatalog",
    "read_fact_table",
    "read_rule_catalog",
    "write_parquet",
    "jdbc_upsert",
]

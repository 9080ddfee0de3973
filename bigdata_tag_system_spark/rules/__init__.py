from bigdata_tag_system_spark.rules.model import Rule, load_rules, required_fields
from bigdata_tag_system_spark.rules.compiler import RuleCompiler, compile_rule

__all__ = ["Rule", "load_rules", "required_fields", "RuleCompiler", "compile_rule"]

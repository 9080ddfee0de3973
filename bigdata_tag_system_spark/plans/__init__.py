from bigdata_tag_system_spark.plans.scenarios import Scenario, ScenarioRunner, UserSelector

__all__ = ["Scenario", "ScenarioRunner", "UserSelector"]

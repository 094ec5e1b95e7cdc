from opc2mongodb_spark.plans.checks import explain_str, plan_contains

__all__ = ["explain_str", "plan_contains"]

from opc2mongodb_spark.plans.checks import explain_str, plan_contains
from opc2mongodb_spark.plans.spread import spread

__all__ = ["explain_str", "plan_contains", "spread"]

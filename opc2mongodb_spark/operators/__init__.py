from opc2mongodb_spark.operators.last_value import last_value_per_key

__all__ = ["last_value_per_key"]

from opc2mongodb_spark.functions.coercion import (
    TYPE_FAMILY,
    coerce_value,
    family_of,
)

__all__ = ["TYPE_FAMILY", "coerce_value", "family_of"]

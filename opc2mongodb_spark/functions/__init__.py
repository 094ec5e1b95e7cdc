from opc2mongodb_spark.functions.coercion import (
    TYPE_FAMILY,
    coerce_value,
    family_of,
)
from opc2mongodb_spark.functions.sampling import hash_uniform, weighted_sample_key

__all__ = [
    "TYPE_FAMILY",
    "coerce_value",
    "family_of",
    "hash_uniform",
    "weighted_sample_key",
]

from tachyon_spark.promql.parser import parse
from tachyon_spark.promql import ast

__all__ = ["parse", "ast"]

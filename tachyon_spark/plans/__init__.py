from tachyon_spark.plans.builder import Plan, PlanBuilder

__all__ = ["Plan", "PlanBuilder"]

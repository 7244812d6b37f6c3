"""stackstac_spark.plans — physical-plan auditing utilities."""

from stackstac_spark.plans import audit  # noqa: F401

"""stackstac_spark.plans"""

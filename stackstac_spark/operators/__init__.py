"""stackstac_spark.operators"""

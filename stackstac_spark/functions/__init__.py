"""stackstac_spark.functions"""

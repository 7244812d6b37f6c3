"""stackstac_spark.streaming"""

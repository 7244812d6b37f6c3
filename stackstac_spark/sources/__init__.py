"""stackstac_spark.sources"""

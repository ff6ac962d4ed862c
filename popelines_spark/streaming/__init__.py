"""popelines_spark.streaming"""

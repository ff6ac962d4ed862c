"""popelines_spark.sources"""

"""popelines_spark.functions"""

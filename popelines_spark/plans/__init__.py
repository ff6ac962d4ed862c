"""popelines_spark.plans"""

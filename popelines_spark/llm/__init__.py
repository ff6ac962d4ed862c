"""popelines_spark.llm"""

"""Source connectors beyond the file formats in ``popelines_spark.io``.

``rest`` — driver-side REST pull + executor-side URL fan-out
(popelines/main.py:193-206).
"""

"""Expression helpers shared by operators: text tokenization/shingling,
hash utilities, vector math. All JVM-side pyspark.sql.functions
compositions -- no Python UDFs in any hot path.
"""

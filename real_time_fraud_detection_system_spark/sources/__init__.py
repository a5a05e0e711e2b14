"""Sources & sinks: synthetic generators (transaction stream, training
data), Kafka connector builders, and the partitioned-parquet prediction
store writer.
"""

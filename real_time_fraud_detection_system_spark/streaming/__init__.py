"""Structured Streaming pipelines: the reference's Kafka-consumer hot path
(EP1) as readStream -> parse -> score -> checkpointed sink, plus windowed
aggregations and the scheduled jobs (daily metrics upsert, DQ checks).
"""

"""Reference-parity pipelines: the two DAGs of the reference repo
(training + daily classification) rebuilt on the workflow layer with
Spark-native operator bodies and partitioned-parquet targets.
"""

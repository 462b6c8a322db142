from spark_graft.compat.mapreduce import MapReduce, mapreduce

__all__ = ["MapReduce", "mapreduce"]

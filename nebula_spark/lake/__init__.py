from nebula_spark.lake.table import LakeTable
from nebula_spark.lake.merge import merge_into, append_into, MergeResult

__all__ = ["LakeTable", "merge_into", "append_into", "MergeResult"]

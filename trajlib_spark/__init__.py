"""trajlib_spark — a from-scratch PySpark-native spatial-join + tiling
engine with the query/data-processing capabilities of neumyor/TrajLib,
re-expressed as DataFrame/Catalyst plans over web-scale page tables.
"""

__version__ = "0.1.0"

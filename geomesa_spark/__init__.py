"""geomesa_spark — a PySpark-native spatial-join + tiling engine.

From-scratch re-creation of the reference's (ccri/geomesa) query and data
processing capabilities in idiomatic Spark; see SURVEY.md for the blueprint
and README.md for the module map.
"""

__version__ = "0.1.0"

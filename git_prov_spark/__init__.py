"""spark-prov: PySpark-native Git-to-PROV knowledge-graph construction.

A brand-new engine with the query/data-processing capabilities of
stefan-matcovici/git-prov (reference at /root/reference), re-expressed as an
idiomatic Spark dataflow. See /root/repo/DESIGN.md for the normative spec and
/root/repo/SURVEY.md for the operator inventory.
"""

__version__ = "0.1.0"

"""PySpark-native analytics engine with the capabilities of the reference
BM25 search engine (Zaurall/big_data_assignment_2) plus a large-scale
training-data-pipeline extension surface.

Everything is expressed with the DataFrame API so Catalyst/Tungsten pick the
physical plan: predicate pushdown, column pruning, broadcast joins, AQE.
See SURVEY.md for the operator inventory this package covers.
"""

__version__ = "0.1.0"

"""approximate_pagerank_public_spark — a PySpark-native link-graph engine.

A brand-new engine (not a port) with the capabilities of
``AlbertoParravicini/approximate-pagerank-public``: PageRank with
damping/teleport and early-termination approximation, personalized and
8-source multi-PPR, plus connected components, label propagation and
triangle counting, over an edge table derived from conversation
transcript tables.

Reference semantics are documented per module with ``file:line``
citations into ``/root/reference``. The execution strategy is
Spark-first: DataFrame/Catalyst for ETL and relational work, and a
vectorized Arrow kernel (``mapInArrow`` over per-partition CSR blocks,
no per-row Python) for the iterative sparse gather-scatter inner loop.
"""

from approximate_pagerank_public_spark.session import get_spark
from approximate_pagerank_public_spark.plans.graph import Graph
from approximate_pagerank_public_spark.operators.pagerank import (
    pagerank,
    personalized_pagerank,
    multi_ppr,
)
from approximate_pagerank_public_spark.operators.components import connected_components
from approximate_pagerank_public_spark.operators.labelprop import label_propagation
from approximate_pagerank_public_spark.operators.triangles import triangle_count

__all__ = [
    "get_spark",
    "Graph",
    "pagerank",
    "personalized_pagerank",
    "multi_ppr",
    "connected_components",
    "label_propagation",
    "triangle_count",
]

__version__ = "0.1.0"

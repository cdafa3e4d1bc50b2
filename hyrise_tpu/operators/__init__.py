from hyrise_tpu.operators.base import AbstractOperator, OperatorPerformanceData
from hyrise_tpu.operators.table_wrapper import TableWrapper
from hyrise_tpu.operators.get_table import GetTable
from hyrise_tpu.operators.table_scan import TableScan
from hyrise_tpu.operators.projection import Projection
from hyrise_tpu.operators.aggregate import Aggregate
from hyrise_tpu.operators.sort import Sort
from hyrise_tpu.operators.joins import Join, Product
from hyrise_tpu.operators.limit import Limit
from hyrise_tpu.operators.set_ops import UnionAll, UnionUnique, Difference, Intersect
from hyrise_tpu.operators.alias import AliasOperator

__all__ = [
    "AbstractOperator",
    "OperatorPerformanceData",
    "TableWrapper",
    "GetTable",
    "TableScan",
    "Projection",
    "Aggregate",
    "Sort",
    "Join",
    "Product",
    "Limit",
    "UnionAll",
    "UnionUnique",
    "Difference",
    "Intersect",
    "AliasOperator",
]

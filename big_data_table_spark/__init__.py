"""big_data_table_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of the reference ``big.data.table`` R
package (see SURVEY.md), re-expressed Spark-first: DataFrame/SQL plans
optimized by Catalyst, plus training-data-pipeline extensions (dedup,
similarity search, text analysis, streaming)."""

from .core import BigDataTable, is_big_data_table, NODE_COL
from .session import connect, close

__all__ = ["BigDataTable", "is_big_data_table", "NODE_COL", "connect", "close"]

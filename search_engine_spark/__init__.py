"""search_engine_spark — a PySpark-native inverted-index + BM25 engine.

A from-scratch rebuild (NOT a port) of the query & data-processing
semantics of KonstantinLi/search_engine (Java/Spring/Lucene-morphology,
reference at /root/reference) re-expressed Spark-first:

- input: a Common-Crawl-style pages table
  ``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``
- build: tokenize/lemmatize (Arrow-vectorized pandas UDFs) -> explode ->
  salted repartition-by-term -> delta+varint block-compressed posting
  lists with block-max metadata -> partitioned parquet/Iceberg index
- query: broadcast query-term stats -> rarest-term candidate generation
  (reference semantics, ``SearchServiceImpl.java:164-174``) -> one
  vectorized join for all term TFs -> BM25 column expressions ->
  distributed top-k (TakeOrderedAndProject)

Everything relational is DataFrame built-ins so Catalyst/AQE handle
pushdown, pruning, broadcast selection, and skew; custom code is
confined to the text UDFs, the posting-block codec/WAND scorer, and
salting/manifest logic.
"""

from search_engine_spark.config import EngineConfig

__all__ = ["EngineConfig"]
__version__ = "0.1.0"

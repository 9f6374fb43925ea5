"""spider_spark — a PySpark-native distributed crawl/analytics engine.

From-scratch re-expression of the capabilities of the reference repo
``zou-mono/spider`` (see SURVEY.md) on Spark's DataFrame/SQL engine:

- ``spider_spark.urlnorm``    — URL canonicalization + Murmur3 (Spark-parity)
- ``spider_spark.extract``    — HTML→text / HTML→links (byte-deterministic)
- ``spider_spark.fixtures``   — deterministic synthetic web-graph generator
- ``spider_spark.oracle``     — pure-Python reference-semantics crawler
- ``spider_spark.engine``     — frontier / seen-filter / politeness / crawl round
- ``spider_spark.operators``  — relational + training-data-pipeline operators
"""

__version__ = "0.1.0"

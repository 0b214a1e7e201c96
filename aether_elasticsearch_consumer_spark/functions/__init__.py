"""Scalar / analysis functions (the Lucene-analyzer equivalents).

The reference delegates all analysis to Elasticsearch (mapping split between
``keyword`` and analyzed ``string`` — /root/reference/consumer/app/config.py:43);
here it is implemented explicitly and shared verbatim between index build,
query parsing, and the single-node oracle so results are rank-identical.
"""

"""Scale extension operators (SURVEY.md §7 phase 3): deduplication,
similarity search, text analysis, multimodal plumbing.

These go beyond the reference's surface — they are the operators a
large-scale training-data pipeline needs, built Spark-first:
hash/sort aggregations and higher-order functions in the JVM, Arrow
Pandas UDFs only where vectorized Python is genuinely required.

All hashing is md5-based (not Spark's xxhash / DuckDB's hash), so every
signature is engine-independent and the DuckDB oracles can reproduce it
bit-for-bit.
"""

"""Shared DuckDB oracle SQL fragments — a LEAF module with no
package-internal imports, so any registry module can pull these at
import time without creating a cycle (registry_ext → registry →
registry_train → registry_ext previously deadlocked when a test
imported registry_ext directly: the partially-initialized module had
not yet defined ``_SHINGLES``).

The canonical definitions live here; ``registry_ext`` /
``registry_graph`` re-export them under their historical names.
"""

# DuckDB fragment: normalized text (matches dedup.normalized_text)
NORM_SQL = (
    "trim(regexp_replace(lower(coalesce(text, '')), '[^a-z0-9]+', ' ', 'g'))"
)

# DuckDB fragment: word array of normalized text
WORDS_SQL = f"string_split({NORM_SQL}, ' ')"

# DuckDB fragment: distinct word 3-shingles (matches dedup._shingles_expr)
SHINGLES_SQL = f"""
  list_distinct(CASE WHEN len({WORDS_SQL}) < 3
    THEN [array_to_string({WORDS_SQL}, ' ')]
    ELSE list_transform(range(1, len({WORDS_SQL}) - 1),
                        i -> array_to_string(({WORDS_SQL})[i:i+2], ' '))
  END)
"""

#: minimum distinct co-occurring orders for a co-purchase edge
#: (shared by the graph family q112-q116 and q135)
COPURCHASE_MIN_SUPPORT = 2

#: the co-purchase edge list, DuckDB side (canonical a < b, distinct
#: by construction of the GROUP BY)
COPURCHASE_SQL = f"""
  SELECT least(x.l_partkey, y.l_partkey) AS a,
         greatest(x.l_partkey, y.l_partkey) AS b
  FROM lineitem x
  JOIN lineitem y
    ON x.l_orderkey = y.l_orderkey AND x.l_partkey <> y.l_partkey
  GROUP BY 1, 2
  HAVING count(DISTINCT x.l_orderkey) >= {COPURCHASE_MIN_SUPPORT}
"""


#: deterministic line-augmented documents (repeated-line lanes for the
#: q64/q76 cleaning family) — shared by registry_cleaning and
#: registry_ts
LINE_AUG_SQL = """
  SELECT doc_id,
    CASE WHEN doc_id % 2 = 0
      THEN text || chr(10) || 'repeat line alpha beta' || chr(10) ||
           'repeat line alpha beta' || chr(10) || 'hi' || chr(10) ||
           'uniq line ' || CAST(doc_id AS VARCHAR)
      ELSE text END AS t
  FROM documents
"""
